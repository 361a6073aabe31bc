#!/usr/bin/env bash
# Train the flagship 48 kHz versatile model with MPD adversarial training
# (equivalent of the reference's slurm_train_48kHz.sh, minus SLURM — a TPU VM
# runs this directly; multi-chip DP is automatic via the device mesh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m vm_asr_tpu.cli --cfg configs/vm_asr_48k_MPD.yaml --tag 48k_FullData_MPD "$@"
