#!/usr/bin/env bash
# Train the 16 kHz versatile model (reference slurm_train_16kHz.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m vm_asr_tpu.cli --cfg configs/vm_asr_16k.yaml --tag 16k_FullData_MPD "$@"
