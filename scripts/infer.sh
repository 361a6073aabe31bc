#!/usr/bin/env bash
# Enhance a wav file or directory (reference slurm_infer_*.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."
RUN_DIR=${1:?usage: infer.sh RUN_DIR INPUT [TAG]}
INPUT=${2:?usage: infer.sh RUN_DIR INPUT [TAG]}
TAG=${3:-16000_48000}
python -m vm_asr_tpu.cli --cfg configs/vm_asr_48k_MPD.yaml --inference \
    --tag "$TAG" --resume "$RUN_DIR" --input "$INPUT"
