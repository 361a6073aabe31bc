#!/usr/bin/env bash
# Evaluate the 16 kHz model over the input-SR sweep (reference slurm_test_16kHz.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
RUN_DIR=${1:?usage: test_16k.sh RUN_DIR}
for SR in 2000 4000 8000 12000; do
  python -m vm_asr_tpu.cli --cfg configs/vm_asr_16k.yaml --eval \
      --tag "${SR}_16000" --resume "$RUN_DIR"
done
