#!/usr/bin/env bash
# Evaluate the 48 kHz model over the input-SR sweep (reference slurm_test_48kHz.sh):
# 8/12/16/24 kHz inputs → 48 kHz output, one CSV row each.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN_DIR=${1:?usage: test_48k.sh RUN_DIR}
for SR in 8000 12000 16000 24000; do
  python -m vm_asr_tpu.cli --cfg configs/vm_asr_48k_MPD.yaml --eval \
      --tag "${SR}_48000" --resume "$RUN_DIR"
done
