#!/usr/bin/env bash
# Synthetic-corpus eval sweep (convergence-evidence protocol).
#
# Mirrors scripts/test_48k.sh (the reference slurm_test_48kHz.sh protocol)
# but runs on the deterministic held-out synthetic corpus, since this image
# has no VCTK. Produces one results_48kHz.csv row per input SR, and logs
# lsd_input (the degraded-input floor the model must beat) per sweep point.
#
# Usage: eval_synth_48k.sh [RUN_DIR] [N_ITEMS]
set -euo pipefail
cd "$(dirname "$0")/.."
RUN_DIR=${1:-artifacts/conv48/DualStreamInteractiveMambaUNet/conv48}
N=${2:-64}
for SR in 8000 12000 16000 24000; do
  python -m vm_asr_tpu.cli --cfg configs/vm_asr_48k_MPD.yaml --eval \
      --tag "${SR}_48000" --resume "$RUN_DIR" \
      --synthetic_data --synthetic_n "$N" \
      --opts TENSORBOARD.ENABLE False OUTPUT artifacts/conv48_eval
done
