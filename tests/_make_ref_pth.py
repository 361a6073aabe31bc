"""Subprocess helper for the `.pth` checkpoint drill (tests/test_checkpoint.py).

Builds a tiny reference torch DualStream model (CPU, compat stubs), saves it
in the reference's published checkpoint layout
``{name, epoch, state_dict, optimizer, monitor_best, config}``
(reference base/base_trainer.py:130-179) as ``checkpoint-best-G.pth``, and
ALSO converts the same weights to flax and writes a native orbax
``checkpoint-best-G`` — so the test can run CLI eval from each and assert
output equivalence.

Run as a subprocess: importing the reference installs process-global stubs
(fake triton/timm/...) that must not leak into the test process.

Usage: python tests/_make_ref_pth.py <pth_dir> <orbax_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_pth_dir, out_orbax_dir = sys.argv[1], sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from vm_asr_tpu.compat.parity_check import model_kwarg_pair
    from vm_asr_tpu.compat.ref_loader import build_reference_model
    from vm_asr_tpu.compat.torch_port import state_dict_to_flax
    from vm_asr_tpu.core.checkpoint import CheckpointManager

    # Matches the CLI test config: 16 kHz, SEGMENT 0.315 s → 5040 samples,
    # n_fft 128 / hop 80 (derived) / win 128, DIMS 4, DEPTHS [1,1,1,1].
    cfg = dict(n_fft=128, hop_length=80, win_length=128,
               depths=(1, 1, 1, 1), dims=4, samples=5040)
    common_ref, _ = model_kwarg_pair(cfg)

    torch.manual_seed(0)
    model = build_reference_model("DualStreamInteractiveMambaUNet",
                                  **common_ref)

    os.makedirs(out_pth_dir, exist_ok=True)
    torch.save(
        {
            "name": "DualStreamInteractiveMambaUNet",
            "epoch": 3,
            "state_dict": model.state_dict(),
            "optimizer": {},
            "monitor_best": 0.5,
            "config": {},
        },
        os.path.join(out_pth_dir, "checkpoint-best-G.pth"),
    )

    params = state_dict_to_flax(model.state_dict())
    CheckpointManager(out_orbax_dir).save(
        "G", {"params": params}, epoch=3, monitor_best=0.5, best=True
    )
    print("ok")


if __name__ == "__main__":
    main()
