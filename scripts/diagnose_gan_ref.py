"""Reference-side counterpart of diagnose_gan.py (VERDICT r03 weak #1).

Trains the REFERENCE's torch MultiPeriodDiscriminator (CPU, via the compat
stubs) D-only on the identical real-vs-degraded task, same optimizer
(AdamW 1e-3) and LSGAN loss (reference model/loss.py lsgan branch,
trainer/trainer.py:369-399). If it also pins at D_loss=2.50 / gap=0, the
TPU framework's collapse is faithful parity with the reference
architecture's own dynamics (spectral norm via the inverted default flag,
discriminator.py:37); if it separates, the flax side has a bug.

Run: python scripts/diagnose_gan_ref.py --steps 150
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--seg", type=int, default=61320)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--use-spectral-norm-flag", action="store_true",
                    help="pass use_spectral_norm=True (reference inverted "
                    "flag → weight_norm)")
    args = ap.parse_args()

    from vm_asr_tpu.compat.stubs import install_stubs
    install_stubs()
    sys.path.insert(0, os.environ.get("VM_ASR_REFERENCE", "/root/reference"))

    import numpy as np
    import torch

    from model.discriminator import MultiPeriodDiscriminator

    from scripts.diagnose_gan import make_batches

    torch.manual_seed(0)
    mpd = MultiPeriodDiscriminator(hidden=32)
    opt = torch.optim.AdamW(mpd.parameters(), lr=1e-3, weight_decay=0.0)

    batches = make_batches(n_items=16, seg=args.seg, sr=48000,
                           batch=args.batch)

    for step in range(args.steps):
        real_np, fake_np = batches(step)
        real = torch.from_numpy(real_np)
        fake = torch.from_numpy(fake_np)
        y_r, y_g, _, _ = mpd(real, fake)
        loss = 0.0
        gaps = []
        for dr, dg in zip(y_r, y_g):
            loss = loss + torch.mean((dr - 1.0) ** 2) + torch.mean(dg ** 2)
            gaps.append(float(torch.mean(dr) - torch.mean(dg)))
        opt.zero_grad()
        loss.backward()
        # manual grad norm: clip_grad_norm_ pulls in torch._dynamo, which
        # the compat triton stub breaks
        gnorm = sum(float((p.grad ** 2).sum()) for p in mpd.parameters()
                    if p.grad is not None) ** 0.5
        opt.step()
        if step % args.log_every == 0 or step == args.steps - 1:
            mean_r = float(sum(float(torch.mean(dr)) for dr in y_r) / len(y_r))
            print(f"[torch-ref] step {step:4d} D_loss={float(loss):7.4f} "
                  f"gap={float(np.mean(gaps)):+.4f} "
                  f"gap_max={float(np.max(np.abs(gaps))):.4f} "
                  f"D(real)~{mean_r:+.4f} |grad|={float(gnorm):.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
