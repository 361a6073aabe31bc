"""Diagnose the MPD's adversarial health (VERDICT r03 weak #1).

The round-3 conv48 run showed `discriminator/mpd_train` pinned at exactly
2.50 (= 5 sub-Ds × the blind LSGAN equilibrium 0.25+0.25) for 118 epochs:
the discriminator never discriminated. This script isolates the D from the
GAN loop and asks the *controlled* question: can the production MPD
(hidden width, spectral norm, optimizer, LR schedule) learn to separate
full-band audio from its low-passed degradation — the easiest version of
the real/fake task it faces at GAN epoch 0?

Variants bisect the suspects from the verdict: spectral norm off, wider
hidden, lower LR. Output: per-step D loss + mean per-sub-D score gap
D(real) − D(fake). A healthy D drives loss ≪ 2.5 and gap ≫ 0 within a few
hundred steps; a structurally-broken one stays at 2.5 / 0.

Run (CPU is fine): JAX_PLATFORMS=cpu python scripts/diagnose_gan.py
Reference counterpart: trainer/trainer.py:369-399, model/discriminator.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_batches(n_items: int, seg: int, sr: int, batch: int, seed: int = 0):
    """Real = synthetic full-band clips; fake = their 8 kHz-input degradation
    (the DegradingSampler's LPF path — what the generator's residual output
    resembles at step 0)."""
    from vm_asr_tpu.data.vctk import SyntheticVCTK
    from vm_asr_tpu.dsp.degrade import degrade

    ds = SyntheticVCTK(n_items=n_items, sr=sr, duration=seg / sr + 0.05,
                       seed=seed)
    reals, fakes = [], []
    for i in range(n_items):
        audio, _, _ = ds.load(i)
        audio = audio[:seg]
        deg, _ = degrade(audio, sr, 8000, ("cheby1", 8), n_fft=1024)
        reals.append(audio.astype(np.float32))
        fakes.append(deg[:seg].astype(np.float32))
    reals = np.stack(reals)[:, None, :]
    fakes = np.stack(fakes)[:, None, :]

    def batches(step):
        idx = np.random.default_rng(1000 + step).integers(0, n_items, batch)
        return reals[idx], fakes[idx]

    return batches


def run_variant(tag: str, *, hidden: int, spectral: bool, lr: float,
                steps: int, seg: int, sr: int, batch: int, gain: float = 1.0,
                log_every: int = 25):
    import jax
    import jax.numpy as jnp
    import optax

    from vm_asr_tpu import losses as L
    from vm_asr_tpu.models.discriminator import MultiPeriodDiscriminator

    # use_spectral_norm=False → spectral norm ON (the reference's inverted
    # flag, model/discriminator.py:37); True → plain convs.
    mpd = MultiPeriodDiscriminator(hidden=hidden, use_spectral_norm=not spectral)

    raw_batches = make_batches(n_items=16, seg=seg, sr=sr, batch=batch)

    def batches(step):
        # Input gain: real/fake differ only in zero-mean HF content, which a
        # LINEAR functional cannot separate in expectation; at audio scale
        # ~0.5 the GELU stack is nearly linear, so the separation signal is
        # second-order small. Gain pushes activations into the nonlinear
        # regime (testing the linearity-trap hypothesis).
        r, f = raw_batches(step)
        return r * gain, f * gain

    r0, f0 = batches(0)
    variables = mpd.init(jax.random.PRNGKey(0), jnp.asarray(r0),
                         jnp.asarray(f0), update_stats=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=0.0)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, real, fake):
        out = mpd.apply(
            {"params": params, "batch_stats": batch_stats}, real, fake,
            update_stats=True, mutable=["batch_stats"],
        )
        (y_r, y_g, _, _), mut = out
        loss = L.discriminator_loss(y_r, y_g, "lsgan")
        gaps = jnp.stack([jnp.mean(dr) - jnp.mean(dg)
                          for dr, dg in zip(y_r, y_g)])
        means_r = jnp.stack([jnp.mean(dr) for dr in y_r])
        return loss, (mut["batch_stats"], gaps, means_r)

    @jax.jit
    def step_fn(params, batch_stats, opt_state, real, fake):
        (loss, (batch_stats, gaps, means_r)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, real, fake)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, loss, gaps, means_r, gnorm

    history = []
    for step in range(steps):
        real, fake = batches(step)
        params, batch_stats, opt_state, loss, gaps, means_r, gnorm = step_fn(
            params, batch_stats, opt_state, jnp.asarray(real), jnp.asarray(fake))
        if step % log_every == 0 or step == steps - 1:
            loss_v = float(loss)
            gap_v = float(jnp.mean(gaps))
            print(f"[{tag}] step {step:4d} D_loss={loss_v:7.4f} "
                  f"gap={gap_v:+.4f} gap_max={float(jnp.max(jnp.abs(gaps))):.4f} "
                  f"D(real)~{float(jnp.mean(means_r)):+.4f} "
                  f"|grad|={float(gnorm):.3e}", flush=True)
            history.append((step, loss_v, gap_v))
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--seg", type=int, default=61320)  # 1.2775 s @ 48 kHz
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--variants", default="prod,nosn,wide,lowlr")
    args = ap.parse_args()

    sr = 48000
    variants = {
        # production settings (flagship config: MPD_HIDDEN=32, lr=1e-3)
        "prod": dict(hidden=32, spectral=True, lr=1e-3),
        "nosn": dict(hidden=32, spectral=False, lr=1e-3),
        "wide": dict(hidden=64, spectral=True, lr=1e-3),
        "lowlr": dict(hidden=32, spectral=True, lr=2e-4),
        "gain8": dict(hidden=32, spectral=True, lr=1e-3, gain=8.0),
        "gain8_nosn": dict(hidden=32, spectral=False, lr=1e-3, gain=8.0),
    }
    results = {}
    for tag in args.variants.split(","):
        cfg = variants[tag]
        print(f"=== variant {tag}: {cfg} ===", flush=True)
        results[tag] = run_variant(tag, steps=args.steps, seg=args.seg,
                                   sr=sr, batch=args.batch, **cfg)
    print("\n=== summary (final D loss / gap; blind equilibrium = 2.50 / 0) ===")
    for tag, hist in results.items():
        s, loss, gap = hist[-1]
        print(f"{tag:8s} step {s}: D_loss={loss:.4f} gap={gap:+.4f}")


if __name__ == "__main__":
    main()
