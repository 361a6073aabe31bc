"""Multi-epoch training-trajectory overlay: reference torch Trainer vs this
framework (VERDICT r04 item 2).

Runs the REFERENCE's own ``trainer.Trainer`` (trainer/trainer.py:98-222) on
CPU for N epochs — the actual class, via compat.ref_loader's pure-torch scan
swaps — and this framework's Trainer for the same N epochs, from IDENTICAL
initial weights (torch init ported through compat.torch_port) on IDENTICAL
pre-materialised batches in identical order, with matched optimizer settings
(AdamW, constant LR, the reference's no-decay mask) and the production loss
assembly (L1 + multi-resolution STFT, plus MPD adversarial + feature matching
in --gan mode). After each epoch both generators are evaluated on the same
held-out batch and the LSD trajectories are written side by side.

This is the strongest training-dynamics parity evidence obtainable in a
zero-egress image: per-step gradient parity was already proven in float64
(PARITY.md); this upgrades it to multi-epoch trajectory equivalence.

Determinism: drop_path/dropout rates are 0 at this geometry, batches are
replayed from disk, so both trajectories are deterministic — any divergence
is fp32 numerics accumulation plus (in --gan mode) the documented spectral-
norm parametrisation difference (torch optimises the raw W under the
parametrization, flax optimises the effective kernel; PARITY.md).

Harness patches applied to run the reference on CPU-only torch (logging
only, zero effect on dynamics): torch.cuda.reset_peak_memory_stats → no-op
(absent in CPU builds), model.flops → stub string (init-time log line),
schedulers None (timm is not installed; both sides run constant LR).

Usage:
  python scripts/trajectory_overlay.py --epochs 12 --steps 8 --batch 4 \
      --out artifacts/trajectory_r5          # no-GAN variant
  python scripts/trajectory_overlay.py --gan ...
"""

from __future__ import annotations

import argparse
import csv
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SR = 16000
N_FFT, HOP, WIN = 64, 16, 64
SAMPLES = 16 * 255  # 4080 ≥ the STFT loss's largest n_fft (2048, loss.py:142)
DEPTHS, DIMS = (1, 1, 1, 1), 8
FREQS = N_FFT // 2  # post-DC-drop bins


def make_data(n_batches: int, batch: int, seed: int = 0):
    """Deterministic degraded/target batch pairs, shared verbatim by both
    trainers. Target: band-rich noise-plus-tones; input: the target with the
    top half of the band zeroed in the STFT domain (the upsampling task),
    highcut at FREQS//2 like the parity harness."""
    import numpy as np

    rng = np.random.default_rng(seed)
    t = np.arange(SAMPLES) / SR
    batches = []
    for _ in range(n_batches):
        tgt = np.zeros((batch, 1, SAMPLES), np.float32)
        for b in range(batch):
            wave = 0.05 * rng.standard_normal(SAMPLES)
            for _ in range(6):
                f = rng.uniform(50.0, SR / 2 * 0.95)
                wave = wave + rng.uniform(0.1, 0.4) * np.sin(
                    2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
                )
            tgt[b, 0] = wave.astype(np.float32)
        # Lowpass via FFT zeroing at the highcut bin edge (clean, exact).
        spec = np.fft.rfft(tgt, axis=-1)
        edge = int(spec.shape[-1] * 0.5)
        lp = spec.copy()
        lp[..., edge:] = 0.0
        inp = np.fft.irfft(lp, n=SAMPLES, axis=-1).astype(np.float32)
        # Doctor the MODEL INPUT exactly like compat.parity_check: the phase
        # stream's angle() flips by 2π between torch's and XLA's FFTs wherever
        # a bin is ~exactly real (boundary reflect-pad frames; the Nyquist
        # bin). At fp32 those flips inject a ~0.8% step-0 loss difference at
        # IDENTICAL weights, which chaos then amplifies across epochs —
        # convention noise, not dynamics. An alternating (Nyquist-positive)
        # bias plus zeroed boundary samples pins the convention on both
        # sides; both trainers see the identical doctored input.
        alt = np.power(-1.0, np.arange(SAMPLES)).astype(np.float32)
        inp = inp + (np.abs(inp).max(axis=-1, keepdims=True) + 1.0) * alt
        inp[..., :N_FFT] = 0.0
        inp[..., -N_FFT:] = 0.0
        hc = np.full((batch,), FREQS // 2, np.int64)
        batches.append((inp.astype(np.float32), tgt, hc))
    return batches


class TorchReplayLoader:
    """Reference-format loader: yields (wave_input, wave_target, highcut,
    filename, trim) like data_loader/data_loaders.py's collate."""

    def __init__(self, batches):
        import torch

        self._batches = [
            (torch.from_numpy(i), torch.from_numpy(tg), torch.from_numpy(hc))
            for i, tg, hc in batches
        ]
        self.batch_size = batches[0][0].shape[0]
        self.dataset = list(range(len(batches) * self.batch_size))

    def __len__(self):
        return len(self._batches)

    def __iter__(self):
        for i, tg, hc in self._batches:
            yield i, tg, hc, "synth.wav", 0


class JaxReplayLoader:
    """This framework's loader protocol: len, set_epoch, iterate Batch-like
    objects with wave_input/wave_target/highcut arrays."""

    class _B:
        def __init__(self, i, t, h):
            self.wave_input, self.wave_target, self.highcut = i, t, h

    def __init__(self, batches):
        import numpy as np

        self._batches = [
            (i, t, h.astype(np.int32)) for i, t, h in batches
        ]

    def __len__(self):
        return len(self._batches)

    def set_epoch(self, epoch):
        pass  # fixed replay order — identical on both sides by construction

    def __iter__(self):
        for i, t, h in self._batches:
            yield self._B(i, t, h)


def lsd_np(out, tgt):
    """Full-band LSD (metric.py lsd semantics: log10 power spectrogram,
    n_fft=2048) computed in numpy so torch and jax outputs are scored by the
    literally identical function."""
    import numpy as np

    def spec(x):
        n_fft, hop = 512, 128  # scaled to the tiny clip; same for both sides
        frames = []
        win = np.hanning(n_fft + 1)[:-1]
        pad = np.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
        for s in range(0, pad.shape[-1] - n_fft + 1, hop):
            frames.append(np.fft.rfft(pad[:, s : s + n_fft] * win, axis=-1))
        mag2 = np.abs(np.stack(frames, axis=-1)) ** 2
        return np.log10(np.maximum(mag2, 1e-10))

    a, b = spec(out.reshape(out.shape[0], -1)), spec(tgt.reshape(tgt.shape[0], -1))
    return float(np.mean(np.sqrt(np.mean((a - b) ** 2, axis=1))))


def run_reference(batches, val, epochs, gan, workdir):
    """N epochs of the reference Trainer (the real class). Returns per-epoch
    dicts of epoch-mean losses + val LSD."""
    import numpy as np
    import torch

    from vm_asr_tpu.compat.parity_check import model_kwarg_pair
    from vm_asr_tpu.compat.ref_loader import (build_reference_model,
                                              load_reference_modules)

    torch.manual_seed(0)
    # CPU builds lack the CUDA memory-stat bindings the trainer calls for
    # its progress bar (trainer.py:130, 478) — logging only.
    torch.cuda.reset_peak_memory_stats = lambda *a, **k: None

    cfg = dict(n_fft=N_FFT, hop_length=HOP, win_length=WIN,
               depths=DEPTHS, dims=DIMS, samples=SAMPLES)
    common_ref, _ = model_kwarg_pair(cfg, 4)
    common_ref["drop_path_rate"] = 0.0  # determinism (both sides)
    ref = build_reference_model(
        "DualStreamInteractiveMambaUNet", interact="dual", **common_ref
    )
    ref.train()

    load_reference_modules()
    sys.path.insert(0, os.environ.get("VM_ASR_REFERENCE", "/root/reference"))
    from trainer import Trainer as RefTrainer
    from utils.optimizer import get_optimizer

    # This image's pandas enforces copy-on-write; the reference's
    # MetricTracker.reset writes through .values (utils/utils.py:52), which
    # is now read-only. Same semantics, CoW-safe:
    from utils.utils import MetricTracker as RefMetricTracker

    def _reset(self):
        for col in self._data.columns:
            self._data[col] = 0.0

    RefMetricTracker.reset = _reset

    # The reference's own config.py needs yacs (not in this image); this
    # framework's core.config is a from-scratch schema-compatible equivalent
    # (VERDICT r04 §2.1) — the reference Trainer reads it identically.
    from vm_asr_tpu.core import default_config

    rcfg = default_config()
    rcfg.DATA.TARGET_SR = SR
    rcfg.DATA.SEGMENT = SAMPLES / SR
    rcfg.DATA.VALID_SPLIT = 0.0
    rcfg.TRAIN.EPOCHS = epochs
    rcfg.TRAIN.ACCUMULATION_STEPS = 1
    rcfg.TRAIN.BASE_LR = 1e-3
    rcfg.TRAIN.WEIGHT_DECAY = 0.01
    rcfg.TRAIN.LOSSES.GEN = ["l1", "multi_resolution_stft"]
    rcfg.TRAIN.ADVERSARIAL.ENABLE = gan
    rcfg.TRAIN.ADVERSARIAL.DISCRIMINATORS = ["mpd"] if gan else []
    rcfg.TRAIN.ADVERSARIAL.GAN_LOSS_TYPE = "lsgan"
    rcfg.MONITOR = "off"
    rcfg.MODEL.RESUME_PATH = None
    rcfg.OUTPUT = os.path.join(workdir, "ref")
    rcfg.TENSORBOARD.ENABLE = False
    rcfg.TENSORBOARD.LOG_ITEMS = []
    rcfg.freeze()
    os.makedirs(rcfg.OUTPUT, exist_ok=True)

    models = {"generator": ref}
    if gan:
        import model.discriminator as ref_disc

        mpd = ref_disc.MultiPeriodDiscriminator(hidden=8, periods=[2, 3, 5])
        mpd.train()
        models["mpd"] = mpd
    for m in models.values():  # init-time log line only (trainer.py:63-67)
        m.flops = lambda *a, **k: "flops n/a (CPU trajectory harness)"

    # Snapshot the INITIAL weights before any training step mutates them —
    # run_ours must start from these, not from the post-training state.
    import copy

    init_sds = {name: copy.deepcopy(m.state_dict())
                for name, m in models.items()}

    logger = logging.getLogger("ref_traj")
    logger.setLevel(logging.WARNING)  # silence per-batch bars in the log

    optimizers = {
        "generator": get_optimizer(rcfg, ref, logger),
        "discriminator": get_optimizer(rcfg, [models["mpd"]], logger) if gan else None,
    }
    trainer = RefTrainer(
        models=models, metric_ftns=[], optimizers=optimizers, config=rcfg,
        device=(torch.device("cpu"), []),
        data_loader_train=TorchReplayLoader(batches),
        data_loader_val=None,
        lr_schedulers={"generator": None, "discriminator": None},
        amp=False, gan=gan, logger=logger,
    )
    # amp=False leaves scaler_G None but _optimize always calls it
    # (trainer.py:428-438 assumes amp; GradScaler self-disables on CPU) —
    # run with the trainer's own amp=True path instead:
    trainer.amp = True

    vi, vt, vhc = val
    curves = []
    for epoch in range(1, epochs + 1):
        trainer._train_epoch(epoch)
        log = dict(trainer.epoch_log)
        ref.eval()
        with torch.no_grad():
            out = ref(torch.from_numpy(vi), torch.from_numpy(vhc))
        ref.train()
        row = {
            "total_loss": float(log["total_loss"]),
            "val_lsd": lsd_np(out.numpy(), vt),
        }
        if gan:
            row["disc_loss"] = float(log.get("total_disc_loss", np.nan))
            row["adv"] = float(log.get("generator/adversarial_mpd", np.nan))
        curves.append(row)
        print(f"[ref ] epoch {epoch:3d} " +
              " ".join(f"{k}={v:.5f}" for k, v in row.items()), flush=True)
    # Rewind the torch modules to their pre-training snapshot so run_ours
    # ports the true initial weights (the trainer mutated them in place).
    for name, m in models.items():
        m.load_state_dict(init_sds[name])
    return curves, ref, models.get("mpd")


def run_ours(batches, val, epochs, gan, ref, ref_mpd, workdir):
    """N epochs of this framework's Trainer from the SAME initial weights."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vm_asr_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np

    from vm_asr_tpu.compat.parity_check import model_kwarg_pair
    from vm_asr_tpu.compat.torch_port import (disc_variables_from_torch,
                                              state_dict_to_flax)
    from vm_asr_tpu.core import default_config
    from vm_asr_tpu.models.discriminator import MultiPeriodDiscriminator
    from vm_asr_tpu.models.unet import DualStreamInteractiveMambaUNet
    from vm_asr_tpu.train.trainer import Trainer

    cfg = dict(n_fft=N_FFT, hop_length=HOP, win_length=WIN,
               depths=DEPTHS, dims=DIMS, samples=SAMPLES)
    _, common_flax = model_kwarg_pair(cfg, 4)
    common_flax["dtype"] = jnp.float32
    common_flax["drop_path_rate"] = 0.0
    gen = DualStreamInteractiveMambaUNet(interact="dual", **common_flax)

    c = default_config()
    c.MODEL.NAME = "DualStreamInteractiveMambaUNet"
    c.DATA.TARGET_SR = SR
    c.DATA.SEGMENT = SAMPLES / SR
    c.DATA.BATCH_SIZE = batches[0][0].shape[0]
    c.DATA.STFT.N_FFT = N_FFT
    c.DATA.STFT.HOP_LENGTH = HOP
    c.DATA.STFT.WIN_LENGTH = WIN
    c.AMP_ENABLE = False  # fp32 to match torch CPU
    c.TRAIN.EPOCHS = epochs
    c.TRAIN.BASE_LR = 1e-3
    c.TRAIN.WEIGHT_DECAY = 0.01
    c.TRAIN.WARMUP_EPOCHS = 0
    c.TRAIN.LR_SCHEDULER.NAME = "multistep"
    c.TRAIN.LR_SCHEDULER.MULTISTEPS = []  # constant LR (ref side: scheduler None)
    c.TRAIN.LOSSES.GEN = ["l1", "multi_resolution_stft"]
    c.TRAIN.ADVERSARIAL.ENABLE = gan
    c.TRAIN.ADVERSARIAL.DISCRIMINATORS = ["mpd"] if gan else [""]
    c.TRAIN.ADVERSARIAL.GAN_LOSS_TYPE = "lsgan"
    c.TRAIN.ADVERSARIAL.DISC_INPUT_GAIN = 1.0  # reference-faithful
    c.MONITOR = "off"
    c.OUTPUT = os.path.join(workdir, "ours")
    c.TENSORBOARD.ENABLE = False
    os.makedirs(c.OUTPUT, exist_ok=True)

    models = {"generator": gen}
    if gan:
        models["mpd"] = MultiPeriodDiscriminator(hidden=8, periods=(2, 3, 5))

    loader = JaxReplayLoader(batches)
    trainer = Trainer(c, models, loader, None, mesh=None)

    # Identical start: port the torch init into the flax trees.
    ported = state_dict_to_flax(ref.state_dict(), dtype=jnp.float32)
    trainer.gen_state = trainer.gen_state.replace(params=ported)
    if gan:
        tmpl = {"params": trainer.disc_states["mpd"].params,
                "batch_stats": trainer.disc_states["mpd"].batch_stats}
        dv = disc_variables_from_torch(ref_mpd, tmpl)
        trainer.disc_states["mpd"] = trainer.disc_states["mpd"].replace(
            params=dv["params"], batch_stats=dv["batch_stats"])

    import jax as _jax

    vi, vt, vhc = val
    vhc32 = vhc.astype(np.int32)
    curves = []
    for epoch in range(1, epochs + 1):
        log = trainer._train_epoch(epoch)
        out, _ = trainer.eval_step(
            trainer.gen_state.params,
            {"wave_input": vi, "wave_target": vt, "highcut": vhc32},
        )
        row = {
            "total_loss": float(log["total_loss"]),
            "val_lsd": lsd_np(np.asarray(_jax.device_get(out)), vt),
        }
        if gan:
            row["disc_loss"] = float(log.get("total_disc_loss", np.nan))
            row["adv"] = float(log.get("generator/adversarial_mpd", np.nan))
        curves.append(row)
        print(f"[ours] epoch {epoch:3d} " +
              " ".join(f"{k}={v:.5f}" for k, v in row.items()), flush=True)
    return curves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--steps", type=int, default=8, help="batches per epoch")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--gan", action="store_true")
    ap.add_argument("--out", default="artifacts/trajectory_r5")
    args = ap.parse_args()

    from vm_asr_tpu.compat.stubs import install_stubs

    install_stubs()

    batches = make_data(args.steps, args.batch, seed=0)
    val = make_data(1, args.batch, seed=999)[0]
    os.makedirs(args.out, exist_ok=True)
    tag = "gan" if args.gan else "nogan"

    ref_curves, ref, ref_mpd = run_reference(
        batches, val, args.epochs, args.gan, args.out)
    our_curves = run_ours(
        batches, val, args.epochs, args.gan, ref, ref_mpd, args.out)

    path = os.path.join(args.out, f"overlay_{tag}.csv")
    keys = list(ref_curves[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["epoch"] + [f"ref_{k}" for k in keys]
                   + [f"ours_{k}" for k in keys])
        for e, (r, o) in enumerate(zip(ref_curves, our_curves), 1):
            w.writerow([e] + [f"{r[k]:.6f}" for k in keys]
                       + [f"{o[k]:.6f}" for k in keys])

    # Band summary: worst relative gap per tracked quantity.
    print(f"\noverlay written: {path}")
    for k in keys:
        gaps = [abs(r[k] - o[k]) / max(abs(r[k]), 1e-9)
                for r, o in zip(ref_curves, our_curves)]
        print(f"  {k}: worst rel gap {max(gaps):.4f} "
              f"(final ref={ref_curves[-1][k]:.5f} ours={our_curves[-1][k]:.5f})")


if __name__ == "__main__":
    main()
