"""Forward-equivalence parity check vs the reference PyTorch model.

Builds the *reference* model (random init) on CPU, ports its weights into
this framework's flax model via ``torch_port``, runs both on the same
waveform, and reports the output error. Run in float64 so the only noise
left is the fp32 scan interior both implementations share (the reference
forces fp32 into the scan — vmamba.py:842-848 — and so do our kernels),
which cleanly separates wiring bugs (errors ~O(1)) from float noise
(errors ~1e-7).

Usage (needs the reference tree, default /root/reference):

    JAX_PLATFORMS=cpu python -m vm_asr_tpu.compat.parity_check \
        --model dual --size tiny

Prints one JSON line: {"model": ..., "size": ..., "max_abs": ...,
"rel": ..., "ref_scale": ..., "n_params": ...}.

The pytest wrapper (tests/test_parity.py) runs this in a subprocess so
the x64 global flag can't leak into other tests.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict

SIZES = {
    # n_fft, hop, win, depths, dims, seconds→samples (frames = T/hop + 1)
    "tiny": dict(n_fft=64, hop_length=16, win_length=64,
                 depths=(1, 1, 1, 1), dims=8, samples=16 * 63),
    # production 48 kHz geometry (H=512 freq bins) at 128 frames
    "prod": dict(n_fft=1024, hop_length=240, win_length=1024,
                 depths=(2, 2, 2, 2), dims=16, samples=240 * 127),
    # 64×64 image — stays even through the latent variant's 5 downsamples
    "tiny5": dict(n_fft=128, hop_length=16, win_length=128,
                  depths=(1, 1, 1, 1), dims=8, samples=16 * 63),
}


def _pinned_class(base_cls):
    """Subclass whose _mag_phase returns fixed spectrograms. Used to drive
    both implementations from *identical* STFT outputs: the centred STFT's
    reflect-padded boundary frames have exactly-real spectra whose angle()
    at negative bins flips by 2π on the sign of ~1e-18 imaginary rounding
    noise, which legitimately differs between torch's and XLA's FFTs — a
    numerics convention, not model wiring. Pinning removes it; the STFT
    itself is golden-tested separately (tests/test_stft.py)."""
    from typing import Any as _Any

    class Pinned(base_cls):
        pinned_mag: _Any = None
        pinned_phase: _Any = None

        def _mag_phase(self, x):
            return self.pinned_mag, self.pinned_phase

    Pinned.__name__ = base_cls.__name__ + "Pinned"
    return Pinned


def model_kwarg_pair(cfg: dict, n_dims: int = 4,
                     low_freq_replacement: bool = True):
    """The (reference-native, flax-native) constructor kwargs for a given
    SIZES entry — single source of truth shared with scripts/parity_bisect."""
    import jax.numpy as jnp

    dims = [cfg["dims"] * 2**i for i in range(n_dims)]
    common_ref = dict(
        patch_size=4, in_chans=1, depths=list(cfg["depths"]), dims=dims,
        ssm_d_state=1, ssm_ratio=2.0, ssm_dt_rank="auto",
        ssm_act_layer="silu", ssm_conv=3, ssm_conv_bias=True,
        # "v5no32" = production v5 with the force-fp32 cast disabled *outside*
        # the scan; both this framework's kernels and TorchRefScan cast to
        # fp32 *inside*, so the math is identical while LayerNorms stay f64
        # (plain v5 crashes torch CPU LayerNorm with mixed f32/f64 dtypes).
        ssm_drop_rate=0.0, ssm_init="v0", forward_type="v5no32",
        mlp_ratio=4.0, mlp_act_layer="gelu", mlp_drop_rate=0.0, gmlp=False,
        drop_path_rate=0.1, patch_norm=True, norm_layer="LN",
        patchembed_version="v2", downsample_version="v1",
        upsample_version="v1", output_version="v3", concat_skip=True,
        n_fft=cfg["n_fft"], hop_length=cfg["hop_length"],
        win_length=cfg["win_length"], spectro_scale="log2",
        low_freq_replacement=low_freq_replacement,
    )
    common_flax = dict(
        patch_size=4, in_chans=1, depths=cfg["depths"], dims=dims,
        ssm_d_state=1, ssm_ratio=2.0, ssm_dt_rank="auto", ssm_act="silu",
        ssm_conv=3, ssm_conv_bias=True, ssm_drop_rate=0.0,
        mlp_ratio=4.0, mlp_act="gelu", mlp_drop_rate=0.0, gmlp=False,
        drop_path_rate=0.1, patch_norm=True, patchembed_version="v2",
        output_version="v3", concat_skip=True,
        n_fft=cfg["n_fft"], hop_length=cfg["hop_length"],
        win_length=cfg["win_length"], spectro_scale="log2",
        low_freq_replacement=low_freq_replacement, dtype=jnp.float64,
    )
    return common_ref, common_flax


def run_parity(model: str = "dual", size: str = "tiny", seed: int = 0,
               batch: int = 1, pin_stft: bool = False) -> Dict[str, float]:
    import jax

    # Pin to CPU (the axon TPU plugin ignores JAX_PLATFORMS) and enable f64:
    # the torch oracle is CPU-only and TPUs have no native f64 anyway.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import torch

    from ..models.unet import DualStreamInteractiveMambaUNet, MambaUNet
    from .ref_loader import build_reference_model
    from .torch_port import assert_tree_match, state_dict_to_flax

    cfg = SIZES[size]
    torch.manual_seed(seed)
    torch.set_default_dtype(torch.float64)

    # "dual5"/"mamba5": the latent bottleneck variant (reference
    # model.py:299-332) — five dims entries, every stage downsampled.
    n_dims = 5 if model.endswith("5") else 4
    if n_dims == 5:
        model = model[:-1]
        cfg = SIZES["tiny5"]
        size = "tiny5"

    common_ref, common_flax = model_kwarg_pair(cfg, n_dims)

    if model == "dual":
        ref = build_reference_model(
            "DualStreamInteractiveMambaUNet", interact="dual", **common_ref
        )
        flax_model = DualStreamInteractiveMambaUNet(interact="dual", **common_flax)
    elif model == "mamba":
        ref = build_reference_model("MambaUNet", **common_ref)
        flax_model = MambaUNet(**common_flax)
    else:
        raise ValueError(model)

    n_params = sum(p.numel() for p in ref.parameters())

    t = cfg["samples"]
    x = torch.randn(batch, 1, t)
    # Bias the Nyquist FFT coefficient positive in every frame: for real
    # signals that bin is exactly real, and torch/XLA FFTs round its ~±0
    # imaginary part differently, flipping angle() between +π and −π — a 2π
    # jump in the phase-stream *input* that is numerical convention, not
    # model wiring. An alternating offset A·(−1)^n with A > max|x| makes the
    # bin's real part strictly positive (phase 0 on both sides).
    alt = torch.pow(torch.tensor(-1.0), torch.arange(t, dtype=torch.float64))
    x = x + (x.abs().max() + 1.0) * alt
    # Zero the reflect-padded boundary regions: the first/last centered STFT
    # frames see an even-symmetric segment whose spectrum is exactly real,
    # which flips angle() by 2π between FFT implementations the same way.
    # All-zero boundary frames have phase 0 on both sides.
    x[..., : cfg["n_fft"]] = 0.0
    x[..., -cfg["n_fft"]:] = 0.0
    freqs = cfg["n_fft"] // 2  # post-DC-drop bin count
    hf = torch.tensor([max(2, freqs // 3) + i for i in range(batch)])

    if pin_stft:
        import types

        with torch.no_grad():
            pin_mag, pin_phase = ref._mag_phase(x)
        ref._mag_phase = types.MethodType(
            lambda self, xx: (pin_mag, pin_phase), ref
        )
        pinned_cls = _pinned_class(type(flax_model))
        # Deep-copy: jnp.asarray can alias the torch buffer on CPU, and the
        # reference's in-place low-freq replacement (model.py:441-446)
        # mutates pin_mag/pin_phase during its forward.
        flax_model = pinned_cls(
            pinned_mag=jnp.asarray(np.array(pin_mag[:, 0].numpy(), copy=True)),
            pinned_phase=jnp.asarray(np.array(pin_phase[:, 0].numpy(), copy=True)),
            **({"interact": "dual"} if model == "dual" else {}),
            **common_flax,
        )

    with torch.no_grad():
        # MambaUNet.forward has hard-coded verbose prints (model.py:460) —
        # silence them for the single-stream case.
        if model == "mamba":
            import contextlib
            import io

            with contextlib.redirect_stdout(io.StringIO()):
                y_ref = ref(x, hf).numpy()
        else:
            y_ref = ref(x, hf).numpy()

    params = state_dict_to_flax(ref.state_dict(), dtype=jnp.float64)

    xj = jnp.asarray(x.numpy(), dtype=jnp.float64)
    hfj = jnp.asarray(hf.numpy())
    template = jax.eval_shape(
        lambda: flax_model.init(jax.random.PRNGKey(0), xj, hfj)
    )["params"]
    assert_tree_match(template, params)

    apply_fn = lambda p, a, h: flax_model.apply(  # noqa: E731
        {"params": p}, a, h, deterministic=True
    )
    if not pin_stft:
        # (pinned modules carry arrays in static fields — run eagerly)
        apply_fn = jax.jit(apply_fn)
    y = np.asarray(apply_fn(params, xj, hfj))

    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    ref_scale = float(np.abs(y_ref).max())
    max_abs = float(np.abs(y - y_ref).max())
    return {
        "model": model,
        "size": size,
        "max_abs": max_abs,
        "rel": max_abs / max(ref_scale, 1e-30),
        "ref_scale": ref_scale,
        "n_params": int(n_params),
    }


def run_disc_parity(kind: str = "mpd", seed: int = 0) -> Dict[str, float]:
    """Forward parity for the HiFi-GAN discriminators (reference
    model/discriminator.py) — logits and feature maps in float64."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import torch

    from ..models.discriminator import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )
    from .ref_loader import load_reference_modules
    from .torch_port import disc_variables_from_torch

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(seed)
    load_reference_modules()
    import model.discriminator as ref_disc  # noqa: resolved in the ref tree

    if kind == "mpd":
        ref = ref_disc.MultiPeriodDiscriminator(hidden=8, periods=[2, 3, 5])
        fx = MultiPeriodDiscriminator(hidden=8, periods=(2, 3, 5),
                                      dtype=jnp.float64)
    else:
        ref = ref_disc.MultiScaleDiscriminator(hidden=16)
        fx = MultiScaleDiscriminator(hidden=16, dtype=jnp.float64)

    t = 6000
    y = torch.randn(2, 1, t)
    y_hat = torch.randn(2, 1, t)

    # Converge the spectral-norm power iterations on both sides: torch's
    # effective weight W/σ then has top singular value exactly 1, so flax's
    # recomputed σ (from its own converged u) is also exactly 1 and the two
    # eval forwards coincide. (Unconverged, both frameworks use 1-step σ
    # *estimates* from private u vectors that cannot be made to agree.)
    warm = y[:1, :, :256]
    ref.train()
    with torch.no_grad():
        for _ in range(300):
            ref(warm, warm)  # MSD's meanpools reject None
    ref.eval()
    with torch.no_grad():
        r_real, r_gen, r_fr, r_fg = ref(y, y_hat)

    yj = jnp.asarray(y.numpy())
    yhj = jnp.asarray(y_hat.numpy())
    template = fx.init(jax.random.PRNGKey(0), yj, yhj, update_stats=True)
    variables = disc_variables_from_torch(ref, template)
    warm_j = yj[:1, :, :256]
    for _ in range(300):
        _, mut = fx.apply(variables, warm_j, warm_j,
                          update_stats=True, mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
    f_real, f_gen, f_fr, f_fg = fx.apply(variables, yj, yhj,
                                         update_stats=False)

    def nhwc_to_torch(a):
        a = np.asarray(a)
        if a.ndim == 4:
            return a.transpose(0, 3, 1, 2)
        if a.ndim == 3:  # (B, T, C) → (B, C, T)
            return a.transpose(0, 2, 1)
        return a

    max_abs = scale = 0.0
    for ours, theirs in zip(f_real + f_gen, r_real + r_gen):
        diff = np.abs(np.asarray(ours) - theirs.numpy())
        max_abs = max(max_abs, float(diff.max()))
        scale = max(scale, float(theirs.abs().max()))
    fmap_abs = 0.0
    for ours_list, theirs_list in zip(f_fr + f_fg, r_fr + r_fg):
        for ours, theirs in zip(ours_list, theirs_list):
            diff = np.abs(nhwc_to_torch(ours) - theirs.numpy())
            fmap_abs = max(fmap_abs, float(diff.max()))
    return {
        "model": kind,
        "max_abs": max_abs,
        "rel": max_abs / max(scale, 1e-30),
        "fmap_max_abs": fmap_abs,
        "ref_scale": scale,
    }


def run_grad_parity(size: str = "tiny", seed: int = 0, batch: int = 2,
                    topk: int = 5) -> Dict[str, float]:
    """Training-step gradient parity vs the reference.

    Computes the FULL generator loss of the flagship GAN config — L1 +
    multi-resolution STFT + MPD adversarial + feature-matching (reference
    trainer/trainer.py:318-438 assembly, model/loss.py) — in float64 on CPU
    in both frameworks on the same batch with ported weights, and compares
    EVERY generator parameter gradient. Also compares one discriminator
    step: d(discriminator_loss)/d(MPD params).

    Gradient mapping: ``state_dict_to_flax`` is a per-leaf layout bijection
    (transposes/reshapes), so the same conversion maps torch grads into the
    flax tree. For the spectral-normed MPD the flax kernel stores the
    *effective* weight W/σ while torch differentiates w.r.t. the raw W
    (parametrizations.weight.original); with converged power iterations the
    chain rule gives  grad_flax_kernel = σ · grad_torch_original  per layer
    (σ = ‖W‖_F/‖W/σ‖_F), which is applied before comparing.

    Returns worst-leaf relative errors; per-leaf scale is that leaf's
    max |grad| floored at 1e-6 × the tree-wide max (tiny-gradient leaves
    otherwise divide rounding noise by ~0).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import torch

    from .. import losses as L
    from ..models.discriminator import MultiPeriodDiscriminator
    from ..models.unet import DualStreamInteractiveMambaUNet
    from .ref_loader import build_reference_model, load_reference_modules
    from .torch_port import disc_variables_from_torch, state_dict_to_flax

    cfg = SIZES[size]
    torch.manual_seed(seed)
    torch.set_default_dtype(torch.float64)

    common_ref, common_flax = model_kwarg_pair(cfg, 4)
    ref = build_reference_model(
        "DualStreamInteractiveMambaUNet", interact="dual", **common_ref
    )
    fx = DualStreamInteractiveMambaUNet(interact="dual", **common_flax)

    load_reference_modules()
    import model.discriminator as ref_disc  # noqa: resolved in the ref tree
    import model.loss as ref_loss  # noqa: resolved in the ref tree

    if size == "prod":
        periods, hidden = (2, 3, 5, 7, 11), 32  # config.py MPD defaults
        res = ((1024, 2048, 512), (120, 240, 50), (600, 1200, 240))
    else:
        periods, hidden = (2, 3, 5), 8
        # production STFT-loss resolutions scaled to the tiny clip length
        # (torch.stft center-pads n_fft//2, which must stay < T)
        res = ((256, 512, 128), (30, 60, 12), (150, 300, 60))
    ref_mpd = ref_disc.MultiPeriodDiscriminator(hidden=hidden,
                                                periods=list(periods))
    fx_mpd = MultiPeriodDiscriminator(hidden=hidden, periods=periods,
                                      dtype=jnp.float64)

    # Batch: same boundary-doctored waveform construction as run_parity
    # (the phase stream's angle() is FFT-convention-fragile at boundary
    # frames). The target never passes through angle() — any signal works.
    t = cfg["samples"]
    x = torch.randn(batch, 1, t)
    alt = torch.pow(torch.tensor(-1.0), torch.arange(t, dtype=torch.float64))
    x = x + (x.abs().max() + 1.0) * alt
    x[..., : cfg["n_fft"]] = 0.0
    x[..., -cfg["n_fft"]:] = 0.0
    y = 0.8 * x + 0.1 * torch.randn(batch, 1, t)
    freqs = cfg["n_fft"] // 2
    hf = torch.tensor([max(2, freqs // 3) + i for i in range(batch)])

    # Converge spectral-norm power iterations on the torch side, then port.
    warm = torch.randn(1, 1, 256)
    ref_mpd.train()
    with torch.no_grad():
        for _ in range(300):
            ref_mpd(warm, warm)
    ref_mpd.eval()
    ref.eval()

    mr_stft = ref_loss.MultiResolutionSTFTLoss(
        fft_sizes=list(res[0]), hop_sizes=list(res[1]),
        win_lengths=list(res[2]), factor_sc=0.5, factor_mag=0.5,
    )
    hgl = ref_loss.HiFiGANLoss("lsgan")
    feat_lambda = 100.0  # config.py FEATURE_LOSS_LAMBDA default

    # ---- torch: full generator loss + backward --------------------------
    wave_ref = ref(x, hf)
    l1_r = ref_loss.mae_loss(wave_ref, y)
    sc_r, mag_r = mr_stft(wave_ref.squeeze(1), y.squeeze(1))
    _, y_g, f_r, f_g = ref_mpd(y, wave_ref)
    adv_r = hgl.generator_loss(y_g)
    feat_r = feat_lambda * hgl.feature_loss(f_r, f_g)
    total_r = l1_r + sc_r + mag_r + adv_r + feat_r
    ref.zero_grad()
    total_r.backward()
    grad_sd = {
        k: (p.grad if p.grad is not None else torch.zeros_like(p))
        for k, p in ref.named_parameters()
    }

    # ---- torch: discriminator step + backward ---------------------------
    y_r2, y_g2, _, _ = ref_mpd(y, wave_ref.detach())
    d_loss_r = hgl.discriminator_loss(y_r2, y_g2)
    for p in ref_mpd.parameters():
        p.grad = None
    d_loss_r.backward()

    # ---- flax: same losses via jax.grad ---------------------------------
    params = state_dict_to_flax(ref.state_dict(), dtype=jnp.float64)
    xj = jnp.asarray(x.numpy(), dtype=jnp.float64)
    yj = jnp.asarray(y.numpy(), dtype=jnp.float64)
    hfj = jnp.asarray(hf.numpy())

    template = fx_mpd.init(jax.random.PRNGKey(0), yj, yj, update_stats=True)
    disc_vars = disc_variables_from_torch(ref_mpd, template)
    warm_j = jnp.asarray(warm.numpy())
    for _ in range(300):
        _, mut = fx_mpd.apply(disc_vars, warm_j, warm_j,
                              update_stats=True, mutable=["batch_stats"])
        disc_vars = {"params": disc_vars["params"], **mut}

    stft_kw = dict(fft_sizes=res[0], hop_sizes=res[1], win_lengths=res[2],
                   factor_sc=0.5, factor_mag=0.5)

    def gen_loss(p):
        wave = fx.apply({"params": p}, xj, hfj, deterministic=True)
        l1 = L.mae_loss(wave, yj)
        sc, mag = L.multi_resolution_stft_loss(wave[:, 0], yj[:, 0], **stft_kw)
        _, yg, fr, fg = fx_mpd.apply(disc_vars, yj, wave, update_stats=False)
        adv = L.generator_adversarial_loss(yg, "lsgan")
        feat = feat_lambda * L.feature_matching_loss(fr, fg)
        return l1 + sc + mag + adv + feat, (l1, sc + mag, adv, feat)

    (total_f, terms_f), g_fx = jax.value_and_grad(gen_loss, has_aux=True)(params)

    wave_fx = fx.apply({"params": params}, xj, hfj, deterministic=True)

    def d_loss_fn(dp):
        v = {"params": dp, "batch_stats": disc_vars["batch_stats"]}
        yr, yg, _, _ = fx_mpd.apply(v, yj, jax.lax.stop_gradient(wave_fx),
                                    update_stats=False)
        return L.discriminator_loss(yr, yg, "lsgan")

    d_loss_f, gd_fx = jax.value_and_grad(d_loss_fn)(disc_vars["params"])

    # ---- compare generator grads ---------------------------------------
    from flax.traverse_util import flatten_dict

    g_ref_tree = state_dict_to_flax(grad_sd, dtype=jnp.float64)
    flat_ref = flatten_dict(g_ref_tree)
    flat_fx = flatten_dict(g_fx)
    assert set(flat_ref) == set(flat_fx), (
        set(flat_ref) ^ set(flat_fx)
    )
    g_scale = max(float(jnp.abs(g).max()) for g in flat_ref.values())
    floor = 1e-6 * g_scale
    leaf_rows = []
    for key in flat_ref:
        a, b = np.asarray(flat_fx[key]), np.asarray(flat_ref[key])
        max_abs = float(np.abs(a - b).max())
        scale = max(float(np.abs(b).max()), floor)
        leaf_rows.append(("/".join(key), max_abs / scale, max_abs))
    leaf_rows.sort(key=lambda r: -r[1])
    worst_rel = leaf_rows[0][1]

    # ---- compare discriminator grads ------------------------------------
    d_rows = []
    d_scale = 0.0
    for dkey, sub in gd_fx.items():  # disc_{i}
        tdisc = ref_mpd.discriminators[int(dkey.split("_")[1])]
        for name, leaf in sub.items():
            layer = (tdisc.conv_post if name == "conv_post"
                     else (getattr(tdisc, "layers", None) or tdisc.convs)[
                         int(name.split("_")[1])])
            w_orig = layer.parametrizations.weight.original
            sigma = float(w_orig.detach().norm()
                          / layer.weight.detach().norm())
            gw = (w_orig.grad * sigma).detach().numpy()
            gw = (gw.transpose(2, 3, 1, 0) if gw.ndim == 4
                  else gw.transpose(2, 1, 0))
            gb = layer.bias.grad.detach().numpy()
            for leaf_name, got, want in (("kernel", leaf["kernel"], gw),
                                         ("bias", leaf["bias"], gb)):
                max_abs = float(np.abs(np.asarray(got) - want).max())
                d_rows.append((f"{dkey}/{name}/{leaf_name}", max_abs,
                               float(np.abs(want).max())))
                d_scale = max(d_scale, float(np.abs(want).max()))
    d_floor = 1e-6 * d_scale
    d_rows = [(k, ma / max(sc, d_floor), ma) for k, ma, sc in d_rows]
    d_rows.sort(key=lambda r: -r[1])

    return {
        "size": size,
        "batch": batch,
        "n_gen_leaves": len(leaf_rows),
        "n_disc_leaves": len(d_rows),
        "gen_loss_ref": float(total_r.item()),
        "gen_loss_flax": float(total_f),
        "disc_loss_ref": float(d_loss_r.item()),
        "disc_loss_flax": float(d_loss_f),
        "gen_worst_rel": worst_rel,
        "gen_worst_leaves": leaf_rows[:topk],
        # worst absolute error normalised by the tree-wide gradient scale —
        # the per-leaf rel above divides fp32-scan-interior rounding noise
        # (~1e-8 absolute) by small per-leaf scales; this one shows the
        # error against the gradient magnitudes that actually drive updates
        "gen_tree_rel": max(r[2] for r in leaf_rows) / g_scale,
        "disc_worst_rel": d_rows[0][1],
        "disc_worst_leaves": d_rows[:topk],
        "disc_tree_rel": max(r[2] for r in d_rows) / max(d_scale, 1e-30),
        "grad_scale": g_scale,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="dual",
                    choices=["dual", "mamba", "dual5", "mamba5", "mpd", "msd"])
    ap.add_argument("--size", default="tiny", choices=list(SIZES))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--pin-stft", action="store_true",
                    help="drive both models from identical (torch) STFT "
                    "outputs — removes the boundary-frame ±π FFT-convention "
                    "noise (see _pinned_class)")
    ap.add_argument("--grads", action="store_true",
                    help="training-step gradient parity: full generator GAN "
                    "loss + one discriminator step, every parameter grad "
                    "compared (float64, CPU)")
    args = ap.parse_args()
    if args.grads:
        print(json.dumps(run_grad_parity(args.size, args.seed,
                                         batch=args.batch)))
        return
    if args.model in ("mpd", "msd"):
        print(json.dumps(run_disc_parity(args.model, args.seed)))
        return
    print(json.dumps(run_parity(args.model, args.size, args.seed, args.batch,
                                pin_stft=args.pin_stft)))


if __name__ == "__main__":
    main()
