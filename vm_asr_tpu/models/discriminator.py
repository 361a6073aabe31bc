"""HiFi-GAN-style discriminators (reference model/discriminator.py:21-313).

- MultiPeriodDiscriminator: 5 period-folded Conv2d stacks (periods 2,3,5,7,11)
- MultiScaleDiscriminator: 3 Conv1d stacks over AvgPool-downsampled audio

Norm note: the reference's flag is inverted — ``weight_norm if
use_spectral_norm else spectral_norm`` with default False
(discriminator.py:37,177) — so the shipped models actually train with
*spectral* norm everywhere. We preserve that default behaviour
(``use_spectral_norm=False`` → spectral norm). Spectral-norm power-iteration
vectors live in the ``batch_stats`` collection (flax.linen.SpectralNorm);
training steps must pass ``update_stats=True`` and mutate that collection.

Layouts are channels-last: audio (B, T, 1); the period fold produces
(B, T/p, p, 1) NHWC images so the Conv2d stride runs on the time axis.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import _gelu_exact as gelu_exact, torch_bias_init, torch_linear_init


def _maybe_sn(layer: nn.Module, spectral: bool) -> nn.Module:
    return nn.SpectralNorm(layer, error_on_non_matrix=False) if spectral else layer


class GroupedConv1d(nn.Module):
    """Grouped 1-D conv as ``feature_group_count`` dense convs on slices.

    Parameter-compatible with ``nn.Conv`` (kernel ``(k, C_in/g, C_out)``,
    bias ``(C_out,)``) — checkpoints, the torch-port bijection, and the
    SpectralNorm wrapper are unchanged. Needed because XLA GSPMD
    mis-partitions the grouped-convolution KERNEL gradient on any mesh with
    an axis the conv is replicated over: under a dp×mp mesh the grad comes
    back scaled by exactly the mp size (2× on dp4×mp2) for every
    ``feature_group_count > 1`` conv, dense convs are exact (minimal repro:
    tests/test_mp.py::test_grouped_conv_kernel_grad_mp). Decomposed into g
    dense convs over channel slices of the SAME kernel parameter, every
    gradient takes the dense-conv path GSPMD partitions correctly.
    """

    features: int
    kernel_size: int
    strides: int = 1
    padding: Tuple[int, int] = (0, 0)
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Any = torch_linear_init
    bias_init: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax.lax as lax

        g = self.feature_group_count
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (self.kernel_size, c_in // g, self.features),
        )
        bias = (
            self.param("bias", self.bias_init or nn.initializers.zeros,
                       (self.features,))
            if self.use_bias else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        ci, co = c_in // g, self.features // g
        dn = ("NWC", "WIO", "NWC")
        outs = [
            lax.conv_general_dilated(
                x[..., i * ci : (i + 1) * ci],
                kernel[..., i * co : (i + 1) * co],
                (self.strides,),
                [self.padding],
                dimension_numbers=dn,
            )
            for i in range(g)
        ]
        y = jnp.concatenate(outs, axis=-1) if g > 1 else outs[0]
        return y if bias is None else y + bias


def _real_fake_pass(disc, y, y_hat, update_stats):
    """Run a sub-discriminator on the (real, fake) pair.

    When stats are frozen (the generator-loss pass) the two passes share
    weights, so they batch into ONE conv stack along the batch axis —
    exact per-sample math, and fewer, larger ops on a TPU core (which runs
    independent small ops sequentially). Kept as two calls under
    ``update_stats`` so spectral-norm power iterations advance exactly
    once per pass, like the reference's per-forward torch hook
    (discriminator.py:37,177)."""
    if y_hat is not None and not update_stats:
        b = y.shape[0]
        s_b, f_b = disc(jnp.concatenate([y, y_hat], axis=0),
                        update_stats=False)
        return s_b[:b], [f[:b] for f in f_b], s_b[b:], [f[b:] for f in f_b]
    s_r, f_r = disc(y, update_stats=update_stats)
    if y_hat is None:
        return s_r, f_r, 0, 0
    s_g, f_g = disc(y_hat, update_stats=update_stats)
    return s_r, f_r, s_g, f_g


class PeriodDiscriminator(nn.Module):
    """Conv2d stack over the period-folded waveform
    (reference discriminator.py:21-118)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    hidden: int = 32
    use_spectral_norm: bool = False  # False → spectral norm (see module doc)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False):
        spectral = not self.use_spectral_norm
        b, t = x.shape[0], x.shape[-1]
        x = x.reshape(b, t)  # accept (B, T) or (B, 1, T)
        if t % self.period:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1)  # NHWC

        pad = (self.kernel_size - 1) // 2
        widths = [
            self.hidden,
            self.hidden * 4,
            self.hidden * 16,
            self.hidden * 32,
            self.hidden * 32,
        ]
        strides = [self.stride] * 4 + [1]
        feature_map: List[jnp.ndarray] = []
        fan_in = 1
        for i, (w_out, s) in enumerate(zip(widths, strides)):
            conv = nn.Conv(
                w_out,
                kernel_size=(self.kernel_size, 1),
                strides=(s, 1),
                padding=((pad, pad), (0, 0)),
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(fan_in * self.kernel_size),
                dtype=self.dtype,
                name=f"conv_{i}",
            )
            x = _maybe_sn(conv, spectral)(x, update_stats=update_stats) if spectral \
                else conv(x)
            x = gelu_exact(x)
            feature_map.append(x)
            fan_in = w_out

        post = nn.Conv(
            1,
            kernel_size=(3, 1),
            strides=(1, 1),
            padding=((1, 1), (0, 0)),
            kernel_init=torch_linear_init,
            bias_init=torch_bias_init(fan_in * 3),
            dtype=self.dtype,
            name="conv_post",
        )
        x = _maybe_sn(post, spectral)(x, update_stats=update_stats) if spectral \
            else post(x)
        feature_map.append(x)
        return x.reshape(b, -1), feature_map


class MultiPeriodDiscriminator(nn.Module):
    """(reference discriminator.py:121-147)."""

    hidden: int = 32
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        y: jnp.ndarray,
        y_hat: Optional[jnp.ndarray],
        update_stats: bool = False,
    ) -> Tuple[list, list, list, list]:
        y_real, y_gen, fmap_real, fmap_gen = [], [], [], []
        for i, p in enumerate(self.periods):
            disc = PeriodDiscriminator(
                period=p,
                hidden=self.hidden,
                use_spectral_norm=self.use_spectral_norm,
                dtype=self.dtype,
                name=f"disc_{i}",
            )
            s_r, f_r, s_g, f_g = _real_fake_pass(disc, y, y_hat, update_stats)
            y_real.append(s_r)
            fmap_real.append(f_r)
            y_gen.append(s_g)
            fmap_gen.append(f_g)
        return y_real, y_gen, fmap_real, fmap_gen


# ---------------------------------------------------------------------------
# Stacked MPD execution (TPU training optimization)
#
# The reference runs its 5 period discriminators sequentially
# (discriminator.py:121-147); a TPU core executes independent small convs
# SEQUENTIALLY, so the MPD costs 5 conv stacks' worth of op-dispatch per pass
# (measured: 144 ms = 28% of the 48 kHz GAN step at batch 8, BENCH_r04). Like
# the dual-stream stacking (unet.py DualStreamStackedMambaUNet), the periods
# fold into ONE leading lane axis and nn.vmap batches every quintuple of
# convs into one op. Periods fold to different image shapes, so lanes pad to
# the group's (max ceil(T/p), max p); after every conv a static mask re-zeros
# the padded region, which makes the valid region BIT-EXACT vs the unstacked
# stack (padded rows re-become the zeros the unstacked conv's own zero
# padding provides), and the per-period scores/feature-maps are sliced back
# out before the losses — identical loss values, fewer, larger ops. The
# `groups` knob trades op count against padded-FLOP waste: one group of all
# 5 periods pads every lane to (T/2, 11) (≈5.5× the real element count);
# [[2,3],[5,7,11]] cuts the waste to ≈1.9× at 2 stacks.
# ---------------------------------------------------------------------------


def _conv_out_len(h: int, k: int, s: int, pad: int) -> int:
    return (h + 2 * pad - k) // s + 1


def _fold_period(x: jnp.ndarray, period: int) -> jnp.ndarray:
    """(B, T) → (B, ceil(T/p), p) with the reference's reflect pad
    (discriminator.py:62-66)."""
    b, t = x.shape
    if t % period:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    return x.reshape(b, t // period, period)


def _mpd_stack_geometry(t: int, group: Sequence[int], kernel_size: int,
                        stride: int):
    """Static shapes for one stacked group: per-lane valid (H, W) through
    the 6 convs, plus the common padded (H̄, W̄)."""
    pad = (kernel_size - 1) // 2
    specs = [(kernel_size, stride, pad)] * 4 + [
        (kernel_size, 1, pad),
        (3, 1, 1),
    ]
    lane_heights = []  # per lane: [h_in, h_after_conv0, ..., h_after_post]
    for p in group:
        h = -(-t // p)  # ceil
        hs = [h]
        for k, s, pd in specs:
            h = _conv_out_len(h, k, s, pd)
            hs.append(h)
        lane_heights.append(hs)
    h_bar = [max(hs[i] for hs in lane_heights) for i in range(len(specs) + 1)]
    w_bar = max(group)
    return lane_heights, h_bar, w_bar, specs


def _group_masks(t: int, group: Sequence[int], kernel_size: int, stride: int,
                 dtype) -> Tuple[Tuple[jnp.ndarray, ...], list]:
    """Per-conv-layer stacked masks (G, H_l, W̄, 1): 1 on each lane's valid
    rows/columns, 0 on padding. Built from static shapes at trace time."""
    import numpy as np

    lane_heights, h_bar, w_bar, specs = _mpd_stack_geometry(
        t, group, kernel_size, stride
    )
    masks = []
    for li in range(len(specs)):
        h_l = h_bar[li + 1]
        m = np.zeros((len(group), h_l, w_bar, 1), np.float32)
        for lane, p in enumerate(group):
            m[lane, : lane_heights[lane][li + 1], :p, :] = 1.0
        masks.append(jnp.asarray(m, dtype))
    return tuple(masks), lane_heights


class _PeriodConvStack(nn.Module):
    """One period-discriminator conv stack over a pre-folded, padded NHWC
    image; `masks` re-zero the padding after every conv (see module-level
    note). Inner module layout (conv_0..conv_4, conv_post + SpectralNorm_k)
    matches PeriodDiscriminator exactly so stacked↔unstacked parameter
    conversion is a pure leaf stack."""

    kernel_size: int = 5
    stride: int = 3
    hidden: int = 32
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, masks, update_stats: bool = False):
        spectral = not self.use_spectral_norm
        pad = (self.kernel_size - 1) // 2
        widths = [
            self.hidden,
            self.hidden * 4,
            self.hidden * 16,
            self.hidden * 32,
            self.hidden * 32,
        ]
        strides = [self.stride] * 4 + [1]
        feature_map: List[jnp.ndarray] = []
        fan_in = 1
        for i, (w_out, s) in enumerate(zip(widths, strides)):
            conv = nn.Conv(
                w_out,
                kernel_size=(self.kernel_size, 1),
                strides=(s, 1),
                padding=((pad, pad), (0, 0)),
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(fan_in * self.kernel_size),
                dtype=self.dtype,
                name=f"conv_{i}",
            )
            x = _maybe_sn(conv, spectral)(x, update_stats=update_stats) if spectral \
                else conv(x)
            # Mask before the GELU: gelu(0) = 0, so the padded region goes
            # back to exact zeros and the next conv sees them as implicit
            # zero padding — bit-exact valid rows vs the unstacked stack.
            x = x * masks[i]
            x = gelu_exact(x)
            feature_map.append(x)
            fan_in = w_out

        post = nn.Conv(
            1,
            kernel_size=(3, 1),
            strides=(1, 1),
            padding=((1, 1), (0, 0)),
            kernel_init=torch_linear_init,
            bias_init=torch_bias_init(fan_in * 3),
            dtype=self.dtype,
            name="conv_post",
        )
        x = _maybe_sn(post, spectral)(x, update_stats=update_stats) if spectral \
            else post(x)
        x = x * masks[5]
        feature_map.append(x)
        return x, feature_map


def _stacked_period_cls(axis_size: int):
    return nn.vmap(
        _PeriodConvStack,
        in_axes=(0, 0, None),
        out_axes=0,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        axis_size=axis_size,
    )


class StackedMultiPeriodDiscriminator(nn.Module):
    """Drop-in MultiPeriodDiscriminator with the period stacks vmapped
    (see module-level note). Same call signature and return structure;
    loss-identical (valid regions bit-exact, then sliced out). Convert
    trained unstacked weights with :func:`stack_mpd_params`.

    `groups` partitions `periods` IN ORDER into vmap groups; None = one
    group of all periods. dp×mp caveat: the vmapped convs lower to
    feature_group_count>1 convolutions, whose KERNEL gradient XLA GSPMD
    mis-partitions on meshes with a replicated axis (the bug GroupedConv1d
    works around) — keep stacked MPD on dp-only meshes, or verify with
    tests/test_mp.py-style grad equivalence first."""

    hidden: int = 32
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    groups: Optional[Sequence[Sequence[int]]] = None
    use_spectral_norm: bool = False
    kernel_size: int = 5
    stride: int = 3
    dtype: Any = jnp.float32

    def _group_partition(self) -> Tuple[Tuple[int, ...], ...]:
        if not self.groups:
            return (tuple(self.periods),)
        flat = tuple(p for g in self.groups for p in g)
        if flat != tuple(self.periods):
            raise ValueError(
                f"groups {self.groups} must partition periods "
                f"{tuple(self.periods)} in order"
            )
        return tuple(tuple(g) for g in self.groups)

    @nn.compact
    def __call__(
        self,
        y: jnp.ndarray,
        y_hat: Optional[jnp.ndarray],
        update_stats: bool = False,
    ) -> Tuple[list, list, list, list]:
        b = y.shape[0]
        y2 = y.reshape(b, -1)
        yh2 = y_hat.reshape(b, -1) if y_hat is not None else None
        t = y2.shape[-1]

        y_real, y_gen, fmap_real, fmap_gen = [], [], [], []
        for gi, group in enumerate(self._group_partition()):
            lane_heights, h_bar, w_bar, _ = _mpd_stack_geometry(
                t, group, self.kernel_size, self.stride
            )
            masks, _ = _group_masks(
                t, group, self.kernel_size, self.stride, self.dtype
            )
            mod = _stacked_period_cls(len(group))(
                kernel_size=self.kernel_size,
                stride=self.stride,
                hidden=self.hidden,
                use_spectral_norm=self.use_spectral_norm,
                dtype=self.dtype,
                name=f"group_{gi}",
            )

            def fold_stack(w):
                lanes = []
                for lane, p in enumerate(group):
                    img = _fold_period(w, p)
                    h0 = lane_heights[lane][0]
                    img = jnp.pad(
                        img,
                        ((0, 0), (0, h_bar[0] - h0), (0, w_bar - p)),
                    )
                    lanes.append(img)
                return jnp.stack(lanes)[..., None]  # (G, B', H̄, W̄, 1)

            # Same real/fake batching policy as _real_fake_pass: one
            # batched pass when stats are frozen, two sequential passes
            # under update_stats so each power iteration advances once per
            # forward, like the reference's per-forward torch hook.
            if yh2 is not None and not update_stats:
                score, fmaps = mod(
                    fold_stack(jnp.concatenate([y2, yh2], axis=0)),
                    masks, False,
                )
                score_r, score_g = score[:, :b], score[:, b:]
                fmaps_r = [f[:, :b] for f in fmaps]
                fmaps_g = [f[:, b:] for f in fmaps]
            else:
                score_r, fmaps_r = mod(fold_stack(y2), masks, update_stats)
                if yh2 is None:
                    score_g, fmaps_g = None, None
                else:
                    score_g, fmaps_g = mod(fold_stack(yh2), masks,
                                           update_stats)

            for lane, p in enumerate(group):
                hs = lane_heights[lane]
                y_real.append(
                    score_r[lane, :, : hs[-1], :p].reshape(b, -1)
                )
                fmap_real.append(
                    [f[lane, :, : hs[li + 1], :p, :]
                     for li, f in enumerate(fmaps_r)]
                )
                if score_g is None:
                    y_gen.append(0)
                    fmap_gen.append(0)
                else:
                    y_gen.append(
                        score_g[lane, :, : hs[-1], :p].reshape(b, -1)
                    )
                    fmap_gen.append(
                        [f[lane, :, : hs[li + 1], :p, :]
                         for li, f in enumerate(fmaps_g)]
                    )
        return y_real, y_gen, fmap_real, fmap_gen


def stack_mpd_params(variables, periods=(2, 3, 5, 7, 11), groups=None):
    """Convert MultiPeriodDiscriminator variables ({disc_i} subtrees) into
    StackedMultiPeriodDiscriminator variables ({group_g} subtrees whose
    leaves carry a leading lane axis). Works on any collection set
    ({params}, {params, batch_stats})."""
    import jax as _jax

    if not groups:
        groups = (tuple(periods),)
    periods = list(periods)
    out = {}
    for coll, tree in variables.items():
        new = {}
        idx = 0
        for gi, group in enumerate(groups):
            lanes = [tree[f"disc_{periods.index(p)}"] for p in group]
            new[f"group_{gi}"] = _jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *lanes
            )
            idx += len(group)
        out[coll] = new
    return out


def unstack_mpd_params(variables, periods=(2, 3, 5, 7, 11), groups=None):
    """Inverse of :func:`stack_mpd_params`."""
    import jax as _jax

    if not groups:
        groups = (tuple(periods),)
    periods = list(periods)
    out = {}
    for coll, tree in variables.items():
        new = {}
        for gi, group in enumerate(groups):
            sub = tree[f"group_{gi}"]
            for lane, p in enumerate(group):
                new[f"disc_{periods.index(p)}"] = _jax.tree_util.tree_map(
                    lambda x, _l=lane: x[_l], sub
                )
        out[coll] = new
    return out


class ScaleDiscriminator(nn.Module):
    """Conv1d stack (reference discriminator.py:174-271)."""

    hidden: int = 128
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False):
        spectral = not self.use_spectral_norm
        b = x.shape[0]
        x = x.reshape(b, x.shape[-1], 1)  # (B, T, C)

        h = self.hidden
        specs = [
            # (out, kernel, stride, groups, padding)
            (h, 15, 1, 1, 7),
            (h, 41, 4, 4, 20),
            (h * 2, 41, 4, 16, 20),
            (h * 4, 41, 4, 16, 20),
            (h * 8, 41, 4, 16, 20),
            (h * 8, 41, 4, 16, 20),
            (h * 8, 5, 1, 1, 2),
        ]
        feature_map: List[jnp.ndarray] = []
        fan_in = 1
        for i, (w_out, k, s, g, pad) in enumerate(specs):
            # GroupedConv1d, not nn.Conv: GSPMD doubles the grouped-conv
            # kernel grad under dp×mp meshes (see class docstring).
            conv = GroupedConv1d(
                w_out,
                kernel_size=k,
                strides=s,
                padding=(pad, pad),
                feature_group_count=g,
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(max(fan_in // g, 1) * k),
                dtype=self.dtype,
                name=f"conv_{i}",
            )
            x = _maybe_sn(conv, spectral)(x, update_stats=update_stats) if spectral \
                else conv(x)
            x = gelu_exact(x)
            feature_map.append(x)
            fan_in = w_out

        post = nn.Conv(
            1,
            kernel_size=(3,),
            strides=(1,),
            padding=((1, 1),),
            kernel_init=torch_linear_init,
            bias_init=torch_bias_init(fan_in * 3),
            dtype=self.dtype,
            name="conv_post",
        )
        x = _maybe_sn(post, spectral)(x, update_stats=update_stats) if spectral \
            else post(x)
        feature_map.append(x)
        return x.reshape(b, -1), feature_map


class MultiScaleDiscriminator(nn.Module):
    """3 scales with AvgPool(4, 2, pad 2) between
    (reference discriminator.py:274-313)."""

    hidden: int = 128
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        y: jnp.ndarray,
        y_hat: Optional[jnp.ndarray],
        update_stats: bool = False,
    ) -> Tuple[list, list, list, list]:
        def pool(v):
            v = v.reshape(v.shape[0], v.shape[-1], 1)
            v = nn.avg_pool(v, window_shape=(4,), strides=(2,), padding=((2, 2),))
            return v[..., 0]

        y = y.reshape(y.shape[0], y.shape[-1])
        if y_hat is not None:
            y_hat = y_hat.reshape(y_hat.shape[0], y_hat.shape[-1])

        y_real, y_gen, fmap_real, fmap_gen = [], [], [], []
        for i in range(3):
            if i != 0:
                y = pool(y)
                y_hat = pool(y_hat) if y_hat is not None else None
            disc = ScaleDiscriminator(
                hidden=self.hidden,
                use_spectral_norm=self.use_spectral_norm,
                dtype=self.dtype,
                name=f"disc_{i}",
            )
            s_r, f_r, s_g, f_g = _real_fake_pass(disc, y, y_hat, update_stats)
            y_real.append(s_r)
            fmap_real.append(f_r)
            y_gen.append(s_g)
            fmap_gen.append(f_g)
        return y_real, y_gen, fmap_real, fmap_gen
