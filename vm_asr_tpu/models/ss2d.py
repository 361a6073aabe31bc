"""SS2D: 2-D selective scan block (the Mamba-2D core), flax/TPU edition.

Pipeline (reference SS2D.__initv2__/forwardv2/forward_corev2,
model/vmamba.py:696-931, 1377-1552, production forward_type "v5"):

    in_proj → (x, gate z) → depthwise 3×3 conv → SiLU
    → cross-scan into K=4 directional sequences
    → per-direction projections to (Δ, B, C)
    → selective scan (fp32, Pallas kernel)
    → cross-merge → LayerNorm → ·SiLU(z) → out_proj

TPU-native layout decisions:
- NHWC activations; sequences as (B, L, K, D) with K·D on lanes
  (a lane multiple at every stage — no channel padding in the scan kernel).
- The (Δ,B,C) projections are batched matmuls (einsum over K) on the MXU.
- force_fp32 semantics of the reference's v2/v5 forward types
  (vmamba.py:842-848) live inside `ops.selective_scan`.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from ..ops import cross_merge, cross_scan, selective_scan
from .layers import DepthwiseConv2d, LayerNorm, get_activation, torch_bias_init, torch_linear_init, trunc_normal_init


def _constrain_directions(xs: jnp.ndarray) -> jnp.ndarray:
    """Shard the K direction axis of (B, L, K, D) over an active ``mp`` mesh
    (batch over ``dp``) so the Δ/B/C einsums partition per direction. No-op
    when no mesh is installed (parallel.set_activation_mesh)."""
    from ..parallel import mp_mesh

    mesh = mp_mesh()
    if mesh is None:
        return xs
    b, _, k, _ = xs.shape
    if k % mesh.shape["mp"] or b % mesh.shape["dp"]:
        return xs
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        xs, NamedSharding(mesh, P("dp", None, "mp", None))
    )


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dt_bias_init(dt_min: float, dt_max: float, dt_init_floor: float):
    """softplus^{-1} of dt ~ LogUniform(dt_min, dt_max)
    (reference vmamba.py:1225-1234)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, dt_init_floor, None)
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def _a_log_init(d_state: int):
    """S4D-real init: A = -(1..N) per channel (reference vmamba.py:1240-1255)."""

    def init(key, shape, dtype=jnp.float32):
        # shape: (K, D, N)
        a = jnp.arange(1, d_state + 1, dtype=jnp.float32)
        return jnp.broadcast_to(jnp.log(a), shape).astype(dtype)

    return init


class SS2D(nn.Module):
    d_model: int
    d_state: int = 1
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    act: str = "silu"
    d_conv: int = 3
    conv_bias: bool = True
    dropout: float = 0.0
    bias: bool = False
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    initialize: str = "v0"
    # v2-family forward options (reference forward_type tags, vmamba.py:739-769).
    # The dead v0/forwardxv paths (unused by any shipped config) are
    # deliberately not reproduced.
    disable_z: bool = False
    disable_z_act: bool = False
    out_norm: str = "ln"  # ln | none | softmax | sigmoid | dwconv3
    k_group: int = 4
    scan_impl: Optional[str] = None  # None → auto by backend
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, h, w, _ = x.shape
        d_inner = int(self.ssm_ratio * self.d_model)
        r = (
            math.ceil(self.d_model / 16)
            if self.dt_rank == "auto"
            else int(self.dt_rank)
        )
        n = self.d_state
        k = self.k_group
        act = get_activation(self.act)

        d_proj = d_inner if self.disable_z else 2 * d_inner
        xz = nn.Dense(
            d_proj,
            use_bias=self.bias,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="in_proj",
        )(x)
        if self.disable_z:
            xs2d, z = xz, None
        else:
            xs2d, z = jnp.split(xz, 2, axis=-1)
            if not self.disable_z_act:
                z = act(z)

        if self.d_conv > 1:
            # DepthwiseConv2d, not nn.Conv: GSPMD doubles the grouped-conv
            # kernel grad under dp×mp meshes (see models/layers.py).
            xs2d = DepthwiseConv2d(
                d_inner,
                kernel_size=(self.d_conv, self.d_conv),
                use_bias=self.conv_bias,
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(self.d_conv * self.d_conv),
                dtype=self.dtype,
                name="conv2d",
            )(xs2d)
        xs2d = act(xs2d)

        # ---- directional sequences + projections (MXU) ----------------------
        xs = cross_scan(xs2d)  # (B, L, K, D) — K·D on lanes
        xs = _constrain_directions(xs)  # mp: shard K (no-op without a mesh)

        x_proj_w = self.param(
            "x_proj_weight",
            _uniform_init(1.0 / np.sqrt(d_inner)),
            (k, r + 2 * n, d_inner),
        )
        x_dbl = jnp.einsum(
            "blkd,kcd->blkc", xs, x_proj_w.astype(xs.dtype)
        )  # (B, L, K, R+2N)
        dts, bs, cs = jnp.split(x_dbl, [r, r + n], axis=-1)

        dt_w = self.param(
            "dt_projs_weight", _uniform_init(r**-0.5), (k, d_inner, r)
        )
        dts = jnp.einsum("blkr,kdr->blkd", dts, dt_w.astype(dts.dtype))

        dt_bias = self.param(
            "dt_projs_bias",
            _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (k, d_inner),
        )
        a_logs = self.param("A_logs", _a_log_init(n), (k, d_inner, n))
        d_skip = self.param("Ds", nn.initializers.ones, (k, d_inner))

        a = -jnp.exp(a_logs.astype(jnp.float32))
        y = selective_scan(
            xs, dts, a, bs, cs, d_skip, dt_bias,
            delta_softplus=True, impl=self.scan_impl,
        )  # (B, L, K, D) in xs.dtype
        # Remat tag: under USE_CHECKPOINT the VSSBlock's rematerialisation
        # policy saves this output instead of re-running the scan kernel in
        # the backward (vss.py save_only_these_names("scan_out")).
        y = _checkpoint_name(y, "scan_out")

        y = cross_merge(y, h, w)  # (B, L, D)

        if self.out_norm == "ln":
            y = LayerNorm(dtype=self.dtype, name="out_norm")(y)
        elif self.out_norm == "softmax":
            y = jax.nn.softmax(y, axis=1)
        elif self.out_norm == "sigmoid":
            y = jax.nn.sigmoid(y)
        y = y.reshape(b, h, w, d_inner)
        if self.out_norm == "dwconv3":
            # depthwise 3×3 "norm" variant (reference vmamba.py:748-752)
            y = DepthwiseConv2d(
                d_inner, kernel_size=(3, 3), use_bias=False,
                kernel_init=torch_linear_init, dtype=self.dtype,
                name="out_norm_dwconv",
            )(y)
        y = y.astype(x.dtype)

        if z is not None:
            y = y * z
        out = nn.Dense(
            self.d_model,
            use_bias=self.bias,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="out_proj",
        )(y)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out
