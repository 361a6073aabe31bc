"""Fused selective-scan kernel in (B, L, K·D) layout (N = 1 fast path).

The unfused path materialises the decay/increment arrays between XLA and the
scan kernel: per element the pipeline touches HBM ~10×. This kernel computes
the *entire* selective scan —

    dt = softplus(dts + bias);  a = exp(dt·A);  b = dt·u·B
    h  = scan(a, b);            y = C·h + D_skip·u

— in one pass: reads u, dts (plus L-sized B/C direction vectors and tiny
per-channel parameters), writes y. ~3× less HBM traffic than the unfused
path on a bandwidth-bound op.

Layout: the K=4 scan directions live INSIDE the lane axis — arrays are
``(B, L, K·D)`` with channel q = k·D + d. For the production model K·D is
always a lane multiple (128/256/512/1024), so no padding is ever spent on the
channel axis and grid rows are just the batch. The per-direction B/C vectors
are expanded to lanes in-register with a one-hot matmul (MXU) instead of a
materialised broadcast.

This is the TPU counterpart of the reference CUDA kernel's full fusion
(cus/selective_scan_fwd_kernel.cuh:63-171 computes softplus/exp/scan/D-skip
inline), specialised to d_state N=1 like the reference's `ndstate` build
(cusndstate/selective_scan_ndstate.cpp:184) — VM-ASR's production configs run
N=1 (config.py:100).

The backward pass reuses the generic linear-recurrence kernel (replay +
time-reversed adjoint scan) with the chain rule in XLA; forward residuals are
the op's own inputs, so no extra activation memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear_recurrence import _chunk_scan, _lr_impl


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _make_kernel(k_group: int, d_inner: int, d_tile: int):
    """Kernel for one (batch row, channel tile, L chunk) block."""

    def kernel(u_ref, dt_ref, b_ref, c_ref, a_ref, bias_ref, dskip_ref,
               y_ref, carry):
        l_idx = pl.program_id(2)
        d_idx = pl.program_id(1)

        @pl.when(l_idx == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        # Inputs may be bf16 (the model's compute dtype); all scan maths is
        # fp32 in-register (reference force_fp32, vmamba.py:842-848).
        u = u_ref[0].astype(jnp.float32)  # (CHUNK, DT)
        dt = jax.nn.softplus(dt_ref[0].astype(jnp.float32) + bias_ref[0])
        # Select each lane's direction value: lane j in this tile is channel
        # q = d_idx*DT + j with direction k = q // d_inner. One-hot matmul
        # expands (CHUNK, K) → (CHUNK, DT); HIGHEST precision keeps the fp32
        # B/C values exact (default MXU precision rounds through bf16).
        lane_q = d_idx * d_tile + jax.lax.broadcasted_iota(
            jnp.int32, (1, d_tile), 1
        )
        lane_k = lane_q // d_inner  # (1, DT)
        rows_k = jax.lax.broadcasted_iota(jnp.int32, (k_group, 1), 0)
        onehot = (rows_k == lane_k).astype(jnp.float32)  # (K, DT)
        bvec = jnp.dot(b_ref[0].astype(jnp.float32), onehot,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        cvec = jnp.dot(c_ref[0].astype(jnp.float32), onehot,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

        a = jnp.exp(dt * a_ref[0])  # a_ref holds A = -exp(A_logs)
        b = dt * u * bvec
        p, s = _chunk_scan(a, b)
        h = s + p * carry[0][None, :]
        chunk = h.shape[0]
        carry[...] = h[chunk - 1 : chunk, :]
        y_ref[0] = (cvec * h + dskip_ref[0] * u).astype(y_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k_group", "chunk", "d_tile", "interpret")
)
def _fused_fwd_pallas(u, dts, bs, cs, a_neg, dt_bias, d_skip, k_group,
                      chunk=512, d_tile=128, interpret=False):
    """u/dts: (B, L, KD) fp32 or bf16; bs/cs: (B, L, K); params: (KD,) fp32.

    Output dtype follows ``u`` (scan maths itself is always fp32)."""
    bsz, l, kd = u.shape
    out_dtype = u.dtype
    d_inner = kd // k_group
    lp = _round_up(l, chunk)
    kdp = _round_up(kd, 128)
    d_tile = min(d_tile, kdp)
    kdp = _round_up(kdp, d_tile)
    if (lp, kdp) != (l, kd):
        u = jnp.pad(u, ((0, 0), (0, lp - l), (0, kdp - kd)))
        dts = jnp.pad(dts, ((0, 0), (0, lp - l), (0, kdp - kd)))
        a_neg = jnp.pad(a_neg, ((0, kdp - kd),))
        dt_bias = jnp.pad(dt_bias, ((0, kdp - kd),))
        d_skip = jnp.pad(d_skip, ((0, kdp - kd),))
    if lp != l:
        bs = jnp.pad(bs, ((0, 0), (0, lp - l), (0, 0)))
        cs = jnp.pad(cs, ((0, 0), (0, lp - l), (0, 0)))
    params = [p.reshape(1, 1, kdp) for p in (a_neg, dt_bias, d_skip)]

    grid = (bsz, kdp // d_tile, lp // chunk)
    kernel = _make_kernel(k_group, d_inner, d_tile)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d_tile), lambda r, d, l_: (r, l_, d)),
            pl.BlockSpec((1, chunk, d_tile), lambda r, d, l_: (r, l_, d)),
            pl.BlockSpec((1, chunk, k_group), lambda r, d, l_: (r, l_, 0)),
            pl.BlockSpec((1, chunk, k_group), lambda r, d, l_: (r, l_, 0)),
            pl.BlockSpec((1, 1, d_tile), lambda r, d, l_: (0, 0, d)),
            pl.BlockSpec((1, 1, d_tile), lambda r, d, l_: (0, 0, d)),
            pl.BlockSpec((1, 1, d_tile), lambda r, d, l_: (0, 0, d)),
        ],
        out_specs=pl.BlockSpec((1, chunk, d_tile), lambda r, d, l_: (r, l_, d)),
        out_shape=jax.ShapeDtypeStruct((bsz, lp, kdp), out_dtype),
        scratch_shapes=[pltpu.VMEM((1, d_tile), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(u, dts, bs, cs, *params)
    if (lp, kdp) != (l, kd):
        y = y[:, :l, :kd]
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def selective_scan_fused(u, dts, bs, cs, a_neg, dt_bias, d_skip,
                         k_group: int, interpret: bool = False):
    """Fused N=1 selective scan in (B, L, K·D) layout.

    Args (all fp32):
      u, dts:  (B, L, K·D) with channel q = k·D + d
      bs, cs:  (B, L, K)
      a_neg:   (K·D,) — A = -exp(A_logs), flattened k-major
      dt_bias: (K·D,)
      d_skip:  (K·D,)
    Returns y: (B, L, K·D).
    """
    return _fused_fwd_pallas(u, dts, bs, cs, a_neg, dt_bias, d_skip,
                             k_group, interpret=interpret)


def _fused_fwd(u, dts, bs, cs, a_neg, dt_bias, d_skip, k_group, interpret):
    y = _fused_fwd_pallas(u, dts, bs, cs, a_neg, dt_bias, d_skip, k_group,
                          interpret=interpret)
    return y, (u, dts, bs, cs, a_neg, dt_bias, d_skip)


def _fused_bwd(k_group, interpret, res, dy):
    u, dts, bs, cs, a_neg, dt_bias, d_skip = res
    in_dtypes = (u.dtype, dts.dtype, bs.dtype, cs.dtype)
    # All gradient maths in fp32 even for bf16 activations (the counterpart
    # of the reference's custom_bwd fp32 path).
    u = u.astype(jnp.float32)
    dts = dts.astype(jnp.float32)
    bs = bs.astype(jnp.float32)
    cs = cs.astype(jnp.float32)
    dy = dy.astype(jnp.float32)
    impl = "interpret" if interpret else "pallas"
    bsz, l, kd = u.shape
    d = kd // k_group

    def to_lanes(v):  # (B, L, K) → (B, L, KD) broadcast over D
        return jnp.repeat(v, d, axis=-1)

    # Recompute forward intermediates (cheap elementwise; XLA fuses).
    raw = dts + dt_bias[None, None, :]
    dt = jax.nn.softplus(raw)
    sig = jax.nn.sigmoid(raw)
    a = jnp.exp(dt * a_neg[None, None, :])
    bl = to_lanes(bs)
    cl = to_lanes(cs)
    bmat = dt * u * bl

    h = _lr_impl(a, bmat, impl)
    # dh_t = C_t · dy_t, reverse-scanned with a shifted one step
    dh = dy * cl
    a_next = jnp.concatenate([a[:, 1:, :], jnp.ones_like(a[:, :1, :])], axis=1)
    g = jnp.flip(
        _lr_impl(jnp.flip(a_next, axis=1), jnp.flip(dh, axis=1), impl), axis=1
    )
    h_prev = jnp.concatenate([jnp.zeros_like(h[:, :1, :]), h[:, :-1, :]], axis=1)

    da = g * h_prev
    ddt = da * a * a_neg[None, None, :] + g * u * bl
    du = g * dt * bl + dy * d_skip[None, None, :]
    ddts = ddt * sig

    def from_lanes(v):  # (B, L, KD) → (B, L, K): sum over D within direction
        return jnp.sum(v.reshape(bsz, l, k_group, d), axis=-1)

    dbs = from_lanes(g * dt * u)
    dcs = from_lanes(dy * h)
    d_a_neg = jnp.sum(da * a * dt, axis=(0, 1))
    d_bias = jnp.sum(ddts, axis=(0, 1))
    d_dskip = jnp.sum(dy * u, axis=(0, 1))
    return (
        du.astype(in_dtypes[0]),
        ddts.astype(in_dtypes[1]),
        dbs.astype(in_dtypes[2]),
        dcs.astype(in_dtypes[3]),
        d_a_neg,
        d_bias,
        d_dskip,
    )


selective_scan_fused.defvjp(_fused_fwd, _fused_bwd)
