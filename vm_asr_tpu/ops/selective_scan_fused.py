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

The backward is a second fully-fused kernel (the Mosaic counterpart of
cus/selective_scan_bwd_kernel.cuh + reverse_scan.cuh): the forward also
emits per-L-chunk state checkpoints (like the CUDA kernel's
``x[b,d,chunk,2N]``, cus/selective_scan.cpp:217-220); the backward walks
chunks in REVERSE (via the BlockSpec index map), recomputes h within each
chunk from its checkpoint with the same in-chunk scan, runs the adjoint
recurrence ``g_t = C_t·dy_t + a_{t+1}·g_{t+1}`` as a shift-reversed
Hillis–Steele scan with a carried boundary term, and emits all seven
gradients in-register — du/dΔ as full arrays, dB/dC via the one-hot
transpose reduction on the MXU, dA/dΔbias/dD accumulated in VMEM scratch
across the grid. One HBM read of (u, Δ, dy) + one write of (du, dΔ)
replaces the old replay-through-XLA path's ~10 array passes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear_recurrence import _SUBCHUNK_BWD, _chunk_scan, _lr_impl


# Backward-path selector, read ONCE at import: the custom_vjp backward is
# traced once and cached under jit, so flipping the env var mid-process
# would be silently ignored — set VM_ASR_SCAN_BWD before importing.
_SCAN_BWD_MODE = os.environ.get("VM_ASR_SCAN_BWD", "fused")


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _direction_onehot(k_group: int, d_inner: int, d_idx, d_tile: int):
    """(K, DT) one-hot: column j (channel q = d_idx·DT + j) selects its
    direction k = q // d_inner; all-zero column for padded lanes."""
    lane_q = d_idx * d_tile + jax.lax.broadcasted_iota(
        jnp.int32, (1, d_tile), 1
    )
    lane_k = lane_q // d_inner  # (1, DT)
    rows_k = jax.lax.broadcasted_iota(jnp.int32, (k_group, 1), 0)
    return (rows_k == lane_k).astype(jnp.float32)  # (K, DT)


def _expand_dirs(v_ref, onehot):
    """(CHUNK, K) direction values → (CHUNK, DT) lanes, exactly (fp32 MXU)."""
    return jnp.dot(v_ref[0].astype(jnp.float32), onehot,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _make_kernel(k_group: int, d_inner: int, d_tile: int):
    """Kernel for one (batch row, channel tile, L chunk) block."""

    def kernel(u_ref, dt_ref, b_ref, c_ref, a_ref, bias_ref, dskip_ref,
               y_ref, ckpt_ref, carry):
        l_idx = pl.program_id(2)
        d_idx = pl.program_id(1)

        @pl.when(l_idx == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)

        # Chunk-entry state checkpoint for the fused backward (the CUDA
        # kernel's x[b,d,chunk,2N], cus/selective_scan.cpp:217-220). The
        # block spans all n_l chunk rows (Mosaic requires sublane-aligned or
        # full blocks) and stays VMEM-resident across the L loop; each step
        # fills its own row — via a blend, not a dynamic-sublane store
        # (Mosaic lowers dynamic sublane indexing through a slow path).
        n_l = pl.num_programs(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (n_l, 1), 0)
        ckpt_ref[0] = jnp.where(row == l_idx, carry[...], ckpt_ref[0])

        # Inputs may be bf16 (the model's compute dtype); all scan maths is
        # fp32 in-register (reference force_fp32, vmamba.py:842-848).
        u = u_ref[0].astype(jnp.float32)  # (CHUNK, DT)
        dt = jax.nn.softplus(dt_ref[0].astype(jnp.float32) + bias_ref[0])
        # Select each lane's direction value: lane j in this tile is channel
        # q = d_idx*DT + j with direction k = q // d_inner. One-hot matmul
        # expands (CHUNK, K) → (CHUNK, DT); HIGHEST precision keeps the fp32
        # B/C values exact (default MXU precision rounds through bf16).
        onehot = _direction_onehot(k_group, d_inner, d_idx, d_tile)
        bvec = _expand_dirs(b_ref, onehot)
        cvec = _expand_dirs(c_ref, onehot)

        a = jnp.exp(dt * a_ref[0])  # a_ref holds A = -exp(A_logs)
        b = dt * u * bvec
        p, s = _chunk_scan(a, b)
        h = s + p * carry[0][None, :]
        chunk = h.shape[0]
        carry[...] = h[chunk - 1 : chunk, :]
        y_ref[0] = (cvec * h + dskip_ref[0] * u).astype(y_ref.dtype)

    return kernel


def _default_chunk(l: int) -> int:
    """Measured on v5e (ROADMAP): 256 wins at long L (more grid steps to
    pipeline against the carry dependency), 512 at shorter L. Forward and
    backward must agree — the checkpoint layout is per-chunk."""
    return 256 if l >= 8192 else 512


@functools.partial(
    jax.jit, static_argnames=("k_group", "chunk", "d_tile", "interpret")
)
def _fused_fwd_pallas(u, dts, bs, cs, a_neg, dt_bias, d_skip, k_group,
                      chunk=None, d_tile=128, interpret=False):
    """u/dts: (B, L, KD) fp32 or bf16; bs/cs: (B, L, K); params: (KD,) fp32.

    Output dtype follows ``u`` (scan maths itself is always fp32)."""
    bsz, l, kd = u.shape
    chunk = chunk or _default_chunk(l)
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

    n_l = lp // chunk
    grid = (bsz, kdp // d_tile, n_l)
    kernel = _make_kernel(k_group, d_inner, d_tile)
    y, ckpt = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, chunk, d_tile), lambda r, d, l_: (r, l_, d)),
            pl.BlockSpec((1, n_l, d_tile), lambda r, d, l_: (r, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, kdp), out_dtype),
            jax.ShapeDtypeStruct((bsz, n_l, kdp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, d_tile), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(u, dts, bs, cs, *params)
    if (lp, kdp) != (l, kd):
        y = y[:, :l, :kd]
    return y, ckpt


def _chunk_scan_rev_flat(a_next: jnp.ndarray, b: jnp.ndarray):
    """Single-level inclusive *reverse* Hillis–Steele scan along axis 0.

    Solves ``g_t = b_t + a_next_t · g_{t+1}`` (t descending) with zero final
    state: returns (P, S) where ``P_t = prod_{r>=t} a_next_r`` (the factor an
    incoming boundary carry picks up) and ``S_t`` the zero-init solution.
    The Mosaic counterpart of the CUDA BlockReverseScan (reverse_scan.cuh).
    """
    chunk = a_next.shape[0]
    p, s = a_next, b
    offset = 1
    while offset < chunk:
        p_shift = jnp.concatenate(
            [p[offset:], jnp.ones_like(p[:offset])], axis=0
        )
        s_shift = jnp.concatenate(
            [s[offset:], jnp.zeros_like(s[:offset])], axis=0
        )
        s = s + p * s_shift
        p = p * p_shift
        offset *= 2
    return p, s


def _chunk_scan_rev_two_level(a_next: jnp.ndarray, b: jnp.ndarray, sub: int):
    """Two-level reverse scan: the mirror of
    linear_recurrence._chunk_scan_two_level (see its docstring) with the
    block-local shifts and the summary scan running tail→head."""
    chunk, d = a_next.shape
    n_sub = chunk // sub
    a3 = a_next.reshape(n_sub, sub, d)
    b3 = b.reshape(n_sub, sub, d)

    p, s = a3, b3
    offset = 1
    while offset < sub:
        p_shift = jnp.concatenate(
            [p[:, offset:], jnp.ones_like(p[:, :offset])], axis=1
        )
        s_shift = jnp.concatenate(
            [s[:, offset:], jnp.zeros_like(s[:, :offset])], axis=1
        )
        s = s + p * s_shift
        p = p * p_shift
        offset *= 2

    # Block summaries sit at each block's HEAD for a reverse scan.
    p_blk, s_blk = _chunk_scan_rev_flat(p[:, 0], s[:, 0])
    p_excl = jnp.concatenate(
        [p_blk[1:], jnp.ones_like(p_blk[:1])], axis=0
    )[:, None, :]
    s_excl = jnp.concatenate(
        [s_blk[1:], jnp.zeros_like(s_blk[:1])], axis=0
    )[:, None, :]

    s = s + p * s_excl
    p = p * p_excl
    return p.reshape(chunk, d), s.reshape(chunk, d)


def _chunk_scan_rev(a_next: jnp.ndarray, b: jnp.ndarray):
    chunk = a_next.shape[0]
    if (_SUBCHUNK_BWD and chunk > _SUBCHUNK_BWD
            and chunk % _SUBCHUNK_BWD == 0):
        return _chunk_scan_rev_two_level(a_next, b, _SUBCHUNK_BWD)
    return _chunk_scan_rev_flat(a_next, b)


def _make_bwd_kernel(k_group: int, d_inner: int, d_tile: int, n_d: int):
    """Backward kernel: grid (row, L-chunk REVERSED, channel tile).

    d is innermost so the per-(row, chunk) dB/dC output block stays resident
    in VMEM while all channel tiles accumulate into it; the reverse-L
    traversal is purely in the BlockSpec index maps.
    """

    def kernel(u_ref, dt_ref, b_ref, c_ref, dy_ref, ckpt_ref,
               a_ref, bias_ref, dskip_ref,
               du_ref, ddt_ref, dbs_ref, dcs_ref, dA_ref, dbias_ref,
               ddsk_ref, carry_g, acc_a, acc_bias, acc_dsk):
        r_idx = pl.program_id(0)
        li = pl.program_id(1)  # 0 = last L chunk (reverse traversal)
        d_idx = pl.program_id(2)

        @pl.when(li == 0)  # new row: reset the adjoint boundary carry
        def _():
            carry_g[d_idx, :] = jnp.zeros_like(carry_g[d_idx, :])

        @pl.when(jnp.logical_and(r_idx == 0, li == 0))
        def _():
            acc_a[d_idx, :] = jnp.zeros_like(acc_a[d_idx, :])
            acc_bias[d_idx, :] = jnp.zeros_like(acc_bias[d_idx, :])
            acc_dsk[d_idx, :] = jnp.zeros_like(acc_dsk[d_idx, :])

        u = u_ref[0].astype(jnp.float32)  # (CHUNK, DT)
        raw = dt_ref[0].astype(jnp.float32) + bias_ref[0]
        dt = jax.nn.softplus(raw)
        sig = jax.nn.sigmoid(raw)
        dy = dy_ref[0].astype(jnp.float32)
        onehot = _direction_onehot(k_group, d_inner, d_idx, d_tile)
        bvec = _expand_dirs(b_ref, onehot)
        cvec = _expand_dirs(c_ref, onehot)

        a = jnp.exp(dt * a_ref[0])
        # Recompute h within the chunk from its entry checkpoint (the ckpt
        # block spans all n_l rows; one-hot reduce instead of a dynamic
        # sublane read — Mosaic's dynamic-index path is slow). The rescan
        # follows the BACKWARD subchunk knob: it executes inside the bwd
        # kernel, whose optimum differs from the fwd kernel's (ROADMAP r5).
        p, s = _chunk_scan(a, dt * u * bvec, sub=_SUBCHUNK_BWD)
        n_l = pl.num_programs(1)
        row = jax.lax.broadcasted_iota(jnp.int32, (n_l, 1), 0)
        h0 = jnp.sum(
            jnp.where(row == n_l - 1 - li, ckpt_ref[0], 0.0),
            axis=0, keepdims=True,
        )  # (1, DT)
        h = s + p * h0
        chunk = h.shape[0]
        h_prev = jnp.concatenate([h0, h[: chunk - 1]], axis=0)

        # Adjoint recurrence g_t = C_t·dy_t + a_{t+1}·g_{t+1}; the carried
        # boundary term is a_first·g_first of the (later-in-time) chunk
        # processed on the previous grid step.
        dh = cvec * dy
        a_next = jnp.concatenate(
            [a[1:], jnp.ones_like(a[:1])], axis=0
        )
        pr, sr = _chunk_scan_rev(a_next, dh)
        g = sr + pr * carry_g[d_idx, :][None, :]
        carry_g[d_idx, :] = (a[:1] * g[:1])[0]

        da = g * h_prev  # ∂L/∂a elementwise
        du_ref[0] = (g * dt * bvec + dy * dskip_ref[0]).astype(du_ref.dtype)
        ddts = (da * a * a_ref[0] + g * u * bvec) * sig
        ddt_ref[0] = ddts.astype(ddt_ref.dtype)

        # Per-direction reductions over this tile's lanes (MXU transpose).
        dbs_part = jnp.dot(g * dt * u, onehot.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        dcs_part = jnp.dot(dy * h, onehot.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        @pl.when(d_idx == 0)
        def _():
            dbs_ref[0] = dbs_part.astype(dbs_ref.dtype)
            dcs_ref[0] = dcs_part.astype(dcs_ref.dtype)

        @pl.when(d_idx > 0)
        def _():
            dbs_ref[0] += dbs_part.astype(dbs_ref.dtype)
            dcs_ref[0] += dcs_part.astype(dcs_ref.dtype)

        # Per-channel parameter grads, accumulated across the whole grid.
        acc_a[d_idx, :] += jnp.sum(da * a * dt, axis=0)
        acc_bias[d_idx, :] += jnp.sum(ddts, axis=0)
        acc_dsk[d_idx, :] += jnp.sum(dy * u, axis=0)
        dA_ref[0] = acc_a[d_idx, :]
        dbias_ref[0] = acc_bias[d_idx, :]
        ddsk_ref[0] = acc_dsk[d_idx, :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k_group", "chunk", "d_tile", "interpret")
)
def _fused_bwd_pallas(u, dts, bs, cs, dy, ckpt, a_neg, dt_bias, d_skip,
                      k_group, chunk=None, d_tile=128, interpret=False):
    bsz, l, kd = u.shape
    chunk = chunk or _default_chunk(l)
    d_inner = kd // k_group
    lp = _round_up(l, chunk)
    kdp = _round_up(kd, 128)
    d_tile = min(d_tile, kdp)
    kdp = _round_up(kdp, d_tile)
    if (lp, kdp) != (l, kd):
        pad3 = ((0, 0), (0, lp - l), (0, kdp - kd))
        u = jnp.pad(u, pad3)
        dts = jnp.pad(dts, pad3)
        dy = jnp.pad(dy, pad3)
        a_neg = jnp.pad(a_neg, ((0, kdp - kd),))
        dt_bias = jnp.pad(dt_bias, ((0, kdp - kd),))
        d_skip = jnp.pad(d_skip, ((0, kdp - kd),))
    if lp != l:
        bs = jnp.pad(bs, ((0, 0), (0, lp - l), (0, 0)))
        cs = jnp.pad(cs, ((0, 0), (0, lp - l), (0, 0)))
    params = [p.reshape(1, 1, kdp) for p in (a_neg, dt_bias, d_skip)]

    n_l = lp // chunk
    n_d = kdp // d_tile
    assert ckpt.shape == (bsz, n_l, kdp), (ckpt.shape, (bsz, n_l, kdp))
    grid = (bsz, n_l, n_d)
    rev = lambda li: n_l - 1 - li  # noqa: E731 — reverse chunk traversal

    kernel = _make_bwd_kernel(k_group, d_inner, d_tile, n_d)
    du, ddts, dbs, dcs, d_a, d_bias, d_dsk = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d_tile), lambda r, li, d: (r, rev(li), d)),
            pl.BlockSpec((1, chunk, d_tile), lambda r, li, d: (r, rev(li), d)),
            pl.BlockSpec((1, chunk, k_group), lambda r, li, d: (r, rev(li), 0)),
            pl.BlockSpec((1, chunk, k_group), lambda r, li, d: (r, rev(li), 0)),
            pl.BlockSpec((1, chunk, d_tile), lambda r, li, d: (r, rev(li), d)),
            pl.BlockSpec((1, n_l, d_tile), lambda r, li, d: (r, 0, d)),
            pl.BlockSpec((1, 1, d_tile), lambda r, li, d: (0, 0, d)),
            pl.BlockSpec((1, 1, d_tile), lambda r, li, d: (0, 0, d)),
            pl.BlockSpec((1, 1, d_tile), lambda r, li, d: (0, 0, d)),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, d_tile), lambda r, li, d: (r, rev(li), d)),
            pl.BlockSpec((1, chunk, d_tile), lambda r, li, d: (r, rev(li), d)),
            pl.BlockSpec((1, chunk, k_group), lambda r, li, d: (r, rev(li), 0)),
            pl.BlockSpec((1, chunk, k_group), lambda r, li, d: (r, rev(li), 0)),
            pl.BlockSpec((1, d_tile), lambda r, li, d: (0, d)),
            pl.BlockSpec((1, d_tile), lambda r, li, d: (0, d)),
            pl.BlockSpec((1, d_tile), lambda r, li, d: (0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, kdp), u.dtype),
            jax.ShapeDtypeStruct((bsz, lp, kdp), dts.dtype),
            jax.ShapeDtypeStruct((bsz, lp, k_group), jnp.float32),
            jax.ShapeDtypeStruct((bsz, lp, k_group), jnp.float32),
            jax.ShapeDtypeStruct((1, kdp), jnp.float32),
            jax.ShapeDtypeStruct((1, kdp), jnp.float32),
            jax.ShapeDtypeStruct((1, kdp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_d, d_tile), jnp.float32),
            pltpu.VMEM((n_d, d_tile), jnp.float32),
            pltpu.VMEM((n_d, d_tile), jnp.float32),
            pltpu.VMEM((n_d, d_tile), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(u, dts, bs, cs, dy, ckpt, *params)

    if (lp, kdp) != (l, kd):
        du = du[:, :l, :kd]
        ddts = ddts[:, :l, :kd]
    if lp != l:
        dbs = dbs[:, :l, :]
        dcs = dcs[:, :l, :]
    return du, ddts, dbs, dcs, d_a[0, :kd], d_bias[0, :kd], d_dsk[0, :kd]


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
    y, _ = _fused_fwd_pallas(u, dts, bs, cs, a_neg, dt_bias, d_skip,
                             k_group, interpret=interpret)
    return y


def _fused_fwd(u, dts, bs, cs, a_neg, dt_bias, d_skip, k_group, interpret):
    y, ckpt = _fused_fwd_pallas(u, dts, bs, cs, a_neg, dt_bias, d_skip,
                                k_group, interpret=interpret)
    return y, (u, dts, bs, cs, a_neg, dt_bias, d_skip, ckpt)


def _fused_bwd(k_group, interpret, res, dy):
    if _SCAN_BWD_MODE == "xla":
        # Debug/benchmark escape hatch to the replay-through-XLA backward.
        return _fused_bwd_xla(k_group, interpret, res, dy)
    u, dts, bs, cs, a_neg, dt_bias, d_skip, ckpt = res
    in_dtypes = (u.dtype, dts.dtype, bs.dtype, cs.dtype)
    du, ddts, dbs, dcs, d_a, d_bias, d_dsk = _fused_bwd_pallas(
        u, dts, bs.astype(jnp.float32), cs.astype(jnp.float32),
        dy, ckpt,
        a_neg.astype(jnp.float32), dt_bias.astype(jnp.float32),
        d_skip.astype(jnp.float32), k_group, interpret=interpret,
    )
    return (
        du.astype(in_dtypes[0]),
        ddts.astype(in_dtypes[1]),
        dbs.astype(in_dtypes[2]),
        dcs.astype(in_dtypes[3]),
        d_a,
        d_bias,
        d_dsk,
    )


def _fused_bwd_xla(k_group, interpret, res, dy):
    """Replay-through-XLA backward (pre-fused-kernel path). Kept as the
    reference implementation the fused backward kernel is tested against."""
    u, dts, bs, cs, a_neg, dt_bias, d_skip, _ckpt = res
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
