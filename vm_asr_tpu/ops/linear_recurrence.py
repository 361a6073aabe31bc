"""First-order linear recurrence ``h_t = a_t * h_{t-1} + b_t`` on TPU (Pallas).

This primitive is the compute core of the selective scan: the reference
implements it as a CUDA block-scan with a carried running prefix and 2048-wide
sequence chunks (cus/selective_scan_fwd_kernel.cuh:63-171, cub::BlockScan over
(a, b) pairs with composition ``(a2·a1, a2·b1 + b2)``,
selective_scan_common.h:89-112). The TPU design:

- Layout ``(R, L, D)``: independent rows R = B·K (plus channels D on lanes),
  sequence L on sublanes. This is the array's natural tiling — no transpose.
- Grid ``(R, D_tiles, L_chunks)`` with L innermost; a VMEM scratch carries the
  running state ``h`` across L-chunks (the Pallas analogue of the CUDA
  smem-carried prefix).
- Within a chunk, a Hillis–Steele scan over the (decay-product, partial-sum)
  semigroup: log2(CHUNK) fully-unrolled VPU steps, no sequential inner loop,
  numerically stable (products of ``a ∈ (0, 1]`` only underflow benignly).
- The backward pass is the *same* recurrence run on time-reversed inputs
  (adjoint of a linear scan), so one kernel serves both directions — the
  counterpart of the CUDA reverse-scan kernel (reverse_scan.cuh).

All maths in fp32 (the reference forces fp32 into the scan even under AMP,
vmamba.py:842-848).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .selective_scan_ref import linear_recurrence_ref

_INTERPRET = False  # flipped by tests / CPU fallback


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# Two-level in-chunk scan (VERDICT r04 item 5a): sub-chunk size for the
# work-reduced scan, 0 = classic single-level Hillis–Steele. Read ONCE at
# import (like VM_ASR_SCAN_BWD): the kernels are traced once and cached
# under jit, so flip the env vars before importing.
#
# The knob is split between the forward kernel's scan and the backward
# kernel's (in-chunk rescan + reverse adjoint scan): the r5 v5e sweep at
# the production stage-0 shape (8,16384,128) bf16 found different optima
# (scripts/ab_scan_variants.py, artifacts/ab_r5/README.md): forward
# sub=16 measures 0.284 ms vs 0.492 flat (42% faster — the (16,128)
# blocks shift within two native (8,128) VPU sublane groups), while the
# backward's two scans LOSE at every sub tried (sub16 1.27 ms vs 0.909
# flat). Production defaults follow the measurements: fwd 16, bwd 0.
# VM_ASR_SCAN_SUBCHUNK still sets both (the legacy A/B surface); the
# _FWD/_BWD variants override.
import os as _os

_SUBCHUNK = _os.environ.get("VM_ASR_SCAN_SUBCHUNK")
_SUBCHUNK_FWD = int(
    _os.environ.get("VM_ASR_SCAN_SUBCHUNK_FWD", _SUBCHUNK or "16")
)
_SUBCHUNK_BWD = int(
    _os.environ.get("VM_ASR_SCAN_SUBCHUNK_BWD", _SUBCHUNK or "0")
)
_SUBCHUNK = int(_SUBCHUNK or "0")


def _chunk_scan_flat(a: jnp.ndarray, b: jnp.ndarray):
    """Single-level inclusive Hillis–Steele scan along axis 0:
    log2(chunk) full-size (5-op) VPU passes."""
    chunk = a.shape[0]
    p, s = a, b
    offset = 1
    while offset < chunk:
        p_shift = jnp.concatenate(
            [jnp.ones_like(p[:offset]), p[:-offset]], axis=0
        )
        s_shift = jnp.concatenate(
            [jnp.zeros_like(s[:offset]), s[:-offset]], axis=0
        )
        s = s + p * s_shift
        p = p * p_shift
        offset *= 2
    return p, s


def _chunk_scan_two_level(a: jnp.ndarray, b: jnp.ndarray, sub: int):
    """Work-reduced inclusive scan: Hillis–Steele within `sub`-row blocks,
    a tiny block-summary scan, then one broadcast combine.

    The reshape (chunk, D) → (n_sub, sub, D) is row-major-identical (no
    Mosaic relayout): block-local shifts concat along the sublane axis of
    each (sub, D) tile, so no boundary masking is needed. Full-size VPU
    passes drop from log2(chunk) to log2(sub) + ~3 — the Blelloch-style
    work reduction VERDICT r04 item 5 asks to measure, in a layout the VPU
    executes without strided gathers.
    """
    chunk, d = a.shape
    n_sub = chunk // sub
    a3 = a.reshape(n_sub, sub, d)
    b3 = b.reshape(n_sub, sub, d)

    # Phase A: local inclusive scan within every block (log2(sub) passes).
    p, s = a3, b3
    offset = 1
    while offset < sub:
        p_shift = jnp.concatenate(
            [jnp.ones_like(p[:, :offset]), p[:, :-offset]], axis=1
        )
        s_shift = jnp.concatenate(
            [jnp.zeros_like(s[:, :offset]), s[:, :-offset]], axis=1
        )
        s = s + p * s_shift
        p = p * p_shift
        offset *= 2

    # Phase B: inclusive scan of the (n_sub, D) block summaries, then a
    # one-block shift to make it exclusive. 1/sub-sized passes.
    p_blk, s_blk = _chunk_scan_flat(p[:, sub - 1], s[:, sub - 1])
    p_excl = jnp.concatenate(
        [jnp.ones_like(p_blk[:1]), p_blk[:-1]], axis=0
    )[:, None, :]
    s_excl = jnp.concatenate(
        [jnp.zeros_like(s_blk[:1]), s_blk[:-1]], axis=0
    )[:, None, :]

    # Phase C: combine (3 full-size passes).
    s = s + p * s_excl
    p = p * p_excl
    return p.reshape(chunk, d), s.reshape(chunk, d)


def _chunk_scan(a: jnp.ndarray, b: jnp.ndarray, sub: int | None = None):
    """Inclusive scan of (a, b) pairs along axis 0.

    Returns (P, S) where ``P_t = prod_{i<=t} a_i`` and ``S_t`` solves the
    recurrence within the chunk with zero initial state. ``sub`` picks the
    two-level block size (None → the forward knob; callers on the backward
    path pass ``_SUBCHUNK_BWD`` explicitly).
    """
    if sub is None:
        sub = _SUBCHUNK_FWD
    chunk = a.shape[0]
    if sub and chunk > sub and chunk % sub == 0:
        return _chunk_scan_two_level(a, b, sub)
    return _chunk_scan_flat(a, b)


def _lr_kernel(a_ref, b_ref, h_ref, carry):
    l_idx = pl.program_id(2)

    @pl.when(l_idx == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    a = a_ref[0]  # (CHUNK, DT)
    b = b_ref[0]
    p, s = _chunk_scan(a, b)
    h = s + p * carry[0][None, :]
    h_ref[0] = h
    chunk = h.shape[0]
    carry[...] = h[chunk - 1 : chunk, :]  # static slice (Mosaic-lowerable)


@functools.partial(jax.jit, static_argnames=("chunk", "d_tile", "interpret"))
def _lr_pallas(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 512,
               d_tile: int = 128, interpret: bool = False) -> jnp.ndarray:
    """(R, L, D) fp32 → (R, L, D). Pads L to chunk and D to lane multiples."""
    r, l, d = a.shape
    lp = _round_up(l, chunk)
    dp = _round_up(d, 128)
    d_tile = min(d_tile, dp)
    dp = _round_up(dp, d_tile)
    if (lp, dp) != (l, d):
        pad = ((0, 0), (0, lp - l), (0, dp - d))
        # a-padding value is irrelevant for h[:l] (causal); zeros are safe.
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)

    grid = (r, dp // d_tile, lp // chunk)
    h = pl.pallas_call(
        _lr_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, d_tile), lambda r_, d_, l_: (r_, l_, d_)),
            pl.BlockSpec((1, chunk, d_tile), lambda r_, d_, l_: (r_, l_, d_)),
        ],
        out_specs=pl.BlockSpec((1, chunk, d_tile), lambda r_, d_, l_: (r_, l_, d_)),
        out_shape=jax.ShapeDtypeStruct((r, lp, dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, d_tile), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(a, b)
    if (lp, dp) != (l, d):
        h = h[:, :l, :d]
    return h


def _lr_impl(a: jnp.ndarray, b: jnp.ndarray, impl: str) -> jnp.ndarray:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if impl == "ref":
        return linear_recurrence_ref(a, b, axis=-2)
    squeeze = False
    if a.ndim == 2:  # (L, D) convenience
        a, b = a[None], b[None]
        squeeze = True
    elif a.ndim > 3:
        lead = a.shape[:-2]
        a = a.reshape((-1,) + a.shape[-2:])
        b = b.reshape((-1,) + b.shape[-2:])
        h = _lr_pallas(a, b, interpret=(impl == "interpret") or _INTERPRET)
        return h.reshape(lead + h.shape[-2:])
    h = _lr_pallas(a, b, interpret=(impl == "interpret") or _INTERPRET)
    return h[0] if squeeze else h


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def linear_recurrence(a: jnp.ndarray, b: jnp.ndarray, impl: str = "pallas"):
    """h_t = a_t * h_{t-1} + b_t along axis -2 of ``(..., L, D)`` arrays.

    impl: "pallas" (TPU kernel), "interpret" (kernel in interpreter — CPU
    tests), or "ref" (XLA associative scan).
    """
    return _lr_impl(a, b, impl)


def _lr_fwd(a, b, impl):
    h = _lr_impl(a, b, impl)
    return h, (a, h)


def _lr_bwd(impl, res, g):
    a, h = res
    g = g.astype(jnp.float32)
    af = a.astype(jnp.float32)
    # dh_t = g_t + a_{t+1} · dh_{t+1}  — same recurrence, time-reversed.
    a_next = jnp.concatenate(
        [af[..., 1:, :], jnp.ones_like(af[..., :1, :])], axis=-2
    )
    dh = jnp.flip(
        _lr_impl(jnp.flip(a_next, axis=-2), jnp.flip(g, axis=-2), impl), axis=-2
    )
    h_prev = jnp.concatenate(
        [jnp.zeros_like(h[..., :1, :]), h[..., :-1, :]], axis=-2
    )
    da = (dh * h_prev).astype(a.dtype)
    return da, dh.astype(a.dtype)


linear_recurrence.defvjp(_lr_fwd, _lr_bwd)
