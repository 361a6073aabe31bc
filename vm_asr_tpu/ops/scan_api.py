"""Production selective-scan API in TPU-native layout.

The SS2D module feeds ``(B, L, K, D)`` arrays: sequence on sublanes, the K=4
scan directions and channels together on lanes (K·D is a lane multiple at
every stage of the production model). This wrapper routes the N=1 production
case through the fully-fused Pallas kernel; the general-N path does the
elementwise prologue/epilogue in XLA around the linear-recurrence kernel:

    dt  = softplus(dts + dt_bias)                 (fp32)
    a_n = exp(dt * A_n);  b_n = dt * B_n * u
    h_n = linear_recurrence(a_n, b_n)
    y   = Σ_n C_n * h_n + D_skip * u

The reference equivalent is SS2D.forward_corev2 + the CUDA scan
(vmamba.py:1377-1495, cus/selective_scan.cpp:157-236). VM-ASR's production
configs use d_state N=1 (config.py:100) — the counterpart of the reference's
`ndstate` N=1 specialisation (cusndstate/selective_scan_ndstate.cpp:184).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from .linear_recurrence import linear_recurrence
from .selective_scan_fused import selective_scan_fused


def default_impl() -> str:
    """Pick the kernel implementation for the current backend."""
    platform = jax.default_backend()
    return "pallas" if platform not in ("cpu",) else "ref"


# force_fp32 scan-boundary semantics (reference vmamba.py:842-848: the v2/v5
# forward types cast the scan's activation inputs to fp32 even under AMP).
# Off by default: the kernel always ACCUMULATES in fp32, bf16 IO halves the
# scan's HBM traffic, and the bf16-IO backward error (≤6.5e-4 rel at
# L=16384, CHECKS grid) is ~50× inside the reference's own bf16 kernel
# tolerance (test_selective_scan.py:586-588: rtol 3e-2). Flip it to
# reproduce the reference's numerics exactly at the scan boundary.
# Read at TRACE time — set before the first jitted call (env
# VM_ASR_SCAN_FP32_IO=1 or set_scan_fp32_io(True), which the model factory
# calls from MODEL.VSSM.SCAN_FP32_IO).
_SCAN_FP32_IO = os.environ.get("VM_ASR_SCAN_FP32_IO", "0") == "1"


def set_scan_fp32_io(on: bool) -> None:
    global _SCAN_FP32_IO
    _SCAN_FP32_IO = bool(on)


def selective_scan(
    u: jnp.ndarray,         # (B, L, K, D) — post-conv activations per direction
    dts: jnp.ndarray,       # (B, L, K, D) — raw Δ before bias/softplus
    A: jnp.ndarray,         # (K, D, N)    — negative decay rates
    Bs: jnp.ndarray,        # (B, L, K, N)
    Cs: jnp.ndarray,        # (B, L, K, N)
    D_skip: Optional[jnp.ndarray] = None,   # (K, D)
    dt_bias: Optional[jnp.ndarray] = None,  # (K, D)
    delta_softplus: bool = True,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Returns y: (B, L, K, D) in the input dtype; scan maths in fp32.

    With an active ``mp`` mesh (parallel.set_activation_mesh), the K scan
    directions are split over ``mp`` via shard_map — each device scans its
    directions; ``cross_merge``'s gather afterwards rides ICI.
    """
    from ..parallel import mp_mesh

    if _SCAN_FP32_IO:
        # The scan then returns fp32 (in_dtype below sees fp32); SS2D casts
        # back to the compute dtype after out_norm, like the reference.
        u, dts, Bs, Cs = (t.astype(jnp.float32) for t in (u, dts, Bs, Cs))
    mesh = mp_mesh()
    b, _, k, _ = u.shape
    if (
        mesh is not None
        and D_skip is not None
        and dt_bias is not None
        and k % mesh.shape["mp"] == 0
        and b % mesh.shape["dp"] == 0
    ):
        from jax.sharding import PartitionSpec as P

        seq = P("dp", None, "mp", None)
        par = P("mp", None)
        # The N=1 fused-kernel eligibility must reflect the *global* lane
        # width, not the per-shard one — otherwise sharding a mid-size stage
        # silently downgrades every shard to the XLA scan.
        d_inner = u.shape[-1]
        local = functools.partial(
            _selective_scan_local, delta_softplus=delta_softplus, impl=impl,
            fused_lane_ok=(k * d_inner >= 128),
        )
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(seq, seq, P("mp", None, None), seq, seq, par, par),
            out_specs=seq,
            check_vma=False,
        )(u, dts, A, Bs, Cs, D_skip, dt_bias)
    return _selective_scan_local(
        u, dts, A, Bs, Cs, D_skip, dt_bias,
        delta_softplus=delta_softplus, impl=impl,
    )


def _selective_scan_local(
    u, dts, A, Bs, Cs, D_skip=None, dt_bias=None,
    delta_softplus: bool = True, impl: Optional[str] = None,
    fused_lane_ok: Optional[bool] = None,
):
    impl = impl or default_impl()
    in_dtype = u.dtype
    b, l, k, d = u.shape
    n = A.shape[-1]

    # N=1 production fast path: the fully-fused Pallas kernel
    # (prologue + scan + epilogue in one HBM pass).
    if (
        n == 1
        and impl in ("pallas", "interpret")
        and delta_softplus
        and D_skip is not None
        and dt_bias is not None
        # Tiny channel counts (e.g. the output head's K·D = 8) would pad the
        # lane axis 16×; XLA's associative scan handles those better. Under
        # the mp shard_map the caller passes the global-geometry verdict.
        and (
            fused_lane_ok
            if fused_lane_ok is not None
            else (k * d >= 128 or impl == "interpret")
        )
    ):
        # Activations keep their dtype (bf16 inputs halve HBM traffic); the
        # kernel upcasts in-register and scans in fp32.
        y = selective_scan_fused(
            u.reshape(b, l, k * d),
            dts.reshape(b, l, k * d),
            Bs[..., 0],
            Cs[..., 0],
            A[..., 0].astype(jnp.float32).reshape(k * d),
            dt_bias.astype(jnp.float32).reshape(k * d),
            D_skip.astype(jnp.float32).reshape(k * d),
            k,
            impl == "interpret",
        )
        return y.reshape(b, l, k, d).astype(in_dtype)

    uf = u.astype(jnp.float32)
    dt = dts.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)[None, None, :, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)

    Af = A.astype(jnp.float32)
    dtu = dt * uf
    y = jnp.zeros_like(uf)
    for i in range(n):  # N is tiny (production: 1); unrolled statically
        a = jnp.exp(dt * Af[None, None, :, :, i])
        bi = dtu * Bs[..., i : i + 1].astype(jnp.float32)
        h = linear_recurrence(
            a.reshape(b, l, k * d), bi.reshape(b, l, k * d), impl
        ).reshape(b, l, k, d)
        y = y + h * Cs[..., i : i + 1].astype(jnp.float32)

    if D_skip is not None:
        y = y + D_skip.astype(jnp.float32)[None, None, :, :] * uf
    return y.astype(in_dtype)
