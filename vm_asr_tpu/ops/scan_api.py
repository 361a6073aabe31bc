"""Production selective-scan API in TPU-native layout.

The SS2D module feeds ``(B, K, L, D)`` arrays (sequence on sublanes, channels
on lanes). This wrapper does the elementwise prologue/epilogue in XLA (which
fuses it with neighbouring ops) and routes the recurrence itself through the
Pallas kernel:

    dt  = softplus(dts + dt_bias)                 (fp32)
    a_n = exp(dt * A_n);  b_n = dt * B_n * u
    h_n = linear_recurrence(a_n, b_n)
    y   = Σ_n C_n * h_n + D_skip * u

The reference equivalent is SS2D.forward_corev2 + the CUDA scan
(vmamba.py:1377-1495, cus/selective_scan.cpp:157-236). VM-ASR's production
configs use d_state N=1 (config.py:100), which makes the N-loop a single
iteration — the counterpart of the reference's `ndstate` N=1 specialisation
(cusndstate/selective_scan_ndstate.cpp:184).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .linear_recurrence import linear_recurrence


def default_impl() -> str:
    """Pick the kernel implementation for the current backend."""
    platform = jax.default_backend()
    return "pallas" if platform not in ("cpu",) else "ref"


def selective_scan(
    u: jnp.ndarray,         # (B, K, L, D) — post-conv activations per direction
    dts: jnp.ndarray,       # (B, K, L, D) — raw Δ before bias/softplus
    A: jnp.ndarray,         # (K, D, N)    — negative decay rates
    Bs: jnp.ndarray,        # (B, K, L, N)
    Cs: jnp.ndarray,        # (B, K, L, N)
    D_skip: Optional[jnp.ndarray] = None,   # (K, D)
    dt_bias: Optional[jnp.ndarray] = None,  # (K, D)
    delta_softplus: bool = True,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Returns y: (B, K, L, D) in the input dtype; scan maths in fp32."""
    impl = impl or default_impl()
    in_dtype = u.dtype
    b, k, l, d = u.shape
    n = A.shape[-1]

    uf = u.astype(jnp.float32)
    dt = dts.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)[None, :, None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)

    Af = A.astype(jnp.float32)
    dtu = dt * uf
    y = jnp.zeros_like(uf)
    for i in range(n):  # N is tiny (production: 1); unrolled statically
        a = jnp.exp(dt * Af[None, :, None, :, i])
        bi = dtu * Bs[..., i : i + 1].astype(jnp.float32)
        h = linear_recurrence(
            a.reshape(b * k, l, d), bi.reshape(b * k, l, d), impl
        ).reshape(b, k, l, d)
        y = y + h * Cs[..., i : i + 1].astype(jnp.float32)

    if D_skip is not None:
        y = y + D_skip.astype(jnp.float32)[None, :, None, :] * uf
    return y.astype(in_dtype)
