"""Pure-jnp selective scan: the mathematical specification.

This is the golden reference the Pallas kernels are tested against, and a
fully functional fallback (CPU, interpret mode, odd shapes). It mirrors the
semantics of the reference CUDA extension
(kernels/selective_scan/csrc/selective_scan/cus/selective_scan.cpp:157-236 and
the chunked math documented in kernels/selective_scan/README.md:10-91):

    dt_t  = softplus(delta_t + delta_bias)            [optional]
    h_t   = exp(dt_t · A) * h_{t-1} + dt_t · B_t · u_t
    y_t   = C_t · h_t + D · u_t

Instead of a sequential loop, the recurrence is expressed as an associative
scan over (decay, increment) pairs with composition
``(a2, b2) ∘ (a1, b1) = (a2·a1, a2·b1 + b2)`` — XLA parallelises this
log-depth on TPU (the counterpart of the CUDA cub::BlockScan with the same
composition op, selective_scan_common.h:89-112).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _combine(carry, elem):
    a1, b1 = carry
    a2, b2 = elem
    return a2 * a1, a2 * b1 + b2


def linear_recurrence_ref(a: jnp.ndarray, b: jnp.ndarray, axis: int = -2
                          ) -> jnp.ndarray:
    """h_t = a_t * h_{t-1} + b_t (h_{-1} = 0) along ``axis`` via associative scan."""
    _, h = jax.lax.associative_scan(_combine, (a, b), axis=axis)
    return h


def selective_scan_ref(
    u: jnp.ndarray,            # (B, G*D, L)
    delta: jnp.ndarray,        # (B, G*D, L)
    A: jnp.ndarray,            # (G*D, N)
    Bmat: jnp.ndarray,         # (B, G, N, L)
    Cmat: jnp.ndarray,         # (B, G, N, L)
    D: Optional[jnp.ndarray] = None,       # (G*D,)
    delta_bias: Optional[jnp.ndarray] = None,  # (G*D,)
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """Reference-shaped selective scan (layouts of reference vmamba.py:237-245).

    All accumulation in fp32 regardless of input dtype (the CUDA kernel does
    the same for fp16/bf16 inputs); output cast back to the input dtype.
    """
    inp_dtype = u.dtype
    b, gd, l = u.shape
    _, g, n, _ = Bmat.shape
    d = gd // g

    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        dt = jax.nn.softplus(dt)

    uf = u.astype(jnp.float32).reshape(b, g, d, l)
    dt = dt.reshape(b, g, d, l)
    Af = A.astype(jnp.float32).reshape(g, d, n)
    Bf = Bmat.astype(jnp.float32)  # (B, G, N, L)
    Cf = Cmat.astype(jnp.float32)

    # decay a: (B, G, D, L, N); increment: dt*u*B broadcast over N
    a = jnp.exp(dt[..., None] * Af[None, :, :, None, :])
    inc = (dt * uf)[..., None] * jnp.swapaxes(Bf, -1, -2)[:, :, None, :, :]
    h = linear_recurrence_ref(a, inc, axis=-2)  # (B, G, D, L, N)

    y = jnp.sum(h * jnp.swapaxes(Cf, -1, -2)[:, :, None, :, :], axis=-1)
    if D is not None:
        y = y + D.astype(jnp.float32).reshape(1, g, d, 1) * uf
    y = y.reshape(b, gd, l).astype(inp_dtype)
    if return_last_state:
        return y, h[..., -1, :].reshape(b, gd, n)
    return y


def selective_scan_seq(
    u, delta, A, Bmat, Cmat, D=None, delta_bias=None, delta_softplus=False
) -> jnp.ndarray:
    """Strictly sequential lax.scan version — slow, used only to validate the
    associative formulation in unit tests."""
    b, gd, l = u.shape
    _, g, n, _ = Bmat.shape
    d = gd // g
    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    uf = u.astype(jnp.float32).reshape(b, g, d, l)
    dt = dt.reshape(b, g, d, l)
    Af = A.astype(jnp.float32).reshape(g, d, n)

    def step(h, t):
        dt_t = dt[..., t]                      # (B,G,D)
        a_t = jnp.exp(dt_t[..., None] * Af[None])        # (B,G,D,N)
        b_t = (dt_t * uf[..., t])[..., None] * Bmat[..., t][:, :, None, :]
        h = a_t * h + b_t
        y_t = jnp.sum(h * Cmat[..., t][:, :, None, :], axis=-1)
        return h, y_t

    h0 = jnp.zeros((b, g, d, n), jnp.float32)
    _, ys = jax.lax.scan(step, h0, jnp.arange(l))
    y = jnp.moveaxis(ys, 0, -1)  # (B,G,D,L)
    if D is not None:
        y = y + D.astype(jnp.float32).reshape(1, g, d, 1) * uf
    return y.reshape(b, gd, l).astype(u.dtype)
