"""Sequence-sharded selective scan over ICI (multi-chip L decomposition).

The kernels already chunk L with a carried (decay-product, state) prefix
*within* a chip (linear_recurrence.py, selective_scan_fused.py — the
analogue of the CUDA kernel's smem prefix carry). This module lifts that
same decomposition ACROSS chips: each device scans its L-shard locally
with zero initial state, the per-shard summaries are combined with one
``all_gather`` over the mesh axis, and a per-position correction applies
the incoming boundary state:

    h_t(global) = h_t(local) + (Π_{r≤t in shard} a_r) · h_offset(shard)
    h_offset(m) = Σ_{s<m} h_final(s) · Π_{s<r<m} P(r),   P(r) = Π a over shard r

This is the scaling-book recipe (decompose → local compute → small
collective → apply): the only cross-chip traffic is the (n_shards, B, K·D)
summary exchange, which rides ICI. Unnecessary for VM-ASR's production
L ≤ 64k on one chip — it exists for long-audio inference and as the
building block for models whose sequences outgrow a chip. Differentiable
end-to-end: the per-shard scan carries its own custom VJP (the FUSED Pallas
kernel on TPU via scan_api's routing; the LR kernel / XLA associative scan
otherwise), and the boundary summaries + correction are closed-form XLA ops
(see _local_scan_with_summary).

N = 1 (the production d_state) only; general N falls back to the caller.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _local_scan_with_summary(u, dts, A, Bs, Cs, D_skip, dt_bias, impl):
    """One shard's scan (zero init) + (final state, log-decay cumsum).

    u/dts: (B, L, K, D); Bs/Cs: (B, L, K, 1); A/D_skip/dt_bias: (K, D[,1]).
    Returns y_local, h_fin, logcum where logcum_t = Σ_{r≤t} Δ_r·A.

    The heavy scan runs through ``_selective_scan_local`` — which routes the
    production N=1 geometry onto the FUSED Pallas kernel (its custom VJP
    included) — rather than the unfused exp/LR decomposition. The boundary
    summaries the cross-chip exchange needs are then computed with cheap
    closed forms instead of threading carries through the kernel:

        h_fin = Σ_t exp(logp − logcum_t) · Δ_t B_t u_t      (logp = logcum_L)

    where every exponent is Σ_{r>t} Δ_r·A ≤ 0 — a numerically stable
    weighted reduction, fully XLA-fusable, and differentiable through
    standard ops. This keeps the kernel's VJP single-purpose (the scan) and
    lets XLA fuse the O(L) elementwise summary work into the surrounding
    pass — the TPU analogue of the CUDA chunk-prefix exchange
    (cus/selective_scan_fwd_kernel.cuh:101-171) lifted across chips.
    """
    from .scan_api import _selective_scan_local

    b, l, k, d = u.shape
    y = _selective_scan_local(
        u, dts, A, Bs, Cs, D_skip, dt_bias,
        delta_softplus=True, impl=impl,
        # the lane-width verdict must reflect the GLOBAL geometry; L-sharding
        # does not change K·D, so the local width is the global one
        fused_lane_ok=(k * d >= 128 or impl == "interpret"),
    ).astype(jnp.float32)

    uf = u.astype(jnp.float32)
    dt = jax.nn.softplus(
        dts.astype(jnp.float32) + dt_bias.astype(jnp.float32)[None, None]
    )
    a_log = dt * A.astype(jnp.float32)[None, None, :, :, 0]  # (B, L, K, D) ≤ 0
    bmat = dt * uf * Bs[..., 0].astype(jnp.float32)[:, :, :, None]
    logcum = jnp.cumsum(a_log, axis=1)  # (B, L, K, D)
    logp = logcum[:, -1:]  # (B, 1, K, D) — total shard log-decay
    h_fin = jnp.sum(jnp.exp(logp - logcum) * bmat, axis=1)  # (B, K, D)
    return y, h_fin, logcum


def seq_sharded_selective_scan(
    u: jnp.ndarray,          # (B, L, K, D)
    dts: jnp.ndarray,        # (B, L, K, D)
    A: jnp.ndarray,          # (K, D, 1)
    Bs: jnp.ndarray,         # (B, L, K, 1)
    Cs: jnp.ndarray,         # (B, L, K, 1)
    D_skip: jnp.ndarray,     # (K, D)
    dt_bias: jnp.ndarray,    # (K, D)
    mesh,
    axis: str = "mp",
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """y: (B, L, K, D) with L sharded over ``mesh[axis]``; batch over dp."""
    from jax.sharding import PartitionSpec as P

    n_sh = mesh.shape[axis]
    b, l, k, d = u.shape
    assert l % n_sh == 0, f"L={l} must divide over {axis}={n_sh}"
    assert A.shape[-1] == 1, "sequence sharding implements the N=1 path"

    impl_val = impl

    def local(u, dts, A, Bs, Cs, D_skip, dt_bias):
        from .scan_api import default_impl

        im = impl_val or default_impl()
        y, h_fin, logcum = _local_scan_with_summary(
            u, dts, A, Bs, Cs, D_skip, dt_bias, im
        )
        me = jax.lax.axis_index(axis)
        bsz, ll, kk, dd = logcum.shape
        # Per-shard summary: final state and total log-decay.
        h_fin = h_fin.reshape(bsz, kk * dd)
        logp = logcum[:, -1].reshape(bsz, kk * dd)
        all_fin = jax.lax.all_gather(h_fin, axis)   # (n_sh, B, KD)
        all_logp = jax.lax.all_gather(logp, axis)   # (n_sh, B, KD)

        # h_offset = Σ_{s<me} h_fin[s] · exp(Σ_{s<r<me} logp[r]) — an
        # exclusive suffix-weighted sum over at most a handful of shards.
        shard_ids = jnp.arange(n_sh)
        # decay from end of shard s to start of mine: Σ logp over (s, me)
        cums = jnp.cumsum(all_logp, axis=0)  # inclusive over shards
        # Σ_{r≤me-1} − Σ_{r≤s} = logp over (s, me)
        upto_prev = jnp.where(me > 0, cums[me - 1], jnp.zeros_like(cums[0]))
        # Mask BEFORE exponentiating: on shards s >= me the exponent
        # upto_prev - cums[s] is positive and grows with per-shard L, so
        # exp() overflows to inf at L ≳ 1k. The forward's where would
        # discard the inf, but the VJP then sees inf·0 = NaN. With -inf
        # in the masked lanes, exp gives exactly 0 in both passes.
        mask = (shard_ids < me)[:, None, None]
        exponent = jnp.where(mask, upto_prev[None] - cums, -jnp.inf)
        weights = jnp.exp(exponent)                      # (n_sh, B, KD)
        h_off = jnp.sum(all_fin * weights, axis=0)
        h_off = h_off.reshape(bsz, 1, kk, dd)

        corr = jnp.exp(logcum) * h_off                   # (B, L, K, D)
        y = y + corr * Cs[..., 0].astype(jnp.float32)[:, :, :, None]
        return y.astype(u.dtype)

    seq = P("dp", axis, None, None)
    rep = P(None, None, None)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(seq, seq, rep, P("dp", axis, None, None),
                  P("dp", axis, None, None), P(None, None), P(None, None)),
        out_specs=seq,
        check_vma=False,
    )(u, dts, A, Bs, Cs, D_skip, dt_bias)
