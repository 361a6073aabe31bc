"""4-directional cross-scan / cross-merge layout ops.

The reference implements these as Triton gather kernels
(model/csm_triton.py:8-309) and a pure-torch fallback (model/vmamba.py:27-74).
On TPU, transposes/flips/stacks are layout ops XLA fuses into neighbouring
kernels, so the idiomatic implementation is plain jnp; a fused Pallas variant
is only worth it if profiling shows the 4-way materialisation dominating.

Layout: channels-last with the direction axis *inside* the channel dims —
``x: (B, H, W, C)`` → ``xs: (B, H*W, K=4, C)``. Flattening the trailing two
axes gives ``(B, L, K·C)``: sequence on sublanes, K·C on lanes, which is the
native tiling for the selective-scan kernels (K·C is a lane multiple for
every stage of the production model: 4·32, 4·64, 4·128, 4·256).

Directions (matching reference vmamba.py:27-36):
  k=0: row-major (H then W)
  k=1: column-major (transpose H/W)
  k=2: row-major, reversed
  k=3: column-major, reversed

``cross_merge`` is the transpose-adjoint: map each direction's output back to
row-major order and sum. jax.grad of ``cross_scan`` equals ``cross_merge`` by
linearity (covered by tests, mirroring reference check_csm_triton
vmamba.py:2558-2724).
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_scan(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H*W, 4, C)."""
    b, h, w, c = x.shape
    row = x.reshape(b, h * w, c)
    col = jnp.swapaxes(x, 1, 2).reshape(b, h * w, c)
    return jnp.stack(
        [row, col, jnp.flip(row, axis=1), jnp.flip(col, axis=1)], axis=2
    )


def cross_merge(ys: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H*W, 4, C) → (B, H*W, C): undo each direction's ordering and sum."""
    b, l, k, c = ys.shape
    assert k == 4 and l == h * w
    fwd = ys[:, :, 0] + jnp.flip(ys[:, :, 2], axis=1)
    swp = ys[:, :, 1] + jnp.flip(ys[:, :, 3], axis=1)
    swp = jnp.swapaxes(swp.reshape(b, w, h, c), 1, 2).reshape(b, l, c)
    return fwd + swp
