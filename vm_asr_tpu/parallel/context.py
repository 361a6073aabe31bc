"""Activation-sharding context: opt-in tensor parallelism over the ``mp`` axis.

The reference is single-GPU; this is new TPU-native architecture (SURVEY.md
§2.3). The model's natural tensor-parallel dimension is the K=4 cross-scan
directions: between ``cross_scan`` and ``cross_merge`` every operation
(the Δ/B/C projections and the selective scan itself) is independent per
direction, so sharding K over ``mp`` splits the hot compute with a single
gather at the merge — the collective rides ICI.

Usage: build a mesh with ``make_mesh(dp=…, mp=2 or 4)`` and call
``set_activation_mesh(mesh)`` before the first (tracing) call of the jitted
step. SS2D then constrains its directional activations to
``P("dp", None, "mp", None)`` and ``ops.selective_scan`` runs the scan
kernel under ``shard_map`` with the K axis split. ``set_activation_mesh(None)``
(or an mp=1 mesh) restores pure data parallelism.

This is trace-time state: flip it only between jit traces, not inside them.
"""

from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

_ACTIVE_MESH: Optional[Mesh] = None


def set_activation_mesh(mesh: Optional[Mesh]) -> None:
    """Install (or clear) the mesh used for mp-axis activation sharding."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_activation_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def mp_mesh() -> Optional[Mesh]:
    """The active mesh iff it has a non-trivial ``mp`` axis."""
    m = _ACTIVE_MESH
    if m is not None and "mp" in m.shape and m.shape["mp"] > 1:
        return m
    return None
