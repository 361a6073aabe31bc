"""Device mesh + sharding helpers.

The reference is strictly single-GPU (README.md:31; SURVEY.md §2.3) — this
module is new, TPU-native architecture: a data-parallel mesh over ICI where
XLA inserts the gradient ``psum`` from sharding annotations (no NCCL/DDP
analogue needed).

Axes:
- ``dp``: data parallel — the batch axis of every input is sharded here;
  parameters and optimizer state are replicated. Gradient all-reduce rides
  ICI automatically.
- ``mp``: reserved model axis (size 1 by default) for future tensor-parallel
  layouts (e.g. sharding the K=4 scan directions or the dual streams).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    """Build a (dp, mp) mesh; dp=-1 uses all available devices / mp."""
    devices = devices if devices is not None else jax.devices()
    if dp == -1:
        dp = len(devices) // mp
    devices = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(devices, ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with the batch axis on dp.

    Arrays whose leading dim isn't divisible by the dp size (e.g. the last
    uneven eval batch) are replicated instead — correctness over parallelism
    for stragglers.
    """
    dp = mesh.shape["dp"]
    sharded = batch_sharding(mesh)
    repl = replicated(mesh)

    warned = []

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % dp == 0:
            return jax.device_put(x, sharded)
        if hasattr(x, "ndim") and x.ndim >= 1 and dp > 1 and not warned:
            # Not silent: every chip redundantly computes the whole batch.
            warned.append(True)
            import logging

            logging.getLogger("vm_asr_tpu").warning(
                "shard_batch: leading dim %d not divisible by dp=%d — "
                "replicating (wasteful; pad the batch to avoid)",
                x.shape[0], dp,
            )
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to(batch_arrays, multiple: int):
    """Pad the leading axis to a multiple (uneven final eval batches)."""
    def pad(x):
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x, b
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width), b

    return pad(batch_arrays)
