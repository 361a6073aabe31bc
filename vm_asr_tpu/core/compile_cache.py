"""Persistent XLA compilation cache (round-5, VERDICT r04 items 1 and 7).

GSPMD-partitioned compiles on the virtual CPU mesh are the dominant cost of
the test suite (40-55 min full run) and the multi-chip dryrun (the r04 driver
artifact died at rc=124 inside a 2m43s+ CPU compile of the dp4x/mp2 GAN step).
Every process paid full compile because nothing configured
``jax_compilation_cache_dir``.

This helper turns on JAX's persistent compilation cache, keyed to a
directory that survives across processes (and across driver invocations,
since the default lives inside the repo checkout). Measured on this image
(jax 0.9.0, CPU backend): a sharded scan+grad toy compile drops 0.53s ->
0.21s warm; the dryrun's GAN-step compiles drop from minutes to seconds.

Deliberately NOT set: ``jax_persistent_cache_enable_xla_caches="all"`` — on
the CPU backend that serialises AOT machine-code whose feature flags must
match the executing host exactly (loading mismatched entries warns about
possible SIGILL). The default setting caches the compiled executable at the
XLA level only, which is host-portable and still captures the GSPMD
partitioning + HLO optimisation cost that dominates here.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's compilation cache at ``cache_dir`` (default:
    ``<repo>/.jax_cache``). Idempotent; safe to call before or after backend
    init (the config flags only gate compilation, not backend setup).

    Returns the cache directory in use.
    """
    global _enabled
    import jax

    path = cache_dir or os.environ.get("VM_ASR_JAX_CACHE_DIR") or _DEFAULT_DIR
    if _enabled and jax.config.jax_compilation_cache_dir == path:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: tiny entries are the common case on the CPU test mesh
    # and the default 1s/small-entry thresholds would skip most of the suite.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return path
