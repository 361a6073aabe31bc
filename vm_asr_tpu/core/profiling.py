"""Profiling / FLOPs / sanity instrumentation.

Reference equivalents (SURVEY.md §5):
- fvcore FLOP counting with a custom selective-scan handler
  (vmamba.py:172-195, 395-400; model.py:969-1003) → XLA `cost_analysis()`
  plus an analytic scan-FLOPs formula;
- torch.profiler scaffold (vmamba.py:2795-2832) → `jax.profiler` trace
  context;
- NaN/Inf checks (`check_nan_inf` vmamba.py:162-168, kill-switch
  base_trainer.py:223-231) → `tree_check_finite` / `assert_finite`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np


def flops_selective_scan(b: int, l: int, d: int, n: int, with_d: bool = True,
                         with_z: bool = False) -> int:
    """Analytic FLOPs of the selective scan, matching the reference's fvcore
    handler (vmamba.py:172-195): 9·B·L·D·N for the recurrence/einsums plus the
    D-skip and gate terms."""
    flops = 9 * b * l * d * n
    if with_d:
        flops += b * d * l
    if with_z:
        flops += b * d * l
    return flops


def xla_cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        return dict(compiled.cost_analysis())
    except Exception:
        return {}


def model_flops(generator, params, x, hf) -> Dict[str, float]:
    """Total forward FLOPs / memory traffic of a generator forward."""
    def fwd(p, x, hf):
        return generator.apply({"params": p}, x, hf, deterministic=True)

    cost = xla_cost_analysis(fwd, params, x, hf)
    return {
        "gflops": cost.get("flops", float("nan")) / 1e9,
        "gbytes_accessed": cost.get("bytes accessed", float("nan")) / 1e9,
    }


def count_params(tree: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 2
              ) -> Dict[str, float]:
    """Wall-clock a jitted function with async-dispatch-safe timing."""
    jfn = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"seconds_per_call": dt, "calls_per_second": 1.0 / dt}


# -- NaN/Inf guards ----------------------------------------------------------
def tree_check_finite(tree: Any) -> Tuple[bool, list]:
    """Host-side finiteness check over a pytree; returns (ok, bad_paths)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    return (len(bad) == 0, bad)


def assert_finite(tree: Any, what: str = "tree") -> None:
    ok, bad = tree_check_finite(tree)
    if not ok:
        raise FloatingPointError(f"Non-finite values in {what}: {bad[:8]}")


def debug_nan_context():
    """Enable jax debug_nans (the analogue of
    torch.autograd.set_detect_anomaly, reference trainer.py:320)."""
    return jax.debug_nans(True)
