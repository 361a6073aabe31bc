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


def matmul_flops(fn: Callable, *args) -> int:
    """Exact MXU FLOPs of ``fn(*args)``: walk the jaxpr and count every
    ``dot_general`` / ``conv_general_dilated`` from its shapes (2·M·N·K
    convention), recursing through pjit/scan/cond/remat sub-jaxprs.

    This is the standard MFU numerator: XLA's ``cost_analysis()['flops']``
    over-counts producers that fusion duplicates into several consumers
    (observed 105% "of peak" on the flagship forward), so it must not be
    used for utilization claims. Pallas kernels (the selective scan) are
    VPU work and intentionally excluded; add ``flops_selective_scan`` if a
    total-FLOPs figure is needed.
    """
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _count_jaxpr(jaxpr.jaxpr)


def _aval_shape(v) -> tuple:
    return tuple(getattr(v.aval, "shape", ()))


def _count_eqn(eqn) -> int:
    name = eqn.primitive.name
    if name == "dot_general":
        lhs, rhs = _aval_shape(eqn.invars[0]), _aval_shape(eqn.invars[1])
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        k = int(np.prod([lhs[i] for i in lc], dtype=np.int64)) if lc else 1
        b = int(np.prod([lhs[i] for i in lb], dtype=np.int64)) if lb else 1
        m = int(np.prod([d for i, d in enumerate(lhs)
                         if i not in set(lc) | set(lb)], dtype=np.int64))
        n = int(np.prod([d for i, d in enumerate(rhs)
                         if i not in set(rc) | set(rb)], dtype=np.int64))
        return 2 * b * m * n * k
    if name == "conv_general_dilated":
        rhs = _aval_shape(eqn.invars[1])
        out = _aval_shape(eqn.outvars[0])
        dn = eqn.params["dimension_numbers"]
        k_spatial = int(np.prod([rhs[i] for i in dn.rhs_spec[2:]],
                                dtype=np.int64)) if len(dn.rhs_spec) > 2 else 1
        cin_per_group = rhs[dn.rhs_spec[1]]
        return 2 * int(np.prod(out, dtype=np.int64)) * cin_per_group * k_spatial
    # Recurse into sub-jaxprs (pjit, remat, custom_vjp, scan, cond, ...).
    total = 0
    for key, val in eqn.params.items():
        sub = None
        if hasattr(val, "jaxpr") and hasattr(val.jaxpr, "eqns"):  # ClosedJaxpr
            sub = val.jaxpr
        elif hasattr(val, "eqns"):  # raw Jaxpr
            sub = val
        elif key == "branches" and isinstance(val, (list, tuple)):
            counts = [_count_jaxpr(b.jaxpr if hasattr(b, "jaxpr") else b)
                      for b in val]
            total += max(counts) if counts else 0
            continue
        if sub is not None:
            n = _count_jaxpr(sub)
            if name == "scan":
                n *= int(eqn.params.get("length", 1))
            total += n
    return total


def _count_jaxpr(jaxpr) -> int:
    return sum(_count_eqn(e) for e in jaxpr.eqns)


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


def median_window_dt(step, state, iters, windows=3):
    """Honest per-iteration wall time: differential, D2H-anchored timing.

    Two defenses against the remote-TPU tunnel, both load-bearing:

    1. **D2H anchor.** Over the axon tunnel, ``block_until_ready`` can ack
       before device compute finishes (observed: batch-32 inference "timed"
       below its theoretical minimum at the v5e's 197 TFLOP/s bf16 peak —
       a non-physical >160% MFU). Fetching one element of the final state
       to the host cannot return early, so every timing window ends with a
       real device→host read. The FIRST leaf of ``state`` must therefore
       be (or depend on) the step's computed output, not a passthrough
       input.
    2. **Differential timing.** The anchor costs a tunnel round trip and
       the first executions of a burst ramp slowly; timing N and 2N
       chained iterations and taking (T_2N − T_N)/N cancels every
       per-window constant, leaving the marginal per-iteration time.

    ``step(state) -> state`` must chain its output into the next input so
    every execution is distinct (the tunnel memoizes repeated identical
    executions) and strictly ordered. Median over ``windows`` differential
    windows guards against congestion bursts.
    """

    def run(n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        jax.block_until_ready(s)
        leaf = jax.tree_util.tree_leaves(s)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))  # D2H anchor
        return time.perf_counter() - t0, s

    dts = []
    mean_rates = []
    for _ in range(windows):
        t_n, state = run(iters, state)
        t_2n, state = run(2 * iters, state)
        dts.append((t_2n - t_n) / iters)
        mean_rates.append(t_2n / (2 * iters))
    dt = float(np.median(dts))
    if dt <= 0.0:
        # Noise exceeded the op cost. The mean rate re-includes the constant
        # D2H-anchor/ramp overhead the differential cancels, so it OVERSTATES
        # per-iteration time for very fast ops — take the min across all
        # windows (the least-congested one) as the tightest upper bound.
        dt = float(np.min(mean_rates))
    return dt, state


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 2,
              chain: Callable = None) -> Dict[str, float]:
    """Wall-clock a jitted function via :func:`median_window_dt`.

    ``chain(out, *args) -> new_args`` feeds each call's output into the
    next call's inputs so every execution is distinct — REQUIRED over the
    axon tunnel, which memoizes repeated identical executions. Without it
    the same args are re-submitted (fine on local backends).
    """
    jfn = jax.jit(fn)
    cur = args
    out = jfn(*cur)
    jax.block_until_ready(out)
    for _ in range(warmup):
        if chain is not None:
            cur = chain(out, *cur)
        out = jfn(*cur)
    jax.block_until_ready(out)

    def step(state):
        out_, cur_ = state
        if chain is not None:
            cur_ = chain(out_, *cur_)
        return (jfn(*cur_), cur_)  # out first: it is the D2H anchor leaf

    dt, _ = median_window_dt(step, (out, cur), iters=iters)
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
