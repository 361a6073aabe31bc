"""The bench timing protocol (bench.median_window_dt).

The protocol is differential and D2H-anchored (see bench.py docstring):
time N and 2N chained iterations, each window ending with a device_get of
one element, dt = (T2N - TN)/N. On CPU the anchor is nearly free, so the
differential estimate must track the true per-iteration cost and must not
be fooled by a constant per-window overhead.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench


def test_median_window_dt_tracks_marginal_cost():
    sleep_s = 0.02

    def step(s):
        time.sleep(sleep_s)
        return s + 1.0

    dt, out = bench.median_window_dt(step, jnp.zeros((4,)), iters=3)
    assert abs(dt - sleep_s) < sleep_s * 0.5
    # 3 windows × (N + 2N) iterations chained through
    assert np.allclose(np.asarray(out), 27.0)


def test_median_window_dt_cancels_constant_overhead():
    # A constant per-window cost (simulating the D2H round trip / ramp-up)
    # must cancel out of the differential estimate.
    sleep_s = 0.01
    calls = {"n": 0}

    def step(s):
        if calls["n"] % 3 == 0:
            pass  # no extra work; constant overhead is modeled below
        calls["n"] += 1
        time.sleep(sleep_s)
        return s * 1.0

    orig_get = jax.device_get

    def slow_get(x):
        time.sleep(0.05)  # constant anchor cost, larger than one iteration
        return orig_get(x)

    jax.device_get = slow_get
    try:
        dt, _ = bench.median_window_dt(step, jnp.ones(()), iters=2)
    finally:
        jax.device_get = orig_get
    assert abs(dt - sleep_s) < sleep_s * 0.6


def test_median_window_dt_chains_state():
    seen = []

    def step(s):
        seen.append(float(np.asarray(s)))
        return s + 1.0

    bench.median_window_dt(step, jnp.zeros(()), iters=1, windows=1)
    # every call saw a distinct chained value (no resubmitted identical input)
    assert seen == sorted(set(seen))


def test_bench_emit_and_stale_cache(tmp_path, monkeypatch, capsys):
    """bench.py outage path (VERDICT r03 #1): emitted metrics persist to the
    cache; on a no-device round the cached lines re-emit tagged stale."""
    import json

    import bench

    monkeypatch.setattr(bench, "CACHE_PATH", str(tmp_path / "cache.json"))
    bench.emit({"metric": "m1", "value": 1.0, "unit": "x"})
    bench.emit({"metric": "m2", "value": 2.0, "unit": "x"})
    bench.emit({"metric": "m1", "value": 3.0, "unit": "x"})  # overwrites m1
    capsys.readouterr()

    rc = bench.emit_stale_cache()
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    recs = {json.loads(l)["metric"]: json.loads(l) for l in out}
    assert set(recs) == {"m1", "m2"}
    assert recs["m1"]["value"] == 3.0
    assert all(r["stale"] is True for r in recs.values())


def test_bench_stale_cache_missing(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "CACHE_PATH", str(tmp_path / "absent.json"))
    assert bench.emit_stale_cache() == 2
