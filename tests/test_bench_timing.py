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
