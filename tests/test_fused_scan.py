"""Fused selective-scan kernel: forward + all 7 gradients vs the unfused
reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vm_asr_tpu.ops import selective_scan
from vm_asr_tpu.ops.selective_scan_fused import selective_scan_fused


def _inputs(rng, b=2, k=4, l=70, d=24):
    u = rng.standard_normal((b, l, k, d)).astype(np.float32)
    dts = rng.uniform(-1, 1, (b, l, k, d)).astype(np.float32)
    A = -np.exp(rng.uniform(-1, 1, (k, d, 1))).astype(np.float32)
    Bs = rng.standard_normal((b, l, k, 1)).astype(np.float32)
    Cs = rng.standard_normal((b, l, k, 1)).astype(np.float32)
    Dsk = rng.standard_normal((k, d)).astype(np.float32)
    bias = rng.uniform(0, 1, (k, d)).astype(np.float32)
    return [jnp.asarray(x) for x in (u, dts, A, Bs, Cs, Dsk, bias)]


def test_fused_forward_matches_ref(rng):
    args = _inputs(rng)
    ref = selective_scan(*args, True, impl="ref")
    got = selective_scan(*args, True, impl="interpret")  # → fused path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_gradients_match_ref(rng):
    args = _inputs(rng, b=1, k=4, l=40, d=8)
    w = jnp.asarray(
        rng.standard_normal((1, 40, 4, 8)).astype(np.float32)
    )

    def loss(impl):
        def f(u, dts, A, Bs, Cs, Dsk, bias):
            y = selective_scan(u, dts, A, Bs, Cs, Dsk, bias, True, impl=impl)
            return jnp.sum(y * w)

        return f

    g_ref = jax.grad(loss("ref"), argnums=tuple(range(7)))(*args)
    g_fused = jax.grad(loss("interpret"), argnums=tuple(range(7)))(*args)
    names = ["u", "dts", "A", "Bs", "Cs", "D", "bias"]
    for name, a, b_ in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_fused_padding_path(rng):
    """Non-aligned L and D exercise the padding logic."""
    args = _inputs(rng, b=1, k=4, l=300, d=130)
    ref = selective_scan(*args, True, impl="ref")
    got = selective_scan(*args, True, impl="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("l", [64, 500, 777, 2048])
def test_fused_forward_grid(dtype, l, rng):
    """Reference-grade grid over dtype × seqlen (the CI subset of the
    reference's wtype/itype × seqlen sweep, test_selective_scan.py:545-563;
    the long-L {4096, 16384} × chunk {256, 512} grid runs on TPU via
    `python -m vm_asr_tpu.checks`, artifact CHECKS_r03.txt)."""
    args = _inputs(rng, b=1, k=4, l=l, d=32)
    if dtype == "bfloat16":
        # quantise activations only; params stay fp32 like production
        args = [a.astype(jnp.bfloat16) if a.ndim == 4 and a.shape[-1] != 1
                else a for a in args]
        args[3] = args[3].astype(jnp.bfloat16)  # Bs
        args[4] = args[4].astype(jnp.bfloat16)  # Cs
    ref = selective_scan(*args, True, impl="ref")
    got = selective_scan(*args, True, impl="interpret")
    tol = 1e-4 if dtype == "float32" else 3e-2  # bf16 IO: 1-2 output ulps
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


@pytest.mark.parametrize("k,d", [(4, 10), (1, 24), (2, 63)])
def test_fused_forward_lane_padding(k, d, rng):
    """Odd K·D exercises the lane-axis pad-to-128 path."""
    args = _inputs(rng, b=2, k=k, l=300, d=d)
    ref = selective_scan(*args, True, impl="ref")
    got = selective_scan(*args, True, impl="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("chunk", [128, 256, 512])
def test_fused_forward_chunk_sweep(chunk, rng):
    """The chunk size is a pure tiling knob — results must be identical
    across it (the checkpoint layout changes, not the math)."""
    from vm_asr_tpu.ops import selective_scan_fused as ssf

    b, l, k, d = 1, 777, 4, 32
    kd = k * d
    u = jnp.asarray(rng.standard_normal((b, l, kd)).astype(np.float32))
    dts = jnp.asarray(rng.standard_normal((b, l, kd)).astype(np.float32) * 0.5)
    bs = jnp.asarray(rng.standard_normal((b, l, k)).astype(np.float32))
    cs = jnp.asarray(rng.standard_normal((b, l, k)).astype(np.float32))
    a = -jnp.asarray(rng.random(kd).astype(np.float32) * 2)
    bias = jnp.asarray(rng.standard_normal(kd).astype(np.float32) * 0.2)
    dsk = jnp.asarray(rng.standard_normal(kd).astype(np.float32))

    y512, _ = ssf._fused_fwd_pallas(u, dts, bs, cs, a, bias, dsk, k,
                                    chunk=512, interpret=True)
    yc, _ = ssf._fused_fwd_pallas(u, dts, bs, cs, a, bias, dsk, k,
                                  chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(y512),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradients_bf16(rng):
    """bf16 activations through the fused backward (multichunk)."""
    from vm_asr_tpu.ops import selective_scan_fused as ssf

    b, l, k, d = 1, 700, 4, 32
    kd = k * d
    rngs = np.random.default_rng(7)
    u = jnp.asarray(rngs.standard_normal((b, l, kd)).astype(np.float32))
    dts = jnp.asarray(rngs.standard_normal((b, l, kd)).astype(np.float32) * 0.5)
    bs = jnp.asarray(rngs.standard_normal((b, l, k)).astype(np.float32))
    cs = jnp.asarray(rngs.standard_normal((b, l, k)).astype(np.float32))
    a = -jnp.asarray(rngs.random(kd).astype(np.float32) * 2)
    bias = jnp.asarray(rngs.standard_normal(kd).astype(np.float32) * 0.2)
    dsk = jnp.asarray(rngs.standard_normal(kd).astype(np.float32))
    dy = jnp.asarray(rngs.standard_normal((b, l, kd)).astype(np.float32))

    ub, dtb = u.astype(jnp.bfloat16), dts.astype(jnp.bfloat16)
    bsb, csb = bs.astype(jnp.bfloat16), cs.astype(jnp.bfloat16)
    _, res = ssf._fused_fwd(ub, dtb, bsb, csb, a, bias, dsk, k, True)
    g_kernel = ssf._fused_bwd(k, True, res, dy.astype(jnp.bfloat16))
    g_xla = ssf._fused_bwd_xla(k, True, res, dy.astype(jnp.bfloat16))
    names = ["du", "ddts", "dbs", "dcs", "dA", "dbias", "ddskip"]
    for name, got, ref in zip(names, g_kernel, g_xla):
        got = np.asarray(got, np.float32)
        ref = np.asarray(ref, np.float32)
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(got - ref).max() / scale < 3e-2, (
            f"bf16 grad mismatch: {name}"
        )


def test_fused_gradients_multichunk(rng):
    """l > chunk exercises the fused backward's cross-chunk machinery —
    the reverse boundary carry (carry_g), the checkpoint-row restore, and
    the reversed BlockSpec traversal — which production shapes always use
    but the short-l grad test above never reaches."""
    from vm_asr_tpu.ops import selective_scan_fused as ssf

    b, l, k, d = 2, 700, 4, 40  # 700 > 512 ⇒ 2 chunks (with padding)
    kd = k * d
    u = jnp.asarray(rng.standard_normal((b, l, kd)).astype(np.float32))
    dts = jnp.asarray(rng.standard_normal((b, l, kd)).astype(np.float32) * 0.5)
    bs = jnp.asarray(rng.standard_normal((b, l, k)).astype(np.float32))
    cs = jnp.asarray(rng.standard_normal((b, l, k)).astype(np.float32))
    a = -jnp.asarray(rng.random(kd).astype(np.float32) * 2)
    bias = jnp.asarray(rng.standard_normal(kd).astype(np.float32) * 0.2)
    dsk = jnp.asarray(rng.standard_normal(kd).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((b, l, kd)).astype(np.float32))

    _, res = ssf._fused_fwd(u, dts, bs, cs, a, bias, dsk, k, True)
    assert res[-1].shape[1] >= 2, "need multiple chunks for this test"
    g_kernel = ssf._fused_bwd(k, True, res, dy)
    g_xla = ssf._fused_bwd_xla(k, True, res, dy)
    names = ["du", "ddts", "dbs", "dcs", "dA", "dbias", "ddskip"]
    for name, got, ref in zip(names, g_kernel, g_xla):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4,
            err_msg=f"multichunk grad mismatch: {name}",
        )
