"""Sequence-sharded selective scan: equivalence with the single-device scan
on a virtual mesh (the ICI chunk-prefix handoff, ops/seq_scan.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vm_asr_tpu.ops.scan_api import selective_scan
from vm_asr_tpu.ops.seq_scan import seq_sharded_selective_scan
from vm_asr_tpu.parallel import make_mesh


def _inputs(rng, b=2, l=256, k=4, d=16):
    u = jnp.asarray(rng.standard_normal((b, l, k, d)).astype(np.float32))
    dts = jnp.asarray(rng.standard_normal((b, l, k, d)).astype(np.float32) * 0.5)
    A = -jnp.asarray(rng.random((k, d, 1)).astype(np.float32) * 2)
    Bs = jnp.asarray(rng.standard_normal((b, l, k, 1)).astype(np.float32))
    Cs = jnp.asarray(rng.standard_normal((b, l, k, 1)).astype(np.float32))
    Dk = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32) * 0.2)
    return u, dts, A, Bs, Cs, Dk, bias


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_seq_sharded_matches_single_device(rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    args = _inputs(rng)
    ref = selective_scan(*args, True, impl="ref")

    mesh = make_mesh(dp=1, mp=4, devices=jax.devices()[:4])
    got = jax.jit(
        lambda *a: seq_sharded_selective_scan(*a, mesh=mesh, axis="mp")
    )(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_seq_sharded_with_dp_axis(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    args = _inputs(rng, b=2, l=128)
    ref = selective_scan(*args, True, impl="ref")
    mesh = make_mesh(dp=2, mp=4, devices=jax.devices()[:8])
    got = jax.jit(
        lambda *a: seq_sharded_selective_scan(*a, mesh=mesh, axis="mp")
    )(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_seq_sharded_long_l_grads_finite(rng):
    """Regression: at L>=~1k the masked-lane exponent overflowed exp() to
    inf and the VJP produced NaN grads (inf*0). Mask-before-exp fix."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    args = _inputs(rng, b=1, l=1024, k=1, d=4)
    mesh = make_mesh(dp=1, mp=4, devices=jax.devices()[:4])

    def loss(*a):
        return jnp.sum(seq_sharded_selective_scan(*a, mesh=mesh, axis="mp"))

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6)))(*args)
    for name, g in zip(["u", "dts", "A", "Bs", "Cs", "D", "bias"], grads):
        assert bool(jnp.all(jnp.isfinite(g))), f"non-finite grad: {name}"


def test_seq_sharded_fused_kernel(rng):
    """impl="interpret" routes each shard's scan through the FUSED Pallas
    kernel (in interpreter mode on the CPU mesh) — per-shard fused
    execution, forward AND grads, must match the unsharded reference."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    args = _inputs(rng, b=1, l=256, k=4, d=16)
    ref = selective_scan(*args, True, impl="ref")
    mesh = make_mesh(dp=1, mp=4, devices=jax.devices()[:4])
    run = lambda *a: seq_sharded_selective_scan(
        *a, mesh=mesh, axis="mp", impl="interpret")
    got = jax.jit(run)(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    w = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
    g_sh = jax.jit(jax.grad(
        lambda *a: jnp.sum(run(*a) * w), argnums=(0, 1, 2, 3, 4, 5, 6)
    ))(*args)
    g_ref = jax.jit(jax.grad(
        lambda *a: jnp.sum(selective_scan(*a, True, impl="ref") * w),
        argnums=(0, 1, 2, 3, 4, 5, 6),
    ))(*args)
    for name, a, b in zip(["u", "dts", "A", "Bs", "Cs", "D", "bias"],
                          g_sh, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"fused seq-sharded grad mismatch: {name}",
        )


def test_seq_sharded_gradients(rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    args = _inputs(rng, b=1, l=64, k=4, d=4)
    mesh = make_mesh(dp=1, mp=4, devices=jax.devices()[:4])
    w = jnp.asarray(rng.standard_normal((1, 64, 4, 4)).astype(np.float32))

    def loss_sharded(*a):
        y = seq_sharded_selective_scan(*a, mesh=mesh, axis="mp")
        return jnp.sum(y * w)

    def loss_ref(*a):
        return jnp.sum(selective_scan(*a, True, impl="ref") * w)

    g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4, 5, 6)))(*args)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6)))(*args)
    for name, a, b in zip(["u", "dts", "A", "Bs", "Cs", "D", "bias"],
                          g_sh, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
            err_msg=f"seq-sharded grad mismatch: {name}",
        )
