"""Selective-scan correctness pyramid.

Mirrors the reference's kernel test strategy
(kernels/selective_scan/test_selective_scan.py:545-563 parametrized grid):
1. numpy sequential loop  — independent ground truth
2. jnp associative-scan reference — vs (1)
3. Pallas kernel (interpret mode on CPU) — vs (2), forward and gradients
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vm_asr_tpu.ops import (
    linear_recurrence,
    linear_recurrence_ref,
    selective_scan,
    selective_scan_ref,
    selective_scan_seq,
)


def numpy_linrec(a, b):
    h = np.zeros_like(b)
    acc = np.zeros(b.shape[:-2] + (b.shape[-1],), b.dtype)
    for t in range(b.shape[-2]):
        acc = a[..., t, :] * acc + b[..., t, :]
        h[..., t, :] = acc
    return h


def numpy_selective_scan(u, delta, A, B, C, D, bias, softplus):
    bsz, gd, L = u.shape
    _, g, n, _ = B.shape
    d = gd // g
    dt = delta + (bias[None, :, None] if bias is not None else 0.0)
    if softplus:
        dt = np.log1p(np.exp(-np.abs(dt))) + np.maximum(dt, 0.0)
    dt = dt.reshape(bsz, g, d, L)
    uf = u.reshape(bsz, g, d, L)
    Af = A.reshape(g, d, n)
    h = np.zeros((bsz, g, d, n), np.float64)
    y = np.zeros((bsz, g, d, L), np.float64)
    for t in range(L):
        a_t = np.exp(dt[..., t, None] * Af[None])
        b_t = (dt[..., t] * uf[..., t])[..., None] * B[..., t][:, :, None, :]
        h = a_t * h + b_t
        y[..., t] = (h * C[..., t][:, :, None, :]).sum(-1)
    if D is not None:
        y = y + D.reshape(1, g, d, 1) * uf
    return y.reshape(bsz, gd, L)


@pytest.mark.parametrize("shape", [(3, 17, 8), (2, 64, 128), (1, 100, 5)])
def test_linrec_ref_vs_numpy(shape, rng):
    a = rng.uniform(0.1, 1.0, shape).astype(np.float32)
    b = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(linear_recurrence_ref(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, numpy_linrec(a, b), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "r,l,d", [(2, 256, 128), (1, 300, 64), (4, 64, 200), (2, 1024, 32), (3, 37, 7)]
)
def test_linrec_pallas_vs_ref(r, l, d, rng):
    a = rng.uniform(0.1, 1.0, (r, l, d)).astype(np.float32)
    b = rng.standard_normal((r, l, d)).astype(np.float32)
    ref = numpy_linrec(a, b)
    got = np.asarray(linear_recurrence(jnp.asarray(a), jnp.asarray(b), "interpret"))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_linrec_grads_pallas_vs_ref(rng):
    r, l, d = 2, 130, 36
    a = rng.uniform(0.1, 1.0, (r, l, d)).astype(np.float32)
    b = rng.standard_normal((r, l, d)).astype(np.float32)
    w = rng.standard_normal((r, l, d)).astype(np.float32)

    def loss(impl):
        def f(a_, b_):
            h = linear_recurrence(a_, b_, impl)
            return jnp.sum(h * w)
        return f

    # "ref" impl goes through the same custom_vjp; compare against pure
    # associative-scan autodiff as the gold standard.
    def gold(a_, b_):
        return jnp.sum(linear_recurrence_ref(a_, b_) * w)

    ga_gold, gb_gold = jax.grad(gold, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    ga, gb = jax.grad(loss("interpret"), argnums=(0, 1))(
        jnp.asarray(a), jnp.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_gold), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_gold), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("n", [1, 2, 4])
@pytest.mark.parametrize("softplus", [True, False])
@pytest.mark.parametrize("has_d,has_bias", [(True, True), (False, False)])
def test_selective_scan_ref_vs_numpy(n, softplus, has_d, has_bias, rng):
    bsz, g, d, L = 2, 4, 6, 33
    u = rng.standard_normal((bsz, g * d, L)).astype(np.float32)
    delta = rng.uniform(-1, 1, (bsz, g * d, L)).astype(np.float32)
    A = -np.exp(rng.uniform(-1, 1, (g * d, n))).astype(np.float32)
    B = rng.standard_normal((bsz, g, n, L)).astype(np.float32)
    C = rng.standard_normal((bsz, g, n, L)).astype(np.float32)
    D = rng.standard_normal((g * d,)).astype(np.float32) if has_d else None
    bias = rng.uniform(0, 1, (g * d,)).astype(np.float32) if has_bias else None

    ref = numpy_selective_scan(u, delta, A, B, C, D, bias, softplus)
    got = np.asarray(
        selective_scan_ref(
            jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A), jnp.asarray(B),
            jnp.asarray(C), None if D is None else jnp.asarray(D),
            None if bias is None else jnp.asarray(bias), softplus,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # sequential lax.scan formulation agrees too
    got_seq = np.asarray(
        selective_scan_seq(
            jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A), jnp.asarray(B),
            jnp.asarray(C), None if D is None else jnp.asarray(D),
            None if bias is None else jnp.asarray(bias), softplus,
        )
    )
    np.testing.assert_allclose(got_seq, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", [1, 2])
def test_scan_api_vs_ref(n, rng):
    """(B,L,K,D)-layout API matches the reference-layout golden path."""
    bsz, k, l, d = 2, 4, 40, 8
    u = rng.standard_normal((bsz, l, k, d)).astype(np.float32)
    dts = rng.uniform(-1, 1, (bsz, l, k, d)).astype(np.float32)
    A = -np.exp(rng.uniform(-1, 1, (k, d, n))).astype(np.float32)
    Bs = rng.standard_normal((bsz, l, k, n)).astype(np.float32)
    Cs = rng.standard_normal((bsz, l, k, n)).astype(np.float32)
    Dsk = rng.standard_normal((k, d)).astype(np.float32)
    bias = rng.uniform(0, 1, (k, d)).astype(np.float32)

    got = np.asarray(
        selective_scan(
            jnp.asarray(u), jnp.asarray(dts), jnp.asarray(A), jnp.asarray(Bs),
            jnp.asarray(Cs), jnp.asarray(Dsk), jnp.asarray(bias), True, impl="ref",
        )
    )
    # reshape to reference layout (B, K*D, L) etc.
    u_r = u.transpose(0, 2, 3, 1).reshape(bsz, k * d, l)
    dt_r = dts.transpose(0, 2, 3, 1).reshape(bsz, k * d, l)
    A_r = A.reshape(k * d, n)
    B_r = Bs.transpose(0, 2, 3, 1)
    C_r = Cs.transpose(0, 2, 3, 1)
    ref = numpy_selective_scan(
        u_r, dt_r, A_r, B_r, C_r, Dsk.reshape(-1), bias.reshape(-1), True
    ).reshape(bsz, k, d, l).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_scan_api_pallas_matches_ref_impl(rng):
    bsz, k, l, d = 1, 4, 100, 16
    n = 1
    u = rng.standard_normal((bsz, l, k, d)).astype(np.float32)
    dts = rng.uniform(-1, 1, (bsz, l, k, d)).astype(np.float32)
    A = -np.exp(rng.uniform(-1, 1, (k, d, n))).astype(np.float32)
    Bs = rng.standard_normal((bsz, l, k, n)).astype(np.float32)
    Cs = rng.standard_normal((bsz, l, k, n)).astype(np.float32)
    args = [jnp.asarray(x) for x in (u, dts, A, Bs, Cs)]
    ref = selective_scan(*args, None, None, True, impl="ref")
    got = selective_scan(*args, None, None, True, impl="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_cross_scan_merge(rng):
    from vm_asr_tpu.ops import cross_scan, cross_merge

    b, h, w, c = 2, 4, 6, 3
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    xs = cross_scan(jnp.asarray(x))
    assert xs.shape == (b, h * w, 4, c)
    # direction 0 is row-major
    np.testing.assert_array_equal(np.asarray(xs[:, :, 0]), x.reshape(b, h * w, c))
    # direction 1 is column-major
    np.testing.assert_array_equal(
        np.asarray(xs[:, :, 1]), x.transpose(0, 2, 1, 3).reshape(b, h * w, c)
    )
    # flips
    np.testing.assert_array_equal(
        np.asarray(xs[:, :, 2]), x.reshape(b, h * w, c)[:, ::-1]
    )
    # merge of the scan of x = 4 * x (each direction contributes x back)
    merged = cross_merge(xs, h, w)
    np.testing.assert_allclose(
        np.asarray(merged), 4.0 * x.reshape(b, h * w, c), rtol=1e-6
    )
    # adjoint test: <cross_scan(x), y> == <x, cross_merge(y)>
    y = rng.standard_normal((b, h * w, 4, c)).astype(np.float32)
    lhs = float(jnp.vdot(xs, jnp.asarray(y)))
    rhs = float(
        jnp.vdot(jnp.asarray(x).reshape(b, h * w, c), cross_merge(jnp.asarray(y), h, w))
    )
    assert abs(lhs - rhs) < 1e-3
