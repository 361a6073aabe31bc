"""Analytic MXU FLOP counter (core/profiling.matmul_flops).

This is the MFU numerator used by bench.py; XLA's cost_analysis() FLOPs
over-count fusion-duplicated producers, so the jaxpr walk must be exact.
Each case checks the 2*M*N*K (dot) / 2*prod(out)*Cin_per_group*K_spatial
(conv) convention against a hand count, including recursion through
scan/pjit/remat sub-jaxprs.
"""

import jax
import jax.numpy as jnp
from jax import lax

from vm_asr_tpu.core.profiling import matmul_flops


def test_dot_general_plain():
    f = lambda a, b: a @ b
    a = jnp.zeros((4, 8))
    b = jnp.zeros((8, 16))
    assert matmul_flops(f, a, b) == 2 * 4 * 16 * 8


def test_dot_general_batched():
    f = lambda a, b: jnp.einsum("bik,bkj->bij", a, b)
    a = jnp.zeros((3, 4, 8))
    b = jnp.zeros((3, 8, 16))
    assert matmul_flops(f, a, b) == 3 * 2 * 4 * 16 * 8


def test_conv_general_dilated():
    def conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME")

    x = jnp.zeros((1, 3, 8, 8))  # NCHW
    w = jnp.zeros((5, 3, 3, 3))  # OIHW
    # 2 * prod(out=(1,5,8,8)) * Cin_per_group=3 * K_spatial=9
    assert matmul_flops(conv, x, w) == 2 * (1 * 5 * 8 * 8) * 3 * 9


def test_grouped_conv_counts_cin_per_group():
    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1,), "SAME", feature_group_count=4
        )

    x = jnp.zeros((1, 4, 16))  # NCL, 4 channels, groups=4 (depthwise)
    w = jnp.zeros((4, 1, 3))  # OIL with I = Cin/groups = 1
    assert matmul_flops(conv, x, w) == 2 * (1 * 4 * 16) * 1 * 3


def test_scan_multiplies_by_length():
    def scanned(a):
        def body(c, _):
            return c @ a, None

        c, _ = lax.scan(body, jnp.eye(8), None, length=10)
        return c

    assert matmul_flops(scanned, jnp.eye(8)) == 10 * 2 * 8 * 8 * 8


def test_recurses_through_jit_and_remat():
    inner = jax.checkpoint(lambda a, b: a @ b)
    f = jax.jit(lambda a, b: inner(a, b) + 1.0)
    a = jnp.zeros((4, 8))
    b = jnp.zeros((8, 16))
    # remat may record the dot in both fwd and residual sub-jaxprs at trace
    # time; the contract is "counts at least the logical dot once" and the
    # plain-jit path must be exact.
    assert matmul_flops(f, a, b) >= 2 * 4 * 16 * 8
    g = jax.jit(lambda a, b: a @ b)
    assert matmul_flops(g, a, b) == 2 * 4 * 16 * 8


def test_cond_takes_max_branch():
    def f(pred, a, b):
        return lax.cond(pred, lambda: a @ b, lambda: jnp.zeros((4, 16)))

    a = jnp.zeros((4, 8))
    b = jnp.zeros((8, 16))
    assert matmul_flops(f, True, a, b) == 2 * 4 * 16 * 8
