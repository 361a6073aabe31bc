"""Built-in equivalence checks and micro-benchmarks.

The reference bundles a CHECKS suite run via `python model/vmamba.py`
(vmamba.py:2303-2832: kernel-vs-reference equivalence, cross-scan grad
checks, VSSBlock latency with triton.testing.do_bench, profiler scaffold).
TPU equivalent, run via:

    python -m vm_asr_tpu.checks [--skip-bench]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def check_scan_equivalence(impl: str) -> None:
    """Pallas kernel vs jnp associative-scan reference (fwd + grads)
    (counterpart of check_vssm1_ssoflex_equals_mambassm, vmamba.py:2496)."""
    from vm_asr_tpu.ops import linear_recurrence, linear_recurrence_ref

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.2, 1.0, (4, 777, 96)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4, 777, 96)).astype(np.float32))
    h = linear_recurrence(a, b, impl)
    href = linear_recurrence_ref(a, b)
    fwd_diff = float(jnp.abs(h - href).max())

    w = jnp.asarray(rng.standard_normal((4, 777, 96)).astype(np.float32))
    ga, gb = jax.grad(lambda a_, b_: jnp.sum(linear_recurrence(a_, b_, impl) * w),
                      argnums=(0, 1))(a, b)
    ga_r, gb_r = jax.grad(lambda a_, b_: jnp.sum(linear_recurrence_ref(a_, b_) * w),
                          argnums=(0, 1))(a, b)
    da = float(jnp.abs(ga - ga_r).max())
    db = float(jnp.abs(gb - gb_r).max())
    print(f"[scan {impl}] fwd max|Δ|={fwd_diff:.2e} da={da:.2e} db={db:.2e}")
    assert fwd_diff < 1e-4 and da < 1e-3 and db < 1e-3


def check_fused_backward(impl: str) -> None:
    """Fused backward kernel vs the replay-through-XLA oracle on the
    compiled backend, across chunk boundaries (counterpart of the CUDA
    bwd-vs-reference grid in test_selective_scan.py:545-563)."""
    from vm_asr_tpu.ops import selective_scan_fused as ssf

    rng = np.random.default_rng(2)
    b, l, k, d = 2, 1500, 4, 32  # > 2 chunks at the default chunking
    kd = k * d
    u = jnp.asarray(rng.standard_normal((b, l, kd)).astype(np.float32))
    dts = jnp.asarray(rng.standard_normal((b, l, kd)).astype(np.float32) * 0.5)
    bs = jnp.asarray(rng.standard_normal((b, l, k)).astype(np.float32))
    cs = jnp.asarray(rng.standard_normal((b, l, k)).astype(np.float32))
    a = -jnp.asarray(rng.random(kd).astype(np.float32) * 2)
    bias = jnp.asarray(rng.standard_normal(kd).astype(np.float32) * 0.2)
    dsk = jnp.asarray(rng.standard_normal(kd).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((b, l, kd)).astype(np.float32))

    interp = impl == "interpret"
    _, res = ssf._fused_fwd(u, dts, bs, cs, a, bias, dsk, k, interp)
    worst = 0.0
    for got, ref in zip(ssf._fused_bwd(k, interp, res, dy),
                        ssf._fused_bwd_xla(k, interp, res, dy)):
        scale = max(float(jnp.abs(ref).max()), 1e-9)
        worst = max(worst, float(jnp.abs(got - ref).max()) / scale)
    print(f"[fused bwd {impl}] worst grad rel|Δ|={worst:.2e}")
    assert worst < 1e-3


def check_kernel_grid(impl: str) -> None:
    """Reference-grade kernel grid on the compiled backend: dtype
    {fp32, bf16} × L {64, 500, 777, 2048, 4096, 16384} × chunk {256, 512},
    forward vs the jnp reference and backward vs the replay-through-XLA
    oracle (counterpart of the reference's parametrized sweep,
    kernels/selective_scan/test_selective_scan.py:545-563). Output is
    captured as CHECKS_r{N}.txt artifacts."""
    from vm_asr_tpu.ops import selective_scan_fused as ssf
    from vm_asr_tpu.ops.scan_api import selective_scan

    interp = impl == "interpret"
    rng = np.random.default_rng(3)
    k, d = 4, 32
    kd = k * d
    worst_fwd = worst_bwd = 0.0
    for l in (64, 500, 777, 2048, 4096, 16384):
        # reference forward at this geometry (fp32, unfused path)
        u4 = jnp.asarray(rng.standard_normal((1, l, k, d)).astype(np.float32))
        dt4 = jnp.asarray(
            rng.standard_normal((1, l, k, d)).astype(np.float32) * 0.5)
        A = -jnp.asarray(rng.random((k, d, 1)).astype(np.float32) * 2)
        Bs = jnp.asarray(rng.standard_normal((1, l, k, 1)).astype(np.float32))
        Cs = jnp.asarray(rng.standard_normal((1, l, k, 1)).astype(np.float32))
        Dk = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
        bias = jnp.asarray(
            rng.standard_normal((k, d)).astype(np.float32) * 0.2)
        ref = np.asarray(
            selective_scan(u4, dt4, A, Bs, Cs, Dk, bias, True, impl="ref"),
            np.float32,
        )
        dy = jnp.asarray(rng.standard_normal((1, l, kd)).astype(np.float32))

        for dtype in (jnp.float32, jnp.bfloat16):
            uf = u4.reshape(1, l, kd).astype(dtype)
            dtf = dt4.reshape(1, l, kd).astype(dtype)
            bsf = Bs[..., 0].astype(dtype)
            csf = Cs[..., 0].astype(dtype)
            af = A[..., 0].reshape(kd)
            biasf = bias.reshape(kd)
            dkf = Dk.reshape(kd)
            # bf16 ref: the unfused path on the SAME quantised inputs
            if dtype == jnp.bfloat16:
                refd = np.asarray(selective_scan(
                    uf.reshape(1, l, k, d), dtf.reshape(1, l, k, d), A,
                    bsf[..., None], csf[..., None], Dk, bias, True,
                    impl="ref"), np.float32)
                tol = 3e-2
            else:
                refd, tol = ref, 1e-3
            fdiff = 0.0  # max across the chunk loop, so the printed
            for chunk in (256, 512):  # per-(L,dtype) bound is the worst case
                y, ckpt = ssf._fused_fwd_pallas(
                    uf, dtf, bsf, csf, af, biasf, dkf, k,
                    chunk=chunk, interpret=interp)
                cdiff = float(np.abs(
                    np.asarray(y, np.float32) - refd.reshape(1, l, kd)
                ).max()) / max(float(np.abs(refd).max()), 1e-9)
                fdiff = max(fdiff, cdiff)
                worst_fwd = max(worst_fwd, cdiff)
                assert cdiff < tol, (l, dtype, chunk, cdiff)

            # backward vs the XLA-replay oracle (default chunking)
            _, res = ssf._fused_fwd(uf, dtf, bsf, csf, af, biasf, dkf, k,
                                    interp)
            bdiff = 0.0
            for got, want in zip(
                ssf._fused_bwd(k, interp, res, dy.astype(dtype)),
                ssf._fused_bwd_xla(k, interp, res, dy.astype(dtype)),
            ):
                scale = max(float(jnp.abs(want).max()), 1e-6)
                bdiff = max(bdiff, float(jnp.abs(
                    got.astype(jnp.float32) - want.astype(jnp.float32)
                ).max()) / scale)
            worst_bwd = max(worst_bwd, bdiff)
            btol = 1e-3 if dtype == jnp.float32 else 4e-2
            assert bdiff < btol, (l, dtype, bdiff)
            dn = "f32" if dtype == jnp.float32 else "bf16"
            print(f"[grid {impl}] L={l:<6} {dn:<4} "
                  f"fwd rel|Δ|≤{fdiff:.2e} bwd rel|Δ|≤{bdiff:.2e}")
    print(f"[grid {impl}] worst fwd={worst_fwd:.2e} bwd={worst_bwd:.2e}")


def check_cross_scan() -> None:
    """Adjointness + grad test (counterpart of check_csm_triton,
    vmamba.py:2558-2724)."""
    from vm_asr_tpu.ops import cross_merge, cross_scan

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 7)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 30, 4, 7)).astype(np.float32))
    lhs = float(jnp.vdot(cross_scan(x), y))
    rhs = float(jnp.vdot(x.reshape(2, 30, 7), cross_merge(y, 6, 5)))
    print(f"[cross-scan] adjointness |Δ|={abs(lhs - rhs):.2e}")
    assert abs(lhs - rhs) < 1e-3
    g = jax.grad(lambda v: jnp.sum(cross_scan(v) * y))(x)
    g_ref = cross_merge(y, 6, 5).reshape(x.shape)
    print(f"[cross-scan] grad max|Δ|={float(jnp.abs(g - g_ref).max()):.2e}")


def bench_vssblock() -> None:
    """VSSBlock latency (counterpart of check_vssblock, vmamba.py:2745-2793)."""
    from vm_asr_tpu.core.profiling import benchmark
    from vm_asr_tpu.models import VSSBlock

    block = VSSBlock(hidden_dim=96, drop_path=0.0)
    x = jnp.zeros((4, 56, 56, 96), jnp.float32)
    params = jax.jit(block.init)(jax.random.PRNGKey(0), x)
    stats = benchmark(lambda p, v: block.apply(p, v), params, x, iters=10,
                      chain=lambda out, p, v: (p, v + 1e-6 * out))
    print(f"[vssblock] {stats['seconds_per_call'] * 1e3:.2f} ms/call "
          f"(B=4, 56×56×96, {jax.default_backend()})")


def bench_scan() -> None:
    from vm_asr_tpu.core.profiling import benchmark
    from vm_asr_tpu.ops import linear_recurrence, linear_recurrence_ref

    impl = "pallas" if jax.default_backend() != "cpu" else "ref"
    a = jnp.full((16, 16384, 128), 0.9, jnp.float32)
    b = jnp.ones((16, 16384, 128), jnp.float32)
    feed = lambda out, a_, b_: (a_, b_ + 1e-6 * out)  # defeat memoization
    s1 = benchmark(lambda a_, b_: linear_recurrence(a_, b_, impl), a, b,
                   iters=10, chain=feed)
    s2 = benchmark(linear_recurrence_ref, a, b, iters=10, chain=feed)
    n_bytes = 3 * a.size * 4
    bw = n_bytes / s1["seconds_per_call"] / 1e9
    print(f"[scan] {impl}: {s1['seconds_per_call'] * 1e3:.2f} ms "
          f"({bw:.0f} GB/s eff) | xla assoc-scan: "
          f"{s2['seconds_per_call'] * 1e3:.2f} ms")


def main(argv=None) -> int:
    p = argparse.ArgumentParser("vm_asr_tpu checks")
    p.add_argument("--skip-bench", action="store_true")
    p.add_argument("--grid", action="store_true",
                   help="full dtype × seqlen × chunk kernel grid "
                   "(compile-heavy; artifact CHECKS_r{N}.txt)")
    args = p.parse_args(argv)

    impl = "pallas" if jax.default_backend() != "cpu" else "interpret"
    check_scan_equivalence(impl)
    check_fused_backward(impl)
    check_cross_scan()
    if args.grid:
        check_kernel_grid(impl)
    if not args.skip_bench:
        bench_scan()
        bench_vssblock()
    print("all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
