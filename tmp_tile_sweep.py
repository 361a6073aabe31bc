import time, itertools
import jax, jax.numpy as jnp, numpy as np
from vm_asr_tpu.ops.selective_scan_fused import _fused_fwd_pallas

rng = np.random.default_rng(0)
SHAPES = [(8, 16384, 4, 32), (8, 4096, 4, 64)]  # stage0/stage1 at batch 8
cases = []
for (B, L, K, D) in SHAPES:
    KD = K*D
    u = jnp.asarray(rng.standard_normal((B, L, KD)), jnp.float32)
    dts = jnp.asarray(rng.standard_normal((B, L, KD))*0.5, jnp.float32)
    bs = jnp.asarray(rng.standard_normal((B, L, K)), jnp.float32)
    cs = jnp.asarray(rng.standard_normal((B, L, K)), jnp.float32)
    a = -jnp.asarray(rng.random(KD)*2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(KD)*0.2, jnp.float32)
    dsk = jnp.asarray(rng.standard_normal(KD), jnp.float32)
    cases.append(((B, L, K, D), (u, dts, bs, cs, a, bias, dsk)))

def bench(fn, args, n=30):
    u = args[0]
    y, _ = fn(u, *args[1:])
    jax.block_until_ready(y)
    x = u
    for _ in range(10):
        y, _ = fn(x, *args[1:])
        x = x + 1e-6*y
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        y, _ = fn(x, *args[1:])
        x = x + 1e-6*y
    jax.block_until_ready(x)
    return (time.perf_counter()-t0)/n

for (shape, args) in cases:
    B, L, K, D = shape
    print(f"shape B{B} L{L} K{K} D{D}:")
    for chunk, d_tile in itertools.product([256, 512, 1024], [128, 256]):
        if d_tile > K*D: continue
        try:
            fn = lambda u, dts, bs, cs, a, bias, dsk, c=chunk, dt=d_tile: \
                _fused_fwd_pallas(u, dts, bs, cs, a, bias, dsk, 4, chunk=c, d_tile=dt)
            dt_s = bench(fn, args)
            gbps = (3*B*L*K*D*4) / dt_s / 1e9
            print(f"  chunk={chunk} d_tile={d_tile}: {dt_s*1e3:.3f} ms ({gbps:.0f} GB/s)")
        except Exception as e:
            print(f"  chunk={chunk} d_tile={d_tile}: FAIL {str(e)[:80]}")
