"""Benchmark: flagship 48 kHz inference real-time factor on one TPU chip.

Headline metric = mean 1/RTF for a 2.555 s / 48 kHz segment, batch 1 —
directly comparable to the reference's RTF_RECIPROCAL column
(results_48kHz.csv, measured on a V100 32 GB at 27.8–59.8× real-time;
BASELINE.md). vs_baseline uses the reference's best (59.8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_BEST_RTF_RECIPROCAL = 59.8


def main():
    from vm_asr_tpu.models import get_model
    from __graft_entry__ import _flagship_config

    config = _flagship_config()
    generator = get_model(config)["generator"]

    seg = int(config.DATA.SEGMENT * config.DATA.TARGET_SR)  # 122640
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1, seg)).astype(np.float32) * 0.1)
    hf = jnp.full((1,), 171, jnp.int32)

    params = jax.jit(generator.init)(jax.random.PRNGKey(0), x, hf)["params"]

    @jax.jit
    def forward(params, x, hf):
        return generator.apply({"params": params}, x, hf, deterministic=True)

    @jax.jit
    def chained(params, x, hf):
        # Feed the output back as the next input: every iteration is a real,
        # distinct execution (runtime-level result caching can't short-cut),
        # like streaming inference.
        y = forward(params, x, hf)
        return x + 1e-6 * y

    # warmup / compile
    chained(params, x, hf).block_until_ready()
    x = chained(params, x, hf)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        x = chained(params, x, hf)
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    audio_seconds = config.DATA.SEGMENT
    rtf_recip = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "rtf_reciprocal_48k_batch1",
                "value": round(rtf_recip, 3),
                "unit": "x_realtime",
                "vs_baseline": round(rtf_recip / V100_BEST_RTF_RECIPROCAL, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
