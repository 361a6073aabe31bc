"""A/B: MODEL.VSSM.SCAN_FP32_IO cost at flagship geometry (TPU).

Measures the batch-8 flagship forward with the scan boundary in bf16 IO
(default) vs fp32 IO (reference force_fp32 semantics, vmamba.py:842-848),
interleaved off→on→off so tunnel drift shows up as off/off2 disagreement.
Honest differential D2H-anchored protocol throughout.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(generator, params, x, hf, iters=20):
    from vm_asr_tpu.core.profiling import median_window_dt

    @jax.jit
    def chained(p, s, hf):
        y = generator.apply({"params": p}, s, hf, deterministic=True)
        return s + 1e-6 * y

    chained(params, x, hf).block_until_ready()
    for _ in range(30):
        x = chained(params, x, hf)
    x.block_until_ready()
    dt, _ = median_window_dt(lambda s: chained(params, s, hf), x, iters=iters)
    return dt


def main():
    from vm_asr_tpu.models import get_model
    from vm_asr_tpu.ops import scan_api
    from __graft_entry__ import _flagship_config, _visible_devices

    if _visible_devices(timeout_s=180) == 0:
        print("no devices", file=sys.stderr)
        return 2

    config = _flagship_config(batch_size=8)
    generator = get_model(config)["generator"]
    seg = int(config.DATA.SEGMENT * config.DATA.TARGET_SR)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 1, seg)).astype(np.float32) * 0.1)
    hf = jnp.full((8,), 171, jnp.int32)
    params = jax.jit(generator.init)(jax.random.PRNGKey(0), x[:1], hf[:1])["params"]

    results = {}
    for tag, flag in (("bf16_io", False), ("fp32_io", True), ("bf16_io_2", False)):
        scan_api.set_scan_fp32_io(flag)
        dt = measure(generator, params, x, hf)
        results[tag] = dt
        print(json.dumps({"variant": tag, "ms_per_batch8_fwd": round(dt * 1e3, 3)}),
              flush=True)
    scan_api.set_scan_fp32_io(False)
    drift = abs(results["bf16_io"] - results["bf16_io_2"]) / results["bf16_io"]
    cost = (results["fp32_io"] - min(results["bf16_io"], results["bf16_io_2"])) \
        / min(results["bf16_io"], results["bf16_io_2"])
    print(json.dumps({"fp32_io_cost_pct": round(100 * cost, 2),
                      "offoff_drift_pct": round(100 * drift, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
