"""A/B the fused selective-scan kernel variants on real TPU (VERDICT r04
item 5): chunk size sweep x two-level in-chunk scan sub-chunk sweep.

Each variant runs in a subprocess (VM_ASR_SCAN_SUBCHUNK is read once at
import; jit caches are per-process), timing fwd and fwd+bwd at the
production stage-0 shape (8, 16384, 128) bf16 under the honest diff-D2H
protocol (bench.median_window_dt). Results print one JSON line per variant;
pass --quick for a reduced grid.

Usage: python scripts/ab_scan_variants.py [--quick] [--iters N]
"""

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys
import numpy as np
import jax, jax.numpy as jnp

chunk = int(sys.argv[1])
iters = int(sys.argv[2])
import importlib
# sys.modules lookup: the ops package rebinds the `linear_recurrence`
# attribute to its same-named custom_vjp function, so plain imports get
# the function, not the module.
_lr = importlib.import_module("vm_asr_tpu.ops.linear_recurrence")
sub_fwd, sub_bwd = _lr._SUBCHUNK_FWD, _lr._SUBCHUNK_BWD

from vm_asr_tpu.core.profiling import median_window_dt
from vm_asr_tpu.ops.selective_scan_fused import (
    _fused_fwd_pallas, _fused_bwd_pallas)

batch, l, kd, k = 8, 16384, 128, 4
rng = np.random.default_rng(0)
io = jnp.bfloat16
u = jnp.asarray(rng.standard_normal((batch, l, kd)), io)
dts = jnp.asarray(rng.standard_normal((batch, l, kd)) * 0.1, io)
bs = jnp.asarray(rng.standard_normal((batch, l, k)), jnp.float32)
cs = jnp.asarray(rng.standard_normal((batch, l, k)), jnp.float32)
a_neg = jnp.asarray(-np.exp(rng.standard_normal(kd) * 0.1), jnp.float32)
bias = jnp.asarray(rng.standard_normal(kd) * 0.01, jnp.float32)
dsk = jnp.asarray(rng.standard_normal(kd), jnp.float32)

@jax.jit
def fwd_chained(u_, dts_, bs_):
    y, _ = _fused_fwd_pallas(u_, dts_, bs_, cs, a_neg, bias, dsk, k,
                             chunk=chunk)
    return y, bs_ + (1e-6 * y.mean()).astype(bs_.dtype)

@jax.jit
def bwd_chained(u_, dts_, bs_):
    y, ckpt = _fused_fwd_pallas(u_, dts_, bs_, cs, a_neg, bias, dsk, k,
                                chunk=chunk)
    dy = jnp.ones_like(y)
    du, ddts, *_ = _fused_bwd_pallas(u_, dts_, bs_, cs, dy, ckpt,
                                     a_neg, bias, dsk, k, chunk=chunk)
    return du, bs_ + (1e-6 * du.mean()).astype(bs_.dtype)

out = {"chunk": chunk, "sub_fwd": sub_fwd, "sub_bwd": sub_bwd}
for name, fn in (("fwd", fwd_chained), ("fwd_bwd", bwd_chained)):
    y, cur = fn(u, dts, bs)
    jax.block_until_ready(y)
    for _ in range(10):
        y, cur = fn(u, dts, cur)
    jax.block_until_ready(y)
    dt, _ = median_window_dt(lambda s: fn(u, dts, s[1]), (y, cur),
                             iters=iters)
    out[f"{name}_ms"] = round(dt * 1e3, 3)
print("RESULT " + json.dumps(out))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunks", type=str, default="")
    ap.add_argument("--subs", type=str, default="",
                    help="shared fwd=bwd sub sizes, e.g. 0,16,32")
    ap.add_argument("--combos", type=str, default="",
                    help="explicit fwd:bwd pairs, e.g. 16:0,16:32,0:32")
    args = ap.parse_args()

    chunks = ([int(c) for c in args.chunks.split(",")] if args.chunks
              else ([256, 512] if args.quick else [64, 128, 256, 512, 1024]))
    if args.combos:
        combos = [tuple(int(x) for x in c.split(":"))
                  for c in args.combos.split(",")]
    else:
        subs = ([int(s) for s in args.subs.split(",")] if args.subs
                else ([0, 32] if args.quick else [0, 8, 16, 32, 64]))
        combos = [(s, s) for s in subs]

    results = []
    for chunk in chunks:
        for sub_fwd, sub_bwd in combos:
            if max(sub_fwd, sub_bwd) >= chunk:
                continue
            env = dict(os.environ)
            env.pop("VM_ASR_SCAN_SUBCHUNK", None)
            env["VM_ASR_SCAN_SUBCHUNK_FWD"] = str(sub_fwd)
            env["VM_ASR_SCAN_SUBCHUNK_BWD"] = str(sub_bwd)
            try:
                p = subprocess.run(
                    [sys.executable, "-c", CHILD, str(chunk),
                     str(args.iters)],
                    env=env, capture_output=True, text=True,
                    timeout=int(os.environ.get(
                        "VM_ASR_AB_CHILD_TIMEOUT", "900")),
                )
            except subprocess.TimeoutExpired:
                print(json.dumps({"chunk": chunk, "sub_fwd": sub_fwd,
                                  "sub_bwd": sub_bwd, "error": "timeout"}))
                continue
            line = next((ln for ln in p.stdout.splitlines()
                         if ln.startswith("RESULT ")), None)
            if line is None:
                print(json.dumps({"chunk": chunk, "sub_fwd": sub_fwd,
                                  "sub_bwd": sub_bwd,
                                  "error": p.stderr[-500:]}))
                continue
            rec = json.loads(line[len("RESULT "):])
            results.append(rec)
            print(json.dumps(rec), flush=True)

    if results:
        best_f = min(results, key=lambda r: r["fwd_ms"])
        best_b = min(results, key=lambda r: r["fwd_bwd_ms"])
        print(json.dumps({"best_fwd": best_f, "best_fwd_bwd": best_b}))


if __name__ == "__main__":
    main()
