"""Benchmark: flagship 48 kHz inference + training throughput on one TPU chip.

Line 1 (headline) = mean 1/RTF for a 2.555 s / 48 kHz segment, batch 1 —
directly comparable to the reference's RTF_RECIPROCAL column
(results_48kHz.csv, measured on a V100 32 GB at 27.8–59.8× real-time;
BASELINE.md). vs_baseline uses the reference's best (59.8).

Line 2 = training real-time factor (audio-seconds trained per wall-second)
for the flagship 48 kHz GAN config (MPD, batch 8, full jitted
generator+discriminator step). The reference publishes no training
wall-clock numbers; vs_baseline is relative to this repo's first HONEST
figure (round 4's 40.5× under the diff-D2H protocol) so progression is
visible across rounds, plus a measured gen/STFT/MPD ms decomposition.

Each metric is one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Robustness (round-4 hardening — a transient tunnel outage must not zero the
round's perf record, which is what happened to BENCH_r03):
- the device probe retries with backoff across a ~40-minute window instead
  of one 300 s attempt;
- every stage runs independently — a failure in one still emits the rest;
- each successful metric line is persisted to ``artifacts/bench_cache.json``;
  if no device ever appears, the cached last-honest lines are re-emitted
  tagged ``"stale": true`` so the record degrades instead of vanishing.
"""

import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from vm_asr_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()  # TPU executables also serialise; repeat runs skip compile

V100_BEST_RTF_RECIPROCAL = 59.8

CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "artifacts", "bench_cache.json")


# Canonical honest-timing protocol (differential, D2H-anchored — see its
# docstring for why a bare block_until_ready loop lies over the tunnel).
from vm_asr_tpu.core.profiling import median_window_dt  # noqa: E402


def emit(record: dict) -> None:
    """Print one metric line AND persist it as the last-honest value."""
    print(json.dumps(record), flush=True)
    try:
        cache = {}
        if os.path.isfile(CACHE_PATH):
            with open(CACHE_PATH) as f:
                cache = json.load(f)
        cache[record["metric"]] = record
        os.makedirs(os.path.dirname(CACHE_PATH), exist_ok=True)
        with open(CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1)
    except Exception:  # cache IO must never kill a live metric
        traceback.print_exc(file=sys.stderr)


def emit_stale_cache() -> int:
    """Device never appeared: re-emit the last honest record, marked stale."""
    if not os.path.isfile(CACHE_PATH):
        print("bench: no device and no cached results — nothing to report",
              file=sys.stderr)
        return 2
    with open(CACHE_PATH) as f:
        cache = json.load(f)
    for record in cache.values():
        record = dict(record)
        record["stale"] = True  # measured in an earlier session; TPU now down
        print(json.dumps(record), flush=True)
    return 0


def probe_devices(total_window_s: float = 2400.0, probe_timeout_s: float = 150.0,
                  retry_sleep_s: float = 120.0) -> int:
    """Probe for JAX devices, retrying across a generous window.

    jax backend init blocks FOREVER (uninterruptibly) when the tunnel is
    down, so the probe runs in a killable subprocess
    (__graft_entry__._visible_devices). One 300 s attempt cost round 3 its
    artifact; transient outages deserve retries.
    """
    from __graft_entry__ import _visible_devices

    deadline = time.monotonic() + total_window_s
    attempt = 0
    while True:
        attempt += 1
        n = _visible_devices(timeout_s=probe_timeout_s)
        if n > 0:
            return n
        if time.monotonic() + retry_sleep_s + probe_timeout_s > deadline:
            return 0
        print(f"bench: probe attempt {attempt} saw no devices; "
              f"retrying in {retry_sleep_s:.0f}s", file=sys.stderr)
        time.sleep(retry_sleep_s)


def main():
    from vm_asr_tpu.models import get_model
    from __graft_entry__ import _flagship_config

    if probe_devices() == 0:
        print("bench: no JAX devices reachable (TPU tunnel down?) — "
              "emitting cached last-honest results if any", file=sys.stderr)
        return emit_stale_cache()

    config = _flagship_config()
    stages = []
    try:
        stages = _inference_stages(get_model, config)
    except Exception:
        traceback.print_exc(file=sys.stderr)
    # Stages are independent: one failure must not drop the others.
    for stage in stages + [bench_train, bench_scan_roofline]:
        try:
            stage()
        except Exception:
            traceback.print_exc(file=sys.stderr)
    return 0


def _inference_stages(get_model, config):
    """Run the headline batch-1 metric; return the remaining inference
    stages (they share the generator/params built here)."""
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

    # warmup: compile, then two full discarded timing loops — the remote-TPU
    # tunnel's first bursts of executions run far below steady state.
    chained(params, x, hf).block_until_ready()
    for _ in range(40):
        x = chained(params, x, hf)
    x.block_until_ready()

    dt, x = median_window_dt(lambda s: chained(params, s, hf), x, iters=20)

    audio_seconds = config.DATA.SEGMENT
    rtf_recip = audio_seconds / dt
    emit(
        {
            "metric": "rtf_reciprocal_48k_batch1",
            "value": round(rtf_recip, 3),
            "unit": "x_realtime",
            "vs_baseline": round(rtf_recip / V100_BEST_RTF_RECIPROCAL, 3),
            "device": jax.devices()[0].device_kind,
            "timing": "diff_d2h_v3",  # differential, D2H-anchored (r03)
        }
    )
    return [
        lambda: bench_stacked(config, params, x, hf),
        lambda: bench_full_clip(generator, params, config),
        lambda: bench_batched(generator, params, config),
    ]


def bench_stacked(config, params, x, hf):
    """Batch-1 inference through the stream-stacked execution model
    (models.unet.DualStreamStackedMambaUNet): identical outputs, ~49% fewer
    traced ops — the TPU answer to the dual-stream architecture's op count
    (a TPU core runs independent small ops sequentially)."""
    from vm_asr_tpu.models import to_stacked

    # Reuse the factory conversion so the latent/quirk weight-stacking
    # rules stay in one place (it reads the flag from the config). Clone so
    # the flag cannot leak into later bench stages (ADVICE r03).
    config = config.clone()
    config.MODEL.VSSM.STACKED_EXECUTION = True
    stacked, sp = to_stacked(config, None, params)
    assert stacked is not None and "core" in sp, "stacked conversion failed"

    @jax.jit
    def chained(p, x, hf):
        y = stacked.apply({"params": p}, x, hf, deterministic=True)
        return x + 1e-6 * y

    chained(sp, x, hf).block_until_ready()
    for _ in range(40):
        x = chained(sp, x, hf)
    x.block_until_ready()
    dt, x = median_window_dt(lambda s: chained(sp, s, hf), x, iters=20)

    rtf_recip = config.DATA.SEGMENT / dt
    emit(
        {
            "metric": "rtf_reciprocal_48k_batch1_stacked",
            "value": round(rtf_recip, 3),
            "unit": "x_realtime",
            "vs_baseline": round(rtf_recip / V100_BEST_RTF_RECIPROCAL, 3),
        }
    )


def bench_full_clip(generator, params, config, n_segments: int = 3,
                    iters: int = 10):
    """Device-resident FULL-CLIP eval RTF (reference tester.py:92-140).

    The round-3 eval CSV recorded 7.5-8.5× real-time for full clips — but
    that number was dominated by tunnel H2D (~0.9 s per batch over HTTP),
    not compute. This stage answers "what does the framework itself do for
    a full clip?": the whole unfold → per-segment forward → mean-fold
    pipeline runs as ONE jitted program on pre-staged device data, timed
    under the honest protocol. Clip length exactly tiles n_segments windows
    (unfold drops trailing samples, matching torch.Tensor.unfold).
    """
    from vm_asr_tpu.dsp import fold_audio, unfold_audio

    seg = int(config.DATA.SEGMENT * config.DATA.TARGET_SR)
    overlap = int(config.TEST.OVERLAP)
    step = seg - overlap
    t = seg + (n_segments - 1) * step
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 1, t)).astype(np.float32) * 0.1)
    hf = jnp.full((1,), 171, jnp.int32)
    hf_b = jnp.full((n_segments,), 171, jnp.int32)

    @jax.jit
    def full_clip(params, x, hf_b):
        segments = unfold_audio(x, seg, overlap)  # (1, 1, S, seg)
        seg_batch = segments.reshape(n_segments, 1, seg)
        out = generator.apply({"params": params}, seg_batch, hf_b,
                              deterministic=True)
        out = out.reshape(1, 1, n_segments, seg)
        y = fold_audio(out, t, seg, overlap)
        return x + 1e-6 * y  # chain: each iteration is a distinct execution

    full_clip(params, x, hf_b).block_until_ready()
    for _ in range(20):
        x = full_clip(params, x, hf_b)
    x.block_until_ready()
    dt, x = median_window_dt(lambda s: full_clip(params, s, hf_b), x,
                             iters=iters)

    audio_seconds = t / config.DATA.TARGET_SR
    rtf_recip = audio_seconds / dt
    emit(
        {
            "metric": "rtf_reciprocal_48k_fullclip_device",
            "value": round(rtf_recip, 3),
            "unit": "x_realtime",
            "vs_baseline": round(rtf_recip / V100_BEST_RTF_RECIPROCAL, 3),
            "clip_seconds": round(audio_seconds, 3),
            "n_segments": n_segments,
            "timing": "diff_d2h_v3",
        }
    )


# TPU v5e (v5 lite): 197 TFLOP/s bf16 peak per chip.
V5E_BF16_PEAK_TFLOPS = 197.0


def bench_batched(generator, params, config, batch: int = 32, iters: int = 20):
    """Batched inference throughput + honest MFU.

    Batch-1 is dispatch-bound (~0.4 ms/segment leaves the MXU mostly idle);
    this measures what the chip sustains when segments are batched — the
    serving configuration — and reports achieved MXU TFLOP/s against the
    v5e bf16 peak. The FLOP numerator is the ANALYTIC dot/conv count from
    the jaxpr (core.profiling.matmul_flops): XLA's cost_analysis() flops
    over-count producers that fusion duplicates into several consumers
    (it read 105% "of peak" here — non-physical), so it is not used.
    """
    from vm_asr_tpu.core.profiling import matmul_flops

    seg = int(config.DATA.SEGMENT * config.DATA.TARGET_SR)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((batch, 1, seg)).astype(np.float32) * 0.1)
    hf = jnp.full((batch,), 171, jnp.int32)

    @jax.jit
    def forward(params, x, hf):
        return generator.apply({"params": params}, x, hf, deterministic=True)

    @jax.jit
    def chained(params, x, hf):
        y = forward(params, x, hf)
        return x + 1e-6 * y

    flops = matmul_flops(forward, params, x, hf)

    chained(params, x, hf).block_until_ready()
    for _ in range(30):
        x = chained(params, x, hf)
    x.block_until_ready()

    dt, x = median_window_dt(lambda s: chained(params, s, hf), x, iters=iters)

    rtf_recip = batch * config.DATA.SEGMENT / dt
    tflops = flops / dt / 1e12
    emit(
        {
            "metric": f"rtf_reciprocal_48k_batch{batch}",
            "value": round(rtf_recip, 3),
            "unit": "x_realtime",
            "vs_baseline": round(rtf_recip / V100_BEST_RTF_RECIPROCAL, 3),
            "segments_per_s": round(batch / dt, 2),
            "mxu_tflops": round(tflops, 2),
            "mfu_pct_v5e_bf16": round(100.0 * tflops / V5E_BF16_PEAK_TFLOPS, 2),
        }
    )


# First HONEST training figure (diff-D2H protocol, BENCH_r04). The previous
# baseline (round-1's "490x") was proven in round 3 to be a tunnel-ack
# artifact; comparing against it made honest numbers read as regressions
# (VERDICT r04 item 4).
R04_HONEST_TRAIN_RT = 40.545


def _train_step_dt(config, batch_size: int, iters: int = 10) -> float:
    """Median seconds/step of the jitted train step for ``config`` (honest
    protocol: chained states, discarded warm-up burst, diff-D2H window)."""
    from vm_asr_tpu.data import DataPipeline, DegradingSampler, SyntheticVCTK
    from vm_asr_tpu.models import get_model
    from vm_asr_tpu.parallel import make_mesh, shard_batch
    from vm_asr_tpu.train.trainer import Trainer

    models = get_model(config)
    ds = SyntheticVCTK(n_items=batch_size, sr=48000,
                       duration=config.DATA.SEGMENT + 0.01)
    sampler = DegradingSampler(ds, config, training=True)
    loader = DataPipeline(sampler, batch_size=batch_size, num_workers=2)
    mesh = make_mesh(dp=1, devices=jax.devices()[:1])
    trainer = Trainer(config, models, loader, None, mesh=mesh)

    batch = next(iter(loader))
    device_batch = shard_batch(
        {
            "wave_input": batch.wave_input,
            "wave_target": batch.wave_target,
            "highcut": batch.highcut,
        },
        mesh,
    )
    rng = jax.random.PRNGKey(0)
    gen_state, disc_states = trainer.gen_state, trainer.disc_states

    # compile + a full discarded warm-up loop (state chaining ⇒ every step is
    # a distinct execution; runtime memoization can't short-cut, and the
    # tunnel needs a burst before reaching steady state)
    for _ in range(10):
        rng, step_rng = jax.random.split(rng)
        gen_state, disc_states, metrics = trainer.train_step(
            gen_state, disc_states, device_batch, step_rng
        )
    jax.block_until_ready(metrics)

    def step(state):
        g, d, r = state
        r, step_rng = jax.random.split(r)
        g, d, metrics = trainer.train_step(g, d, device_batch, step_rng)
        return (g, d, r)

    dt, _ = median_window_dt(step, (gen_state, disc_states, rng), iters=iters)
    return dt


def bench_train(batch_size: int = 8, iters: int = 10):
    """Full GAN training step (generator fwd+bwd+opt, MPD disc step), plus a
    measured decomposition: the same step with GAN off (gen+L1+STFT) and with
    L1 only (gen) isolates the marginal ms of the STFT loss and of the MPD
    (2 fwd + D step) by subtraction."""
    from __graft_entry__ import _flagship_config

    def cfg(gan=True, losses=None):
        c = _flagship_config(batch_size=batch_size, gan=gan)
        c.OUTPUT = "/tmp/vm_asr_tpu_bench"
        # Measure the optimized training configuration: fused decoder passes
        # (MODEL.VSSM.FUSE_STREAMS — same per-sample math, fewer dispatches).
        c.MODEL.VSSM.FUSE_STREAMS = True
        if losses is not None:
            c.TRAIN.LOSSES.GEN = list(losses)
        return c

    dt = _train_step_dt(cfg(gan=True), batch_size, iters)
    record = {
        "metric": "train_rt_factor_48k_MPD_batch8",
        "value": round(batch_size * 2.555 / dt, 3),
        "unit": "x_realtime",
        # NOT reference-relative: the reference publishes no training
        # wall-clock, so the baseline is this repo's first honest figure.
        "vs_baseline": round(batch_size * 2.555 / dt / R04_HONEST_TRAIN_RT, 3),
        "baseline_is": "self_round4_honest_40.5x",
        "ms_per_step": round(dt * 1e3, 1),
        "fuse_streams": True,
    }
    try:
        dt_nogan = _train_step_dt(cfg(gan=False), batch_size, iters)
        dt_l1 = _train_step_dt(cfg(gan=False, losses=["l1"]), batch_size, iters)
        record["decomposition_ms"] = {
            "generator_fwd_bwd_opt": round(dt_l1 * 1e3, 1),
            "multi_res_stft_loss": round((dt_nogan - dt_l1) * 1e3, 1),
            "mpd_2fwd_plus_dstep": round((dt - dt_nogan) * 1e3, 1),
        }
    except Exception:  # decomposition is best-effort; headline must survive
        traceback.print_exc(file=sys.stderr)
    emit(record)


# TPU v5e (v5 lite): 819 GB/s HBM bandwidth per chip.
V5E_HBM_PEAK_GBS = 819.0


def bench_scan_roofline(batch: int = 8, l: int = 16384, kd: int = 128,
                        iters: int = 20):
    """HBM-roofline check for the fused selective-scan kernel (fwd & bwd).

    The selective scan is bandwidth-bound (arithmetic intensity well under
    1 FLOP/byte on the KD-sized arrays), so its speed-of-light is the HBM
    roofline — NOT the MXU peak that `mfu_pct_v5e_bf16` tracks. This stage
    times the kernel at the production stage-0 geometry (training batch 8,
    L = 16384 spectral positions, K·D = 128 lanes at DIMS 16 — the hot
    shape, models/ss2d.py) and reports achieved effective bandwidth —
    the step's ALGORITHMIC minimum HBM traffic divided by honest
    diff-D2H wall-clock — as a % of the v5e's 819 GB/s.

    Counted traffic per timed step (bf16 production scan IO):
      fwd:  read u+dts (2 KD-passes) + bs/cs, write y (1) + chunk ckpts,
            plus the chain's reduce of y (1 read pass).
      grad: fwd(2r+1w) + dy-ones materialise (1w) + bwd kernel reads
            u,dts,dy (3r) and writes du,ddts (2w) + chain reduce (1r),
            plus bs/cs fp32-cast passes and dbs/dcs writes (K-sized).
    Anything the implementation touches beyond this model (padding copies,
    fusion misses) lowers the reported number — so the metric is a true
    lower bound on kernel bandwidth. Reference counterpart: the CUDA
    kernel's fully-fused single-pass design (selective_scan_fwd_kernel.cuh).
    """
    from vm_asr_tpu.ops.selective_scan_fused import (
        _default_chunk, selective_scan_fused)

    k = 4
    rng = np.random.default_rng(0)
    io = jnp.bfloat16  # production scan IO (MODEL.VSSM.SCAN_FP32_IO off)
    u = jnp.asarray(rng.standard_normal((batch, l, kd)), io)
    dts = jnp.asarray(rng.standard_normal((batch, l, kd)) * 0.1, io)
    bs = jnp.asarray(rng.standard_normal((batch, l, k)), io)
    cs = jnp.asarray(rng.standard_normal((batch, l, k)), io)
    a_neg = jnp.asarray(-np.exp(rng.standard_normal(kd) * 0.1), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(kd) * 0.01, jnp.float32)
    dsk = jnp.asarray(rng.standard_normal(kd), jnp.float32)

    def scan(u_, dts_, bs_):
        return selective_scan_fused(u_, dts_, bs_, cs, a_neg, bias, dsk, k)

    # Chain on the cheap (B, L, K) input: a y-reduce (one read pass, counted
    # below) perturbs bs so every execution is distinct for the tunnel.
    @jax.jit
    def fwd_chained(u_, dts_, bs_):
        y = scan(u_, dts_, bs_)
        return y, bs_ + (1e-6 * y.mean()).astype(bs_.dtype)

    @jax.jit
    def grad_chained(u_, dts_, bs_):
        gu, gdt = jax.grad(
            lambda a, b: scan(a, b, bs_).sum(), argnums=(0, 1))(u_, dts_)
        return gu, bs_ + (1e-6 * gu.mean()).astype(bs_.dtype)

    isz = jnp.dtype(io).itemsize  # 2 (bf16)
    kd_pass = batch * l * kd * isz
    k_pass = batch * l * k * isz
    ckpt = batch * (l // _default_chunk(l)) * kd * 4
    fwd_bytes = 4 * kd_pass + 2 * k_pass + ckpt
    # grad: fwd(2r+1w+ckpt w) + dy ones(1w) + bwd(3r+2w+ckpt r) + chain(1r)
    # + bs/cs bf16→fp32 casts (2r bf16 + 2w fp32) + dbs/dcs fp32 writes.
    grad_bytes = 10 * kd_pass + 2 * ckpt + (4 + 2 * 2 + 2 * 2) * k_pass

    for name, fn, nbytes in (("fwd", fwd_chained, fwd_bytes),
                             ("fwd_bwd", grad_chained, grad_bytes)):
        out, cur_bs = fn(u, dts, bs)
        jax.block_until_ready(out)
        for _ in range(10):  # discarded warm-up burst (tunnel ramp)
            out, cur_bs = fn(u, dts, cur_bs)
        jax.block_until_ready(out)
        dt, _ = median_window_dt(
            lambda s: fn(u, dts, s[1]), (out, cur_bs), iters=iters)
        gbs = nbytes / dt / 1e9
        pct = 100.0 * gbs / V5E_HBM_PEAK_GBS
        emit(
            {
                "metric": f"scan_{name}_hbm_roofline_pct",
                "value": round(pct, 1),
                "unit": "pct_of_v5e_819GBs",
                "vs_baseline": round(pct / 100.0, 3),
                "eff_gbs": round(gbs, 1),
                "ms_per_call": round(dt * 1e3, 3),
                "shape": f"({batch},{l},{kd})_bf16",
            }
        )


if __name__ == "__main__":
    sys.exit(main())
