#!/usr/bin/env python
"""Component-level timing of the flagship GAN training step (TPU).

Times jitted step variants with ablated loss terms to attribute the GAN
step's wall time (counterpart of profiling the reference's
trainer/trainer.py:318-438 loss assembly):

    full    : multi-res STFT + MPD adv/feat gen update + MPD disc step
    no_gan  : multi-res STFT generator only (no MPD anywhere)
    l1_only : L1 generator only (the bare model fwd+bwd+opt)

Deltas between rows ≈ the cost of each component (fwd+bwd). Run:
    python scripts/profile_gan_step.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_step(trainer, batch, iters=10, warmup=12):
    # differential, D2H-anchored timing (see bench.median_window_dt: the
    # tunnel's block_until_ready can ack before device compute finishes)
    from bench import median_window_dt

    rng = jax.random.PRNGKey(0)
    gen_state, disc_states = trainer.gen_state, trainer.disc_states
    for _ in range(warmup):
        rng, r = jax.random.split(rng)
        gen_state, disc_states, m = trainer.train_step(
            gen_state, disc_states, batch, r)
    jax.block_until_ready(m)

    def step(state):
        g, d, r = state
        r, sr = jax.random.split(r)
        g, d, _ = trainer.train_step(g, d, batch, sr)
        return (g, d, r)

    dt, _ = median_window_dt(step, (gen_state, disc_states, rng), iters=iters)
    return dt


def main():
    from __graft_entry__ import _flagship_config
    from vm_asr_tpu.data import DataPipeline, DegradingSampler, SyntheticVCTK
    from vm_asr_tpu.models import get_model
    from vm_asr_tpu.parallel import make_mesh, shard_batch
    from vm_asr_tpu.train.trainer import Trainer

    batch_size = 8
    variants = {
        "full": [],
        "full_fused": ["MODEL.VSSM.FUSE_STREAMS", True],
        "no_gan": ["TRAIN.ADVERSARIAL.ENABLE", False],
        "l1_only": ["TRAIN.ADVERSARIAL.ENABLE", False,
                    "TRAIN.LOSSES.GEN", ["l1"]],
    }

    mesh = make_mesh(dp=1, devices=jax.devices()[:1])
    results = {}
    device_batch = None
    for name, opts in variants.items():
        config = _flagship_config(batch_size=batch_size, gan=True)
        config.defrost()
        config.OUTPUT = "/tmp/vm_asr_tpu_prof"
        it = iter(opts)
        for k, v in zip(it, it):
            node = config
            *path, leaf = k.split(".")
            for p in path:
                node = node[p]
            node[leaf] = v
        config.freeze()
        models = get_model(config)
        ds = SyntheticVCTK(n_items=batch_size, sr=48000,
                           duration=config.DATA.SEGMENT + 0.01)
        loader = DataPipeline(DegradingSampler(ds, config, training=True),
                              batch_size=batch_size, num_workers=2)
        trainer = Trainer(config, models, loader, None, mesh=mesh)
        if device_batch is None:
            b = next(iter(loader))
            device_batch = shard_batch(
                {"wave_input": b.wave_input, "wave_target": b.wave_target,
                 "highcut": b.highcut}, mesh)
        dt = bench_step(trainer, device_batch)
        results[name] = dt
        print(json.dumps({"variant": name, "ms_per_step": round(dt * 1e3, 3)}),
              flush=True)

    full, ng = results["full"], results["no_gan"]
    print(json.dumps({
        "mpd_total_ms": round((full - ng) * 1e3, 3),
        "stft_loss_ms": round((ng - results["l1_only"]) * 1e3, 3),
        "model_fwd_bwd_ms": round(results["l1_only"] * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
