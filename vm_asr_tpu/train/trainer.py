"""Training engine: epoch loop, GAN optimizers, monitoring, checkpoints.

Reference: base/base_trainer.py:12-231 (loop skeleton, monitor, early stop,
checkpointing, NaN kill-switch) + trainer/trainer.py:10-495 (losses, two
optimizers, per-epoch LR, validation, artifact logging).

Faithful quirks, documented:
- MONITOR "min lsd" tracks the *training* LSD (the validation keys carry a
  `val_` prefix; reference trainer.py:314 + base_trainer.py:96-115).
- Any NaN/Inf in the epoch log aborts the run (base_trainer.py:223-231).

TPU redesign: one jitted train step (generator + discriminators + metrics in
one XLA program), host-side data pipeline with static shapes, orbax
checkpoints, mesh-sharded batches for multi-chip DP.
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import CheckpointManager
from ..core.logging import create_logger
from ..core.tracker import MetricTracker
from ..core.visualization import TensorboardWriter
from ..parallel import make_mesh, replicate_tree, shard_batch
from .optim import make_optimizer
from .states import DiscState, GenState
from .steps import make_eval_step, make_train_step


def _format_epoch_table(log: Dict[str, float]) -> str:
    """Plain-text train/val table (reference base_trainer.py:197-221 uses
    PrettyTable; same content)."""
    keys = [k for k in log if not k.startswith("val_")]
    lines = [f"{'metric':<36} {'train':>12} {'valid':>12}"]
    lines.append("-" * 62)
    for k in keys:
        val = log.get("val_" + k)
        val_s = f"{val:12.5f}" if val is not None else " " * 12
        lines.append(f"{k:<36} {log[k]:12.5f} {val_s}")
    return "\n".join(lines)


class Trainer:
    def __init__(self, config, models: Dict[str, Any], train_loader,
                 valid_loader=None, logger=None, mesh=None,
                 writer: Optional[TensorboardWriter] = None):
        self.config = config
        self.models = models
        self.generator = models["generator"]
        self.discriminators = {k: v for k, v in models.items() if k != "generator"}
        self.gan = config.TRAIN.ADVERSARIAL.ENABLE and len(self.discriminators) > 0
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.logger = logger or create_logger(config.OUTPUT)
        self.mesh = mesh or make_mesh(config.MESH.DP)
        self.writer = writer or TensorboardWriter(
            os.path.join(config.OUTPUT, "tb"),
            self.logger,
            enabled=config.TENSORBOARD.ENABLE,
        )
        self.ckpt = CheckpointManager(config.OUTPUT)

        # monitor config (reference base_trainer.py:40-60)
        self.monitor = config.MONITOR
        if self.monitor == "off":
            self.mnt_mode, self.mnt_metric = "off", None
        else:
            self.mnt_mode, self.mnt_metric = self.monitor.split()
        self.mnt_best = math.inf if self.mnt_mode == "min" else -math.inf
        self.early_stop = config.TRAIN.EARLY_STOPPING or math.inf
        self.start_epoch = 0

        self._build_states()
        self.train_step = make_train_step(config, self.generator,
                                          self.discriminators)
        self.eval_step = make_eval_step(config, self.generator)
        self.train_metrics = MetricTracker()
        self.valid_metrics = MetricTracker()

    # ------------------------------------------------------------------ setup
    def _build_states(self):
        cfg = self.config
        d = cfg.DATA
        seg = int(d.SEGMENT * d.TARGET_SR)
        dummy_x = jnp.zeros((1, 1, seg), jnp.float32)
        dummy_hf = jnp.zeros((1,), jnp.int32)
        rng = jax.random.PRNGKey(cfg.SEED)

        steps_per_epoch = max(len(self.train_loader), 1)
        gen_vars = jax.jit(self.generator.init)(
            {"params": rng, "dropout": rng}, dummy_x, dummy_hf
        )
        tx_g = make_optimizer(cfg, steps_per_epoch)
        self.gen_state = GenState.create(gen_vars["params"], tx_g)

        self.disc_states: Dict[str, DiscState] = {}
        for i, (name, disc) in enumerate(sorted(self.discriminators.items())):
            dvars = jax.jit(disc.init)(
                jax.random.PRNGKey(cfg.SEED + 1 + i), dummy_x, dummy_x
            )
            tx_d = make_optimizer(cfg, steps_per_epoch)
            self.disc_states[name] = DiscState.create(dvars, tx_d)

        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(self.gen_state.params)
        )
        self.logger.info(f"Generator params: {n_params / 1e6:.3f} M")

        # Replicate states over the mesh; batches get dp-sharded per step.
        self.gen_state = replicate_tree(self.gen_state, self.mesh)
        self.disc_states = {
            k: replicate_tree(v, self.mesh) for k, v in self.disc_states.items()
        }

        if cfg.TRAIN.AUTO_RESUME or cfg.MODEL.RESUME_PATH:
            self._try_resume()

    def _try_resume(self):
        restored = self.ckpt.restore("G", "latest", target=self.gen_state)
        if restored is None:
            return
        self.gen_state = restored["state"]
        self.start_epoch = restored.get("epoch", 0) + 1
        self.mnt_best = restored.get(
            "monitor_best", self.mnt_best
        )
        for name in list(self.disc_states):
            r = self.ckpt.restore(name, "latest", target=self.disc_states[name])
            if r is not None:
                self.disc_states[name] = r["state"]
        self.logger.info(f"Resumed from epoch {self.start_epoch}")

    # ------------------------------------------------------------------ train
    def train(self):
        """Epoch loop with monitoring + early stopping
        (reference base_trainer.py:74-128)."""
        not_improved = 0
        for epoch in range(self.start_epoch, self.config.TRAIN.EPOCHS):
            log = self._train_epoch(epoch)
            if self.valid_loader is not None:
                val_log = self._valid_epoch(epoch)
                log.update(**{f"val_{k}": v for k, v in val_log.items()})

            self.logger.info(f"Epoch {epoch}:\n{_format_epoch_table(log)}")

            # NaN/Inf kill-switch (reference base_trainer.py:223-231)
            bad = [k for k, v in log.items() if not np.isfinite(v)]
            if bad:
                self.logger.error(f"Non-finite metrics {bad}; aborting run.")
                raise SystemExit(1)

            best = False
            if self.mnt_mode != "off" and self.mnt_metric in log:
                current = log[self.mnt_metric]
                improved = (
                    current <= self.mnt_best
                    if self.mnt_mode == "min"
                    else current >= self.mnt_best
                )
                if improved:
                    self.mnt_best = current
                    not_improved = 0
                    best = True
                else:
                    not_improved += 1
                if not_improved > self.early_stop:
                    self.logger.info(
                        f"No improvement in {self.early_stop} epochs; stopping."
                    )
                    break

            self._save(epoch, best)
        return self.mnt_best

    def _save(self, epoch: int, best: bool):
        freq = self.config.SAVE_EPOCH_FREQ
        epoch_copy = freq > 0 and (epoch + 1) % freq == 0
        cfg_dict = self.config.to_dict()
        self.ckpt.save("G", jax.device_get(self.gen_state), epoch,
                       self.mnt_best, cfg_dict, best=best, epoch_copy=epoch_copy)
        for name, ds in self.disc_states.items():
            self.ckpt.save(name, jax.device_get(ds), epoch, self.mnt_best,
                           best=best, epoch_copy=epoch_copy)

    def _train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_metrics.reset()
        self.train_loader.set_epoch(epoch)
        rng = jax.random.PRNGKey(self.config.SEED * 7919 + epoch)
        t0 = time.time()
        n_batches = len(self.train_loader)
        pending = []  # device-side metric dicts; fetched at epoch end so the
        #               step pipeline never blocks on host transfers
        profile_steps = int(self.config.get("PROFILE_STEPS", 0) or 0)
        device_batch = None
        for i, batch in enumerate(self.train_loader):
            if profile_steps and i == 1 and epoch == self.start_epoch:
                jax.profiler.start_trace(
                    os.path.join(self.config.OUTPUT, "profile")
                )
            rng, step_rng = jax.random.split(rng)
            device_batch = shard_batch(
                {
                    "wave_input": batch.wave_input,
                    "wave_target": batch.wave_target,
                    "highcut": batch.highcut,
                },
                self.mesh,
            )
            self.gen_state, self.disc_states, metrics = self.train_step(
                self.gen_state, self.disc_states, device_batch, step_rng
            )
            pending.append(metrics)
            if profile_steps and i == profile_steps and epoch == self.start_epoch:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                self.logger.info(
                    f"profile trace written to {self.config.OUTPUT}/profile"
                )
            if i % self.config.PRINT_FREQ == 0 or i == n_batches - 1:
                metrics = jax.device_get(metrics)
                self.logger.info(
                    f"Epoch {epoch} [{i + 1}/{n_batches}] "
                    f"loss={float(metrics['total_loss']):.4f} "
                    f"lsd={float(metrics.get('lsd', float('nan'))):.4f} "
                    f"({(time.time() - t0) / (i + 1):.2f}s/it)"
                )
        for metrics in jax.device_get(pending):
            for k, v in metrics.items():
                self.train_metrics.update(k, float(v))
        self.writer.set_step(epoch, "train")
        for k, v in self.train_metrics.result().items():
            self.writer.add_scalar(k, v)
        # Epoch-end artifact dump on the last batch's first sample
        # (reference trainer.py:190-192). Costs one extra eval forward.
        if self.writer.enabled and device_batch is not None:
            wave_out, _ = self.eval_step(self.gen_state.params, device_batch)
            self._log_outputs(device_batch, wave_out)
        return self.train_metrics.result()

    def _log_outputs(self, device_batch, wave_out):
        x = np.asarray(jax.device_get(device_batch["wave_input"]))[0, 0]
        y = np.asarray(jax.device_get(device_batch["wave_target"]))[0, 0]
        out = np.asarray(jax.device_get(wave_out))[0, 0]
        self.writer.log_outputs(x, out, y, self.config)

    def _valid_epoch(self, epoch: int) -> Dict[str, float]:
        self.valid_metrics.reset()
        params = self.gen_state.params
        device_batch, wave_out = None, None
        for batch in self.valid_loader:
            device_batch = shard_batch(
                {
                    "wave_input": batch.wave_input,
                    "wave_target": batch.wave_target,
                    "highcut": batch.highcut,
                },
                self.mesh,
            )
            wave_out, metrics = self.eval_step(params, device_batch)
            for k, v in jax.device_get(metrics).items():
                self.valid_metrics.update(k, float(v))
        self.writer.set_step(epoch, "valid")
        for k, v in self.valid_metrics.result().items():
            self.writer.add_scalar(k, v)
        # Last-batch artifact dump (reference trainer.py:304-306)
        if self.writer.enabled and device_batch is not None:
            self._log_outputs(device_batch, wave_out)
        return self.valid_metrics.result()
