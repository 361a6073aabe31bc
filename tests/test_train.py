"""End-to-end training smoke tests on a virtual 8-device CPU mesh.

The reference can't test multi-device (nothing distributed exists,
SURVEY.md §4); here the full GAN train step runs dp-sharded over 8 virtual
devices — loss decreases, states update, checkpoints round-trip.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vm_asr_tpu.core import default_config
from vm_asr_tpu.data import DataPipeline, DegradingSampler, SyntheticVCTK, train_valid_split
from vm_asr_tpu.models import get_model
from vm_asr_tpu.parallel import make_mesh
from vm_asr_tpu.train.trainer import Trainer


def tiny_config(tmp_path, gan=False):
    c = default_config()
    c.DATA.TARGET_SR = 16000
    c.DATA.SEGMENT = 0.126  # 2016 samples → 64-frame spectral image
    c.DATA.STFT.N_FFT = 128
    c.DATA.STFT.HOP_LENGTH = 32
    c.DATA.STFT.WIN_LENGTH = 128
    c.DATA.RANDOM_RESAMPLE = [4000, 16000]
    c.DATA.BATCH_SIZE = 8
    c.DATA.NUM_WORKERS = 2
    c.MODEL.NAME = "DualStreamInteractiveMambaUNet"
    c.MODEL.VSSM.DIMS = 4
    c.MODEL.VSSM.DEPTHS = [1, 1, 1, 1]
    c.TRAIN.EPOCHS = 1
    c.TRAIN.WARMUP_EPOCHS = 0
    c.TRAIN.LOW_FREQ_REPLACEMENT = True
    c.TRAIN.ADVERSARIAL.ENABLE = gan
    c.TRAIN.ADVERSARIAL.DISCRIMINATORS = ["mpd"] if gan else [""]
    c.TRAIN.ADVERSARIAL.MPD_HIDDEN = 2
    c.TRAIN.ADVERSARIAL.MPD_PERIODS = [2, 3]
    c.TENSORBOARD.ENABLE = False
    c.OUTPUT = str(tmp_path / "run")
    c.DTYPE.COMPUTE = "float32"
    c.AMP_ENABLE = False
    return c


def make_loaders(config, n_items=16):
    ds = SyntheticVCTK(
        n_items=n_items, sr=config.DATA.TARGET_SR,
        duration=config.DATA.SEGMENT + 0.01,
    )
    sampler = DegradingSampler(ds, config, training=True)
    tr, va = train_valid_split(n_items, 0.25)
    kw = dict(batch_size=config.DATA.BATCH_SIZE, num_workers=2)
    train = DataPipeline(sampler, indices=tr, shuffle=True, **kw)
    valid = DataPipeline(sampler, indices=va, shuffle=False, drop_last=False,
                         batch_size=4, num_workers=2)
    return train, valid


def test_pipeline_shapes():
    c = default_config()
    c.DATA.TARGET_SR = 16000
    c.DATA.SEGMENT = 0.126
    c.DATA.STFT.N_FFT = 128
    c.DATA.RANDOM_RESAMPLE = [4000, 16000]
    ds = SyntheticVCTK(n_items=8, sr=16000, duration=0.2)
    sampler = DegradingSampler(ds, c, training=True)
    pipe = DataPipeline(sampler, batch_size=4, num_workers=2)
    batches = list(pipe)
    assert len(batches) == 2
    b = batches[0]
    assert b.wave_input.shape == (4, 1, 2016)
    assert b.wave_target.shape == (4, 1, 2016)
    assert b.highcut.shape == (4,)
    assert (b.highcut >= 65 // 4).all() and (b.highcut <= 65).all()
    # degraded input must differ from target (band-limited)
    assert not np.allclose(b.wave_input, b.wave_target)
    # determinism: same epoch → same batch
    b2 = list(pipe)[0]
    np.testing.assert_array_equal(b.wave_input, b2.wave_input)


@pytest.mark.parametrize("gan", [False, True])
def test_trainer_end_to_end(tmp_path, gan):
    c = tiny_config(tmp_path, gan=gan)
    models = get_model(c)
    assert ("mpd" in models) == gan
    train, valid = make_loaders(c)
    mesh = make_mesh()  # all 8 virtual devices on dp
    trainer = Trainer(c, models, train, valid, mesh=mesh)
    best = trainer.train()
    assert np.isfinite(best)
    # checkpoints written
    assert trainer.ckpt.has("G", "latest")
    assert trainer.ckpt.has("G", "best")
    if gan:
        assert trainer.ckpt.has("mpd", "latest")
    # resume restores state
    restored = trainer.ckpt.restore("G", "latest",
                                    target=jax.device_get(trainer.gen_state))
    assert restored is not None
    p0 = jax.tree_util.tree_leaves(restored["state"].params)[0]
    p1 = jax.tree_util.tree_leaves(jax.device_get(trainer.gen_state).params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_epoch_end_artifact_logging(tmp_path):
    """The trainer must dump Input/Output/Target artifacts per
    TENSORBOARD.LOG_ITEMS at epoch end (reference trainer.py:190-192,
    304-306, 448-457)."""
    c = tiny_config(tmp_path, gan=False)
    c.TENSORBOARD.ENABLE = True
    models = get_model(c)
    train, valid = make_loaders(c)

    calls = []

    class RecordingWriter:
        enabled = True

        def set_step(self, step, mode="train"):
            calls.append(("set_step", mode))

        def add_scalar(self, *a, **k):
            pass

        def log_outputs(self, wave_in, wave_out, wave_target, config):
            assert wave_in.ndim == 1 and wave_out.shape == wave_target.shape
            assert np.isfinite(wave_out).all()
            calls.append(("log_outputs", wave_in.shape[0]))

        def flush(self):
            pass

    trainer = Trainer(c, models, train, valid, mesh=make_mesh(),
                      writer=RecordingWriter())
    trainer.train()
    n_logs = sum(1 for c_, _ in calls if c_ == "log_outputs")
    assert n_logs == 2  # one train-epoch dump + one valid-epoch dump


def test_train_step_decreases_loss(tmp_path):
    """A few steps on one repeated batch should reduce the generator loss."""
    c = tiny_config(tmp_path, gan=False)
    models = get_model(c)
    train, _ = make_loaders(c)
    mesh = make_mesh()
    trainer = Trainer(c, models, train, None, mesh=mesh)
    batch = next(iter(train))
    from vm_asr_tpu.parallel import shard_batch

    db = shard_batch(
        {
            "wave_input": batch.wave_input,
            "wave_target": batch.wave_target,
            "highcut": batch.highcut,
        },
        mesh,
    )
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(6):
        rng, sub = jax.random.split(rng)
        trainer.gen_state, trainer.disc_states, m = trainer.train_step(
            trainer.gen_state, trainer.disc_states, db, sub
        )
        losses.append(float(m["total_loss"]))
    assert losses[-1] < losses[0], losses
