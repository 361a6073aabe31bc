"""GAN loss variants (wgan/wgan-gp) and SS2D out-norm options."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vm_asr_tpu.models import SS2D, get_model
from vm_asr_tpu.parallel import make_mesh, shard_batch
from vm_asr_tpu.train.trainer import Trainer


@pytest.mark.parametrize("out_norm", ["none", "softmax", "sigmoid", "dwconv3"])
def test_ss2d_out_norm_variants(out_norm, rng):
    m = SS2D(d_model=8, d_state=1, out_norm=out_norm, scan_impl="ref")
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_wgan_gp_train_step(tmp_path):
    from tests.test_train import make_loaders, tiny_config

    c = tiny_config(tmp_path, gan=True)
    c.TRAIN.ADVERSARIAL.GAN_LOSS_TYPE = "wgan-gp"
    c.TRAIN.ADVERSARIAL.MPD_PERIODS = [2]
    models = get_model(c)
    train, _ = make_loaders(c, n_items=16)
    mesh = make_mesh()
    trainer = Trainer(c, models, train, None, mesh=mesh)
    batch = next(iter(train))
    db = shard_batch(
        {
            "wave_input": batch.wave_input,
            "wave_target": batch.wave_target,
            "highcut": batch.highcut,
        },
        mesh,
    )
    gen_state, disc_states, m = trainer.train_step(
        trainer.gen_state, trainer.disc_states, db, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(m["total_loss"]))
    assert np.isfinite(float(m["total_disc_loss"]))


def test_fuse_streams_train_step(tmp_path):
    """Training with MODEL.VSSM.FUSE_STREAMS: gradients flow through the
    fused (batch-concatenated) decoder calls — the decoder's grads sum over
    both streams exactly as in the unfused quirk path."""
    from tests.test_train import make_loaders, tiny_config

    c = tiny_config(tmp_path, gan=True)
    c.TRAIN.ADVERSARIAL.MPD_PERIODS = [2]
    c.MODEL.VSSM.FUSE_STREAMS = True
    models = get_model(c)
    train, _ = make_loaders(c, n_items=16)
    mesh = make_mesh()
    trainer = Trainer(c, models, train, None, mesh=mesh)
    batch = next(iter(train))
    db = shard_batch(
        {
            "wave_input": batch.wave_input,
            "wave_target": batch.wave_target,
            "highcut": batch.highcut,
        },
        mesh,
    )
    before = jax.tree_util.tree_map(
        lambda a: np.asarray(a).copy(), trainer.gen_state.params
    )
    gen_state, disc_states, m = trainer.train_step(
        trainer.gen_state, trainer.disc_states, db, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(m["total_loss"]))
    # some parameter must move (warmup LR can leave individual leaves ~0)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(gen_state.params))
    )
    assert moved


def test_disc_input_gain_and_gap_metrics(tmp_path):
    """TRAIN.ADVERSARIAL.DISC_INPUT_GAIN plumbs into every D pass, and the
    adversarial-health gap metrics are emitted (VERDICT r03 weak #1: the
    conv48 MPD sat blind at the 2.50 LSGAN equilibrium with no signal to
    see it)."""
    from tests.test_train import make_loaders, tiny_config

    def run(gain):
        c = tiny_config(tmp_path, gan=True)
        c.TRAIN.ADVERSARIAL.MPD_PERIODS = [2]
        c.TRAIN.ADVERSARIAL.DISC_INPUT_GAIN = gain
        models = get_model(c)
        train, _ = make_loaders(c, n_items=16)
        mesh = make_mesh()
        trainer = Trainer(c, models, train, None, mesh=mesh)
        batch = next(iter(train))
        db = shard_batch(
            {
                "wave_input": batch.wave_input,
                "wave_target": batch.wave_target,
                "highcut": batch.highcut,
            },
            mesh,
        )
        _, _, m = trainer.train_step(
            trainer.gen_state, trainer.disc_states, db, jax.random.PRNGKey(0)
        )
        return m

    m1 = run(1.0)
    m8 = run(8.0)
    assert "disc_gap/mpd" in m1 and "disc_gap/mpd_max" in m1
    assert np.isfinite(float(m1["disc_gap/mpd"]))
    # The gain must reach the D: with identical weights/data the disc loss
    # of a x8-input pass differs from the x1 pass.
    d1, d8 = float(m1["discriminator/mpd"]), float(m8["discriminator/mpd"])
    assert np.isfinite(d1) and np.isfinite(d8)
    assert abs(d1 - d8) > 1e-6, (d1, d8)
