"""Stacked MPD execution: loss-identical re-layout of the 5 sequential
period-discriminator conv stacks into vmapped lane stacks
(discriminator.StackedMultiPeriodDiscriminator; reference
discriminator.py:121-147 runs them sequentially).

Equivalence contract: valid rows/cols of every conv output are bit-exact
(padding re-zeroed after each conv = the unstacked conv's own zero padding),
and per-period scores/feature-maps slice back out before the losses — so
scores, feature maps, losses, gradients, and spectral-norm power-iteration
state all match the unstacked module.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vm_asr_tpu import losses as L
from vm_asr_tpu.models.discriminator import (
    MultiPeriodDiscriminator,
    StackedMultiPeriodDiscriminator,
    stack_mpd_params,
    unstack_mpd_params,
)

PERIODS = (2, 3, 5)
T = 97  # not divisible by any period: exercises the reflect fold pad
HIDDEN = 4


def _pair(seed=0, b=2):
    r = np.random.default_rng(seed)
    y = jnp.asarray(r.standard_normal((b, 1, T)).astype(np.float32))
    yh = jnp.asarray(r.standard_normal((b, 1, T)).astype(np.float32))
    return y, yh


def _models(groups=None):
    un = MultiPeriodDiscriminator(hidden=HIDDEN, periods=PERIODS)
    st = StackedMultiPeriodDiscriminator(
        hidden=HIDDEN, periods=PERIODS, groups=groups
    )
    return un, st


def _init_pair(groups=None):
    un, st = _models(groups)
    y, yh = _pair()
    v_un = un.init(jax.random.PRNGKey(0), y, yh, update_stats=False)
    v_st = stack_mpd_params(v_un, periods=PERIODS, groups=groups)
    return un, st, v_un, v_st, y, yh


@pytest.mark.parametrize("groups", [None, ((2, 3), (5,))])
def test_scores_and_fmaps_match(groups):
    un, st, v_un, v_st, y, yh = _init_pair(groups)
    s_r, s_g, f_r, f_g = un.apply(v_un, y, yh, update_stats=False)
    t_r, t_g, g_r, g_g = st.apply(v_st, y, yh, update_stats=False)
    for i in range(len(PERIODS)):
        np.testing.assert_allclose(s_r[i], t_r[i], atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(s_g[i], t_g[i], atol=2e-6, rtol=1e-5)
        assert len(f_r[i]) == len(g_r[i]) == 6
        for a, b_ in zip(f_r[i], g_r[i]):
            assert a.shape == b_.shape
            np.testing.assert_allclose(a, b_, atol=2e-6, rtol=1e-5)
        for a, b_ in zip(f_g[i], g_g[i]):
            np.testing.assert_allclose(a, b_, atol=2e-6, rtol=1e-5)


def test_losses_match():
    un, st, v_un, v_st, y, yh = _init_pair()
    out_un = un.apply(v_un, y, yh, update_stats=False)
    out_st = st.apply(v_st, y, yh, update_stats=False)
    for out_a, out_b in ((out_un, out_st),):
        d_a = L.discriminator_loss(out_a[0], out_a[1], "lsgan")
        d_b = L.discriminator_loss(out_b[0], out_b[1], "lsgan")
        np.testing.assert_allclose(d_a, d_b, rtol=1e-5)
        a_a = L.generator_adversarial_loss(out_a[1], "lsgan")
        a_b = L.generator_adversarial_loss(out_b[1], "lsgan")
        np.testing.assert_allclose(a_a, a_b, rtol=1e-5)
        f_a = L.feature_matching_loss(out_a[2], out_a[3])
        f_b = L.feature_matching_loss(out_b[2], out_b[3])
        np.testing.assert_allclose(f_a, f_b, rtol=1e-5)


def test_update_stats_power_iteration_matches():
    """The disc pass (update_stats=True) runs real then fake sequentially;
    each spectral-norm power iteration must advance exactly as unstacked."""
    un, st, v_un, v_st, y, yh = _init_pair()
    _, mut_un = un.apply(v_un, y, yh, update_stats=True,
                         mutable=["batch_stats"])
    _, mut_st = st.apply(v_st, y, yh, update_stats=True,
                         mutable=["batch_stats"])
    back = unstack_mpd_params(
        {"batch_stats": mut_st["batch_stats"]}, periods=PERIODS
    )["batch_stats"]
    flat_un = jax.tree_util.tree_leaves_with_path(mut_un["batch_stats"])
    flat_st = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(back)
    )
    assert flat_un
    for path, leaf in flat_un:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            leaf, flat_st[key], atol=2e-6, rtol=1e-5, err_msg=key
        )


def test_grads_match():
    un, st, v_un, v_st, y, yh = _init_pair()

    def loss_un(params):
        s_r, s_g, _, _ = un.apply(
            {"params": params, "batch_stats": v_un["batch_stats"]},
            y, yh, update_stats=False)
        return L.discriminator_loss(s_r, s_g, "lsgan")

    def loss_st(params):
        s_r, s_g, _, _ = st.apply(
            {"params": params, "batch_stats": v_st["batch_stats"]},
            y, yh, update_stats=False)
        return L.discriminator_loss(s_r, s_g, "lsgan")

    g_un = jax.grad(loss_un)(v_un["params"])
    g_st = jax.grad(loss_st)(v_st["params"])
    g_st_un = unstack_mpd_params({"params": g_st}, periods=PERIODS)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=3e-6, rtol=2e-5),
        g_un, g_st_un,
    )


def test_param_roundtrip():
    _, _, v_un, v_st, _, _ = _init_pair(((2, 3), (5,)))
    # stack built with groups in _init_pair uses groups=((2,3),(5,)) only
    # for the module; re-stack explicitly to exercise the round trip
    v_st2 = stack_mpd_params(v_un, periods=PERIODS, groups=((2, 3), (5,)))
    back = unstack_mpd_params(v_st2, periods=PERIODS, groups=((2, 3), (5,)))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), v_un, back
    )


def test_factory_knob(tmp_path):
    from tests.test_train import tiny_config
    from vm_asr_tpu.models import get_model

    c = tiny_config(tmp_path, gan=True)
    c.TRAIN.ADVERSARIAL.MPD_STACKED = True
    c.TRAIN.ADVERSARIAL.MPD_PERIODS = [2, 3]
    c.TRAIN.ADVERSARIAL.MPD_STACK_GROUPS = [[2], [3]]
    models = get_model(c)
    assert isinstance(models["mpd"], StackedMultiPeriodDiscriminator)
    assert models["mpd"].groups == ((2,), (3,))


def test_train_step_with_stacked_mpd(tmp_path):
    """End-to-end: one GAN train step with the stacked MPD produces the
    same losses as with the unstacked MPD from identical init (the
    trainer inits each independently, so compare via converted params)."""
    from tests.test_train import make_loaders, tiny_config
    from vm_asr_tpu.models import get_model
    from vm_asr_tpu.parallel import make_mesh, shard_batch
    from vm_asr_tpu.train.trainer import Trainer

    c = tiny_config(tmp_path, gan=True)
    c.TRAIN.ADVERSARIAL.MPD_PERIODS = [2, 3]
    models = get_model(c)
    train, _ = make_loaders(c, n_items=16)
    mesh = make_mesh()
    tr_un = Trainer(c, models, train, None, mesh=mesh)

    c2 = tiny_config(tmp_path, gan=True)
    c2.TRAIN.ADVERSARIAL.MPD_PERIODS = [2, 3]
    c2.TRAIN.ADVERSARIAL.MPD_STACKED = True
    models2 = get_model(c2)
    tr_st = Trainer(c2, models2, train, None, mesh=mesh)
    # transplant the unstacked trainer's init into the stacked one
    ds_un = tr_un.disc_states["mpd"]
    conv = stack_mpd_params(
        {"params": ds_un.params, "batch_stats": ds_un.batch_stats},
        periods=(2, 3),
    )
    tr_st.disc_states["mpd"] = tr_st.disc_states["mpd"].replace(
        params=conv["params"], batch_stats=conv["batch_stats"],
        opt_state=tr_st.disc_states["mpd"].tx.init(conv["params"]),
    )
    # copy: train_step donates its state args, so shared buffers between
    # the two trainers would be deleted by the first step
    tr_st.gen_state = tr_st.gen_state.replace(
        params=jax.tree_util.tree_map(jnp.copy, tr_un.gen_state.params))

    batch = next(iter(train))
    db = shard_batch(
        {"wave_input": batch.wave_input, "wave_target": batch.wave_target,
         "highcut": batch.highcut}, mesh)
    _, _, m_un = tr_un.train_step(
        tr_un.gen_state, tr_un.disc_states, db, jax.random.PRNGKey(0))
    _, _, m_st = tr_st.train_step(
        tr_st.gen_state, tr_st.disc_states, db, jax.random.PRNGKey(0))
    for k in ("total_loss", "discriminator/mpd", "generator/features_mpd"):
        np.testing.assert_allclose(
            float(m_un[k]), float(m_st[k]), rtol=5e-4, err_msg=k)
