"""Optimizer / schedule semantics (reference utils/optimizer.py,
utils/lr_scheduler.py)."""

import numpy as np

import jax.numpy as jnp
import optax

from vm_asr_tpu.core import default_config
from vm_asr_tpu.train.optim import make_optimizer, make_schedule, no_decay_mask


def test_cosine_schedule_shape():
    c = default_config()
    # 50 epochs, 10 warmup, 1e-3 → 1e-5 (reference config.py:127-135)
    s = make_schedule(c, steps_per_epoch=10)
    assert abs(float(s(0)) - c.TRAIN.MIN_LR) < 1e-8
    assert abs(float(s(100)) - c.TRAIN.BASE_LR) < 1e-5
    assert abs(float(s(500)) - c.TRAIN.MIN_LR) < 1e-5
    # monotone decay after warmup
    vals = [float(s(i)) for i in range(100, 500, 50)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_no_decay_mask():
    params = {
        "dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
        "ss2d": {"A_logs": jnp.zeros((4, 2, 1)), "Ds": jnp.zeros((4, 2)),
                 "dt_projs_bias": jnp.zeros((4, 2))},
        "norm": {"scale": jnp.zeros((4,))},
    }
    mask = no_decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["ss2d"]["A_logs"] is False
    assert mask["ss2d"]["Ds"] is False
    assert mask["ss2d"]["dt_projs_bias"] is False
    assert mask["norm"]["scale"] is False  # 1-D param


def test_accumulation_schedule_horizon():
    """With ACCUMULATION_STEPS=k, MultiSteps advances the inner schedule once
    per k micro-steps — the schedule must be sized in *effective* steps so the
    cosine still reaches MIN_LR by the end of training."""
    import jax

    c = default_config()
    k = 4
    steps_per_epoch = 8  # micro-steps
    c.TRAIN.EPOCHS = 10
    c.TRAIN.WARMUP_EPOCHS = 2
    c.TRAIN.ACCUMULATION_STEPS = k
    tx = make_optimizer(c, steps_per_epoch=steps_per_epoch)
    params = {"w": jnp.ones((3,))}
    g = {"w": jnp.full((3,), 1.0)}
    total_micro = c.TRAIN.EPOCHS * steps_per_epoch

    def body(state, _):
        updates, state = tx.update(g, state, params)
        return state, jnp.abs(updates["w"]).max()

    _, mags = jax.lax.scan(body, tx.init(params), length=total_micro)
    # With a constant gradient, adam's |update| ≈ lr. The last effective step
    # must sit at ≈ MIN_LR; with the (pre-fix) micro-step horizon it would be
    # stuck mid-cosine at ~5e-4.
    final = float(mags[-1])
    assert final < 3 * c.TRAIN.MIN_LR, final


def test_accumulation_wrapper():
    c = default_config()
    c.TRAIN.ACCUMULATION_STEPS = 2
    tx = make_optimizer(c, steps_per_epoch=10)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    # first micro-step: no update applied yet
    updates, state = tx.update(g, state, params)
    assert float(jnp.abs(updates["w"]).max()) == 0.0
    updates, state = tx.update(g, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0.0
