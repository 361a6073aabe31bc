"""Stacked dual-stream execution (DualStreamStackedMambaUNet).

The stream-vmapped model with stack_dual_params-converted weights must
reproduce the unstacked DualStreamInteractiveMambaUNet exactly: same
per-sample math, one batched op where the unstacked program ran two.
Covers the production quirk (phase through the mag decoder when
PHASE_DECODER_FIX is off), the corrected routing, the add-skip variant,
and the 5-dim latent layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vm_asr_tpu.models.unet import (
    DualStreamInteractiveMambaUNet,
    DualStreamStackedMambaUNet,
    stack_dual_params,
)

GEOM = dict(n_fft=128, hop_length=32, win_length=128)
SEG = 2016  # → 64×64 spectral image after the DC drop


def _pair(depths=(1, 1, 1, 1), dims=4, **kw):
    a = DualStreamInteractiveMambaUNet(depths=depths, dims=dims, **GEOM, **kw)
    b = DualStreamStackedMambaUNet(depths=depths, dims=dims, **GEOM, **kw)
    return a, b


def _data(batch=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((batch, 1, SEG)).astype(np.float32) * 0.1)
    hf = jnp.full((batch,), 33, jnp.int32)
    return x, hf


@pytest.mark.parametrize(
    "kw, conv_kw",
    [
        ({}, {}),  # production: concat skip + mag-decoder quirk
        ({"phase_decoder_fix": True}, {"phase_decoder_fix": True}),
        ({"concat_skip": False}, {"concat_skip": False}),
        ({"interact": "p2m"}, {}),
        ({"dims": (4, 8, 16, 32, 64)}, {"has_latent": True}),  # latent layout
    ],
)
def test_stacked_matches_unstacked(kw, conv_kw):
    dual, stacked = _pair(**kw)
    x, hf = _data()
    params = dual.init(jax.random.PRNGKey(0), x, hf)["params"]
    y_ref = dual.apply({"params": params}, x, hf, deterministic=True)

    sp = stack_dual_params(
        params,
        concat_skip=kw.get("concat_skip", True),
        **{k: v for k, v in conv_kw.items() if k != "concat_skip"},
    )
    y_st = stacked.apply({"params": sp}, x, hf, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(y_st), np.asarray(y_ref), rtol=0, atol=1e-6
    )


def test_stacked_param_shapes():
    dual, stacked = _pair()
    x, hf = _data(batch=1)
    params = dual.init(jax.random.PRNGKey(0), x, hf)["params"]
    sp = stack_dual_params(params)
    # every stacked leaf = unstacked leaf with a leading stream axis of 2
    ref_leaves = jax.tree_util.tree_leaves(params["core_mag"])
    st_leaves = jax.tree_util.tree_leaves(sp["core"])
    assert len(ref_leaves) == len(st_leaves)
    for r, s in zip(ref_leaves, st_leaves):
        assert s.shape == (2,) + r.shape
    # the stacked model's own init produces the same tree structure
    own = stacked.init(jax.random.PRNGKey(1), x, hf)["params"]
    assert jax.tree_util.tree_structure(own) == jax.tree_util.tree_structure(sp)


def test_single_interact_rejected():
    _, stacked = _pair(interact="single")
    x, hf = _data(batch=1)
    with pytest.raises(ValueError):
        stacked.init(jax.random.PRNGKey(0), x, hf)


def test_to_stacked_factory_roundtrip():
    from vm_asr_tpu.core import default_config
    from vm_asr_tpu.models import get_model, to_stacked

    c = default_config()
    c.DATA.TARGET_SR = 16000
    c.DATA.SEGMENT = SEG / 16000
    c.DATA.STFT.N_FFT = 128
    c.DATA.STFT.HOP_LENGTH = 32
    c.DATA.STFT.WIN_LENGTH = 128
    c.MODEL.NAME = "DualStreamInteractiveMambaUNet"
    c.MODEL.VSSM.DIMS = 4
    c.MODEL.VSSM.DEPTHS = [1, 1, 1, 1]
    c.MODEL.VSSM.STACKED_EXECUTION = True
    c.DTYPE.COMPUTE = "float32"
    c.AMP_ENABLE = False

    gen = get_model(c)["generator"]
    x, hf = _data(batch=1, seed=3)
    params = gen.init(jax.random.PRNGKey(0), x, hf)["params"]
    y_ref = gen.apply({"params": params}, x, hf, deterministic=True)

    gen2, params2 = to_stacked(c, gen, params)
    assert gen2 is not gen
    y_st = gen2.apply({"params": params2}, x, hf, deterministic=True)
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref),
                               rtol=0, atol=1e-6)

    # idempotent: already-stacked params pass through untouched
    gen3, params3 = to_stacked(c, gen2, params2)
    assert gen3 is gen2 and params3 is params2


def test_stacked_with_pallas_interpret_scan():
    """The stream-vmap must compose with the fused Pallas scan kernel
    (vmap batching rule over pallas_call / its custom_vjp) — interpret
    mode stands in for the TPU lowering in CI."""
    kw = dict(scan_impl="interpret")
    dual, stacked = _pair(**kw)
    x, hf = _data(batch=1, seed=7)
    params = dual.init(jax.random.PRNGKey(0), x, hf)["params"]
    y_ref = dual.apply({"params": params}, x, hf, deterministic=True)
    y_st = stacked.apply(
        {"params": stack_dual_params(params)}, x, hf, deterministic=True
    )
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
