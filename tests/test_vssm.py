"""VSSM classifier backbone tests (reference vmamba.py:1846-2300)."""

import numpy as np

import jax
import jax.numpy as jnp

from vm_asr_tpu.models import BackboneVSSM, VSSM


def test_vssm_classifier(rng):
    m = VSSM(num_classes=10, dims=8, depths=(1, 1, 1, 1), ssm_d_state=1,
             scan_impl="ref")
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    logits = jax.jit(m.apply)(params, x)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_backbone_features(rng):
    m = BackboneVSSM(dims=8, depths=(1, 1, 1, 1), ssm_d_state=1,
                     out_indices=(0, 1, 2, 3), scan_impl="ref")
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(m.apply)(params, x)
    assert len(feats) == 4
    # stage i output: 32/4/2^i spatial, dims 8·2^i channels — downsampling
    # happens at stage end, so stage 0 is already halved
    assert feats[0].shape == (1, 4, 4, 16)
    assert feats[3].shape == (1, 1, 1, 64)
