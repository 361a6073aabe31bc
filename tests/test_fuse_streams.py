"""FUSE_STREAMS decoder batching: identical math, fewer dispatches.

The production dual-stream model (PHASE_DECODER_FIX False) routes both
streams through core_mag's decoder (reference model.py:1148). With
MODEL.VSSM.FUSE_STREAMS the two decode calls batch into one along the
batch axis; per-sample results must be exactly identical in deterministic
mode because nothing in the decoder mixes batch elements.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vm_asr_tpu.core import default_config
from vm_asr_tpu.models import get_model


def _tiny_config(fuse: bool):
    c = default_config()
    c.DATA.TARGET_SR = 16000
    c.DATA.SEGMENT = 0.126  # 2016 samples → 64×64 image at n_fft 128/hop 32
    c.DATA.STFT.N_FFT = 128
    c.DATA.STFT.HOP_LENGTH = 32
    c.DATA.STFT.WIN_LENGTH = 128
    c.MODEL.NAME = "DualStreamInteractiveMambaUNet"
    c.MODEL.VSSM.DIMS = 4
    c.MODEL.VSSM.DEPTHS = [1, 1, 1, 1]
    c.MODEL.VSSM.FUSE_STREAMS = fuse
    c.TENSORBOARD.ENABLE = False
    c.DTYPE.COMPUTE = "float32"
    c.AMP_ENABLE = False
    return c


@pytest.mark.parametrize("concat_skip", [True, False])
def test_fused_matches_unfused(concat_skip):
    cfgs = []
    for fuse in (False, True):
        c = _tiny_config(fuse)
        c.MODEL.VSSM.CONCAT_SKIP = concat_skip
        cfgs.append(c)
    gen_ref = get_model(cfgs[0])["generator"]
    gen_fused = get_model(cfgs[1])["generator"]

    seg = int(cfgs[0].DATA.SEGMENT * cfgs[0].DATA.TARGET_SR)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 1, seg)).astype(np.float32) * 0.1)
    hf = jnp.full((2,), 33, jnp.int32)

    params = gen_ref.init(jax.random.PRNGKey(0), x, hf)["params"]
    y_ref = gen_ref.apply({"params": params}, x, hf, deterministic=True)
    # identical param tree: fusing changes call structure, not parameters
    y_fused = gen_fused.apply({"params": params}, x, hf, deterministic=True)

    # Per-sample math is identical, but XLA may tile the batch-2B convs
    # differently from batch-B on some backends (observed ~1e-7 rel on the
    # analogous discriminator batching) — float tolerance, not bitwise.
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_fused), rtol=1e-5, atol=1e-6
    )


def test_fuse_disabled_under_phase_decoder_fix():
    # With PHASE_DECODER_FIX the streams use different decoder weights —
    # fusing must silently not apply (outputs equal the unfused fixed path).
    c_fix = _tiny_config(False)
    c_fix.MODEL.VSSM.PHASE_DECODER_FIX = True
    c_both = _tiny_config(True)
    c_both.MODEL.VSSM.PHASE_DECODER_FIX = True

    gen_fix = get_model(c_fix)["generator"]
    gen_both = get_model(c_both)["generator"]

    seg = int(c_fix.DATA.SEGMENT * c_fix.DATA.TARGET_SR)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 1, seg)).astype(np.float32) * 0.1)
    hf = jnp.full((1,), 33, jnp.int32)

    params = gen_fix.init(jax.random.PRNGKey(0), x, hf)["params"]
    y_fix = gen_fix.apply({"params": params}, x, hf, deterministic=True)
    y_both = gen_both.apply({"params": params}, x, hf, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_fix), np.asarray(y_both))
