"""bf16 activation path: the fused scan ingests bf16, computes fp32, and the
bf16 model forward stays close to fp32 (the AMP-replacement path)."""

import numpy as np

import jax
import jax.numpy as jnp

from vm_asr_tpu.models import SS2D
from vm_asr_tpu.ops import selective_scan


def test_fused_scan_bf16_inputs(rng):
    b, k, l, d = 1, 4, 70, 32
    u = rng.standard_normal((b, l, k, d)).astype(np.float32)
    dts = rng.uniform(-1, 1, (b, l, k, d)).astype(np.float32)
    A = -np.exp(rng.uniform(-1, 1, (k, d, 1))).astype(np.float32)
    Bs = rng.standard_normal((b, l, k, 1)).astype(np.float32)
    Cs = rng.standard_normal((b, l, k, 1)).astype(np.float32)
    Dsk = rng.standard_normal((k, d)).astype(np.float32)
    bias = rng.uniform(0, 1, (k, d)).astype(np.float32)

    f32 = [jnp.asarray(x) for x in (u, dts, A, Bs, Cs, Dsk, bias)]
    bf16 = [
        a.astype(jnp.bfloat16) if i in (0, 1, 3, 4) else a
        for i, a in enumerate(f32)
    ]
    y32 = selective_scan(*f32, True, impl="interpret")
    y16 = selective_scan(*bf16, True, impl="interpret")
    assert y16.dtype == jnp.bfloat16
    rel = float(
        jnp.abs(y16.astype(jnp.float32) - y32).max() / jnp.abs(y32).max()
    )
    assert rel < 0.05, rel

    # gradients flow with matching dtypes
    g = jax.grad(
        lambda u_: jnp.sum(
            selective_scan(u_, *bf16[1:], True, impl="interpret").astype(
                jnp.float32
            )
            ** 2
        )
    )(bf16[0])
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_ss2d_bf16_close_to_f32(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    m32 = SS2D(d_model=8, d_state=1, scan_impl="ref", dtype=jnp.float32)
    m16 = SS2D(d_model=8, d_state=1, scan_impl="ref", dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), x)
    y32 = np.asarray(m32.apply(params, x))
    y16 = np.asarray(m16.apply(params, x), np.float32)
    rel = np.abs(y16 - y32).max() / (np.abs(y32).max() + 1e-9)
    assert rel < 0.1, rel


def test_scan_fp32_io_flag(rng):
    """MODEL.VSSM.SCAN_FP32_IO (reference force_fp32, vmamba.py:842-848):
    with the flag on, bf16 activations are cast to fp32 at the scan
    boundary, so the SS2D bf16 output moves strictly closer to the fp32
    reference than the bf16-IO default."""
    from vm_asr_tpu.ops import scan_api

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    m32 = SS2D(d_model=8, d_state=1, scan_impl="ref", dtype=jnp.float32)
    m16 = SS2D(d_model=8, d_state=1, scan_impl="ref", dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), x)
    y32 = np.asarray(m32.apply(params, x))
    y16_off = np.asarray(m16.apply(params, x), np.float32)
    scan_api.set_scan_fp32_io(True)
    try:
        y16_on = np.asarray(m16.apply(params, x), np.float32)
    finally:
        scan_api.set_scan_fp32_io(False)
    err_off = np.abs(y16_off - y32).max()
    err_on = np.abs(y16_on - y32).max()
    assert np.isfinite(err_on)
    assert err_on <= err_off + 1e-7, (err_on, err_off)


def test_scan_fp32_io_config_plumbing(tmp_path):
    """The factory flips the trace-time global from MODEL.VSSM.SCAN_FP32_IO."""
    from vm_asr_tpu.core import default_config
    from vm_asr_tpu.models import get_model
    from vm_asr_tpu.ops import scan_api

    c = default_config()
    c.MODEL.NAME = "MambaUNet"
    c.MODEL.VSSM.DIMS = 4
    c.MODEL.VSSM.DEPTHS = [1, 1, 1, 1]
    c.MODEL.VSSM.SCAN_FP32_IO = True
    try:
        get_model(c)
        assert scan_api._SCAN_FP32_IO is True
    finally:
        scan_api.set_scan_fp32_io(False)
