"""C++ host-DSP core parity vs scipy (native/src/vm_asr_native.cpp).

The library is built by native/build.sh; tests skip when it's absent so the
suite stays green on machines without a toolchain.
"""

import numpy as np
import pytest
from scipy.signal import bessel, cheby1, ellip, resample_poly, sosfiltfilt

from vm_asr_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libvm_asr_native.so not built"
)


@pytest.mark.parametrize("up,down", [(1, 3), (2, 3), (3, 1), (160, 441),
                                     (441, 160), (6, 1), (1, 6), (5, 5)])
def test_resample_poly_parity(up, down, rng):
    x = rng.standard_normal(48000).astype(np.float32)
    a = native.resample_poly(x, up, down)
    b = resample_poly(x.astype(np.float64), up, down).astype(np.float32)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize(
    "sos",
    [
        cheby1(6, 0.05, 0.25, btype="lowpass", output="sos"),
        cheby1(12, 0.05, 0.6, btype="lowpass", output="sos"),
        bessel(12, 0.3, norm="mag", btype="lowpass", output="sos"),
        ellip(6, 0.05, 20, 0.4, btype="lowpass", output="sos"),
    ],
)
def test_sosfiltfilt_parity(sos, rng):
    x = rng.standard_normal(20000).astype(np.float32)
    a = native.sosfiltfilt(sos, x)
    b = sosfiltfilt(sos, x.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_pcm_roundtrip(rng):
    x = rng.uniform(-0.9, 0.9, 1000).astype(np.float32)
    pcm = native.f32_to_pcm16(x)
    back = native.pcm16_to_f32(pcm)
    # encode scales by 32767, decode by 1/32768 (the reference's own PCM
    # convention) → ~2^-15 systematic error plus rounding
    np.testing.assert_allclose(back, x, atol=1.0 / 16000)


def test_degrade_uses_native(rng):
    """The degradation path produces identical results with/without native."""
    import importlib

    # the package re-exports the `degrade` function under the same name,
    # so fetch the submodule explicitly
    deg_mod = importlib.import_module("vm_asr_tpu.dsp.degrade")

    x = rng.standard_normal(48000).astype(np.float32)
    fast, hc1 = deg_mod.degrade(x, 48000, 16000, ("cheby1", 6), 1024,
                                apply_lpf=True)
    # force scipy fallback
    orig = deg_mod._native
    deg_mod._native = lambda: None
    try:
        slow, hc2 = deg_mod.degrade(x, 48000, 16000, ("cheby1", 6), 1024,
                                    apply_lpf=True)
    finally:
        deg_mod._native = orig
    assert hc1 == hc2
    np.testing.assert_allclose(fast, slow, atol=1e-4)
