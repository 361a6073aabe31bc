"""STFT/iSTFT parity vs torch (golden reference) — reference utils/stft.py."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vm_asr_tpu.dsp import stft as jstft
from vm_asr_tpu.dsp import istft as jistft
from vm_asr_tpu.dsp import wav2spectro, spectro2wav, hann_window


@pytest.mark.parametrize(
    "n_fft,hop,win,normalized,t",
    [
        (1024, 240, 1024, True, 122640),   # 48 kHz production config
        (1024, 80, 1024, True, 40880),     # 16 kHz production config
        (512, 128, 512, False, 16384),
        (1024, 120, 600, False, 12000),    # MultiResolutionSTFT loss resolution
        (2048, 240, 1200, False, 24000),
        (512, 50, 240, False, 9999),
    ],
)
def test_stft_matches_torch(n_fft, hop, win, normalized, t, rng):
    x = rng.standard_normal((2, t)).astype(np.float32)
    wt = torch.hann_window(win)
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=wt,
        normalized=normalized,
        return_complex=True,
    ).numpy()
    got = np.asarray(
        jstft(
            jnp.asarray(x),
            n_fft=n_fft,
            hop_length=hop,
            win_length=win,
            window=hann_window(win),
            normalized=normalized,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize(
    "n_fft,hop,normalized,t",
    [(1024, 240, True, 122640), (1024, 80, True, 40880), (512, 128, False, 16384)],
)
def test_istft_matches_torch(n_fft, hop, normalized, t, rng):
    x = rng.standard_normal((1, t)).astype(np.float32)
    wt = torch.hann_window(n_fft)
    spec_t = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=wt,
        normalized=normalized,
        return_complex=True,
    )
    ref = torch.istft(
        spec_t, n_fft=n_fft, hop_length=hop, window=wt, normalized=normalized
    ).numpy()
    got = np.asarray(
        jistft(
            jnp.asarray(spec_t.numpy()),
            n_fft=n_fft,
            hop_length=hop,
            normalized=normalized,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_wav2spectro_roundtrip(rng):
    """wav2spectro → spectro2wav reconstructs the signal (log2 scale)."""
    t = 40880
    x = rng.standard_normal((1, t)).astype(np.float32) * 0.1
    mag, phase = wav2spectro(jnp.asarray(x), 1024, 80, 1024, "log2")
    assert mag.shape == (1, 513, 512)
    y = spectro2wav(mag, phase, 1024, 80, 1024, "log2")
    np.testing.assert_allclose(np.asarray(y)[..., :t], x, rtol=1e-3, atol=1e-4)


def test_wav2spectro_shapes_48k(rng):
    """48 kHz config: 122640 samples → 513×512 image (SURVEY.md §3.4)."""
    x = rng.standard_normal((2, 122640)).astype(np.float32)
    mag, phase = wav2spectro(jnp.asarray(x), 1024, 240, 1024, "log2")
    assert mag.shape == (2, 513, 512)
    assert phase.shape == (2, 513, 512)


def test_segment_roundtrip(rng):
    from vm_asr_tpu.dsp import unfold_audio, fold_audio

    t = 81760
    x = rng.standard_normal((1, 1, t)).astype(np.float32)
    seg = unfold_audio(jnp.asarray(x), 40880, 2000)
    assert seg.shape == (1, 1, 2, 40880)
    y = np.asarray(fold_audio(seg, t, 40880, 2000))
    # torch.Tensor.unfold drops the tail that doesn't fill a window; the
    # covered region is [0, step + segment) = [0, 79760).
    covered = 38880 + 40880
    np.testing.assert_allclose(y[..., :covered], x[..., :covered], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(y[..., covered:], 0.0)
