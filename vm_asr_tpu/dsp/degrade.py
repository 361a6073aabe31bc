"""Host-side audio degradation: low-pass filtering + polyphase resampling.

Reference: data_loader/data_loaders.py:309-347 (`resample_audio`),
538-566 (`lowpass`), 523-535 (`align_waveform`). These run on CPU in the input
pipeline (numpy/scipy), exactly like the reference runs them in DataLoader
workers — data randomness stays off-device.

Reference quirk, preserved deliberately: `_get_io_pair`
(data_loaders.py:457-478) computes the low-passed signal but then resamples the
*original* target (the lowpass result is discarded; `resample_poly`'s own
anti-aliasing filter is what actually band-limits the input). Set
``apply_lpf=True`` to additionally apply the explicit filter before
downsampling.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.signal import bessel, butter, cheby1, ellip, resample_poly, sosfiltfilt


def _native():
    """C++ fast path (native/src/vm_asr_native.cpp), bit-exact vs scipy."""
    try:
        from ..data import native

        return native if native.available() else None
    except Exception:
        return None


def lowpass(
    audio: np.ndarray,
    highcut: float,
    filter_: Tuple[str, int] = ("cheby1", 8),
    sr: int = 48000,
) -> np.ndarray:
    """Zero-phase IIR low-pass (reference data_loaders.py:538-566)."""
    nyq = sr / 2.0
    wn = highcut / nyq
    kind, order = filter_[0], int(filter_[1])
    if kind == "butter":
        sos = butter(order, wn, btype="lowpass", output="sos")
    elif kind == "cheby1":
        sos = cheby1(order, 0.05, wn, btype="lowpass", output="sos")
    elif kind == "bessel":
        sos = bessel(order, wn, norm="mag", btype="lowpass", output="sos")
    elif kind == "ellip":
        sos = ellip(order, 0.05, 20, wn, btype="lowpass", output="sos")
    else:
        raise ValueError(f"Unknown filter kind: {kind}")
    nat = _native()
    if nat is not None and audio.ndim == 1 and sos.shape[0] <= 16:
        try:
            return nat.sosfiltfilt(sos, audio.astype(np.float32, copy=False))
        except ValueError:
            pass  # too-short input: fall through to scipy's error semantics
    return sosfiltfilt(sos, audio, axis=-1).astype(np.float32, copy=False)


def resample_audio(waveform: np.ndarray, sr_org: int, sr_new: int) -> np.ndarray:
    """Polyphase resampling (reference data_loaders.py:338-345, scipy path)."""
    nat = _native()
    if nat is not None and waveform.ndim == 1:
        return nat.resample_poly(
            waveform.astype(np.float32, copy=False), sr_new, sr_org
        )
    return resample_poly(waveform, sr_new, sr_org, axis=-1).astype(
        np.float32, copy=False
    )


def align_waveform(resampled: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Pad/trim ``resampled`` to the length of ``target``
    (reference data_loaders.py:523-535)."""
    t = target.shape[-1]
    r = resampled.shape[-1]
    if r < t:
        pad = [(0, 0)] * (resampled.ndim - 1) + [(0, t - r)]
        return np.pad(resampled, pad)
    return resampled[..., :t]


def degrade(
    target: np.ndarray,
    sr_target: int,
    sr_input: int,
    filter_: Tuple[str, int],
    n_fft: int,
    apply_lpf: bool = False,
) -> Tuple[np.ndarray, int]:
    """Produce the LR input from the HR target.

    Returns ``(input_waveform, highcut_bin)`` where
    ``highcut_bin = int((1 + n_fft // 2) * sr_input / sr_target)``
    (reference data_loaders.py:482-486).
    """
    if sr_input != sr_target:
        src = target
        if apply_lpf:
            src = lowpass(src, int(sr_input * 0.5), filter_, sr_target)
        down = resample_audio(src, sr_target, sr_input)
        up = resample_audio(down, sr_input, sr_target)
        x = align_waveform(up, target)
    else:
        x = target
    highcut = int((1 + n_fft // 2) * (sr_input / sr_target))
    return x, highcut
