"""STFT / iSTFT primitives with torch-compatible semantics, in pure JAX.

The generator's forward path and the LSD metric depend on *exact* torch.stft /
torch.istft behaviour (reference: utils/stft.py:22-115, model/metric.py:5-12,
model/loss.py:17-45):

- hann window (periodic), optionally zero-padded (centred) to ``n_fft``
- ``center=True`` reflect padding of ``n_fft // 2`` on both sides
- ``normalized=True`` multiplies the spectrum by ``n_fft ** -0.5`` (and the
  inverse by ``n_fft ** 0.5``)
- one-sided rfft → ``n_fft // 2 + 1`` frequency bins, output layout
  ``(..., freqs, frames)``
- iSTFT overlap-adds windowed irfft frames, divides by the squared-window
  envelope (NOLA), and trims the centre padding.

Everything here is jit-able, differentiable, and shape-static; FFTs run on the
TPU via XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _pad_window(window: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Centre-pad a window of length ``win_length`` to ``n_fft`` (torch rule)."""
    win_length = window.shape[0]
    if win_length == n_fft:
        return window
    left = (n_fft - win_length) // 2
    return jnp.pad(window, (left, n_fft - win_length - left))


def _frame_indices(num_frames: int, n_fft: int, hop_length: int) -> np.ndarray:
    starts = np.arange(num_frames)[:, None] * hop_length
    return starts + np.arange(n_fft)[None, :]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    normalized: bool = False,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """torch.stft-compatible STFT.

    Args:
        x: real signal ``(..., T)``.
    Returns:
        complex spectrum ``(..., n_fft // 2 + 1, frames)``.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    w = _pad_window(window.astype(x.dtype), n_fft)

    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)

    t_pad = x.shape[-1]
    num_frames = 1 + (t_pad - n_fft) // hop_length
    idx = _frame_indices(num_frames, n_fft, hop_length)
    frames = x[..., idx] * w  # (..., frames, n_fft)

    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    if normalized:
        spec = spec * (1.0 / np.sqrt(n_fft))
    return jnp.swapaxes(spec, -1, -2)  # (..., freqs, frames)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    normalized: bool = False,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """torch.istft-compatible inverse STFT.

    Args:
        spec: complex spectrum ``(..., freqs, frames)``.
    Returns:
        real signal ``(..., length or (frames - 1) * hop_length)``.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, dtype=jnp.float32)
    w = _pad_window(window.astype(jnp.float32), n_fft)

    spec = jnp.swapaxes(spec, -1, -2)  # (..., frames, freqs)
    if normalized:
        spec = spec * np.sqrt(n_fft)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (..., frames, n_fft)
    frames = frames * w

    num_frames = frames.shape[-2]
    t_out = n_fft + hop_length * (num_frames - 1)
    idx = _frame_indices(num_frames, n_fft, hop_length)

    out_shape = frames.shape[:-2] + (t_out,)
    y = jnp.zeros(out_shape, dtype=frames.dtype).at[..., idx].add(frames)
    env = (
        jnp.zeros((t_out,), dtype=frames.dtype)
        .at[idx]
        .add(jnp.broadcast_to(w * w, (num_frames, n_fft)))
    )
    # torch asserts NOLA (min envelope > ~1e-11); divide where valid.
    y = jnp.where(env > 1e-11, y / jnp.where(env > 1e-11, env, 1.0), y)

    if center:
        start = n_fft // 2
        default = (num_frames - 1) * hop_length
        stop = start + (length if length is not None else default)
        y = y[..., start:stop]
    elif length is not None:
        y = y[..., :length]
    return y


# ---------------------------------------------------------------------------
# VM-ASR front-end: waveform <-> (log-magnitude, phase) images
# (reference: utils/stft.py:22-115)
# ---------------------------------------------------------------------------
def amplitude_to_db(power: jnp.ndarray, top_db: float = 80.0) -> jnp.ndarray:
    """torchaudio AmplitudeToDB(stype='power', top_db=80) semantics."""
    db = 10.0 * jnp.log10(jnp.clip(power, 1e-10))
    return jnp.maximum(db, jnp.max(db) - top_db)


def db_to_amplitude(db: jnp.ndarray) -> jnp.ndarray:
    """torchaudio DB_to_amplitude(ref=1, power=1) (reference utils/stft.py:8-19)."""
    return jnp.power(10.0, db * 0.1)


def wav2spectro(
    waveform: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    spectro_scale: str = "log2",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STFT → (magnitude, phase). Matches reference utils/stft.py:22-68.

    log2 scale: ``log2(|S| + 1e-8)``; dB scale: power dB with 80 dB floor.
    Input ``(..., T)`` → outputs ``(..., freqs, frames)``.
    """
    spec = stft(
        waveform,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        normalized=True,
        center=True,
    )
    phase = jnp.angle(spec)
    if spectro_scale == "dB":
        mag = amplitude_to_db(jnp.square(jnp.abs(spec)))
    else:
        mag = jnp.log2(jnp.abs(spec) + 1e-8)
    return mag, phase


def spectro2wav(
    mag: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    spectro_scale: str = "log2",
) -> jnp.ndarray:
    """(magnitude, phase) → waveform. Matches reference utils/stft.py:71-115.

    ``n_fft`` is re-derived from the freq axis (``2 * freqs - 2``) exactly like
    the reference, so outputs with the DC bin re-attached invert correctly.
    """
    freqs = mag.shape[-2]
    n_fft = 2 * freqs - 2
    if spectro_scale == "dB":
        amp = jnp.sqrt(db_to_amplitude(mag))
    else:
        amp = jnp.exp2(mag)
    spec = amp * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    return istft(
        spec,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        normalized=True,
        center=True,
    )
