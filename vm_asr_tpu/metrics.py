"""Evaluation metrics: SNR, LSD, LSD-HF, LSD-LF (reference model/metric.py).

All metrics are jit-able jnp functions over (B, T) waveforms. The HF/LF
variants take a per-sample highcut bin ``hf`` and use masked means instead of
the reference's Python loop over the batch (metric.py:32-67) — same numbers,
one fused kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from .dsp import hann_window, stft


def _log_power_spec(x: jnp.ndarray, n_fft: int = 2048, hop: int = 512) -> jnp.ndarray:
    """log10(|STFT|²) with 1e-8 floor, (B, freqs, frames)
    (reference metric.py:5-12, 26-28: torch.stft center=True, unnormalised)."""
    spec = stft(
        x, n_fft=n_fft, hop_length=hop, window=hann_window(n_fft), center=True
    )
    mag = jnp.sqrt(jnp.square(spec.real) + jnp.square(spec.imag))
    return jnp.log10(jnp.clip(jnp.square(mag), 1e-8))


def snr(output: jnp.ndarray, target: jnp.ndarray, **_) -> jnp.ndarray:
    """Mean per-sample SNR in dB (reference metric.py:15-23)."""
    num = jnp.linalg.norm(target, axis=-1)
    den = jnp.clip(jnp.linalg.norm(output - target, axis=-1), 1e-8)
    return jnp.mean(20.0 * jnp.log10(num / den))


def lsd(output: jnp.ndarray, target: jnp.ndarray, **_) -> jnp.ndarray:
    """Log-spectral distance (reference metric.py:26-29):
    mean over frames of sqrt(mean over freqs of squared log-power diff)."""
    sp = _log_power_spec(output)
    st = _log_power_spec(target)
    return jnp.mean(jnp.sqrt(jnp.mean(jnp.square(sp - st), axis=-2)))


def _lsd_band(output, target, hf, high: bool) -> jnp.ndarray:
    sp = _log_power_spec(output)
    st = _log_power_spec(target)
    freqs = sp.shape[-2]
    idx = jnp.arange(freqs)[None, :, None]
    mask = (idx >= hf[:, None, None]) if high else (idx < hf[:, None, None])
    mask = mask.astype(sp.dtype)
    cnt = jnp.clip(jnp.sum(mask, axis=-2), 1.0)
    mse_f = jnp.sum(jnp.square(sp - st) * mask, axis=-2) / cnt  # (B, frames)
    return jnp.mean(jnp.sqrt(mse_f))


def lsd_hf(output: jnp.ndarray, target: jnp.ndarray, hf: jnp.ndarray) -> jnp.ndarray:
    """LSD restricted to bins ≥ hf (reference metric.py:32-48)."""
    return _lsd_band(output, target, hf, high=True)


def lsd_lf(output: jnp.ndarray, target: jnp.ndarray, hf: jnp.ndarray) -> jnp.ndarray:
    """LSD restricted to bins < hf (reference metric.py:51-67)."""
    return _lsd_band(output, target, hf, high=False)


METRICS = {"snr": snr, "lsd": lsd, "lsd_hf": lsd_hf, "lsd_lf": lsd_lf}


def get_metrics(names):
    return {n: METRICS[n] for n in names}
