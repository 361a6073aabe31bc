"""Overlap-add segmentation for long-audio inference.

Reference: utils/post_processing.py:4-33 (`unfold_audio` / `fold_audio`).
Long clips are unfolded into fixed-length segments (static shapes → no XLA
retracing), processed per segment, then mean-folded back.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def num_segments(t: int, segment_length: int, overlap: int) -> int:
    """Number of windows :func:`unfold_audio` produces for a ``T``-sample
    clip — the single source of truth for segment counts (callers that
    pre-compute XLA program keys must agree with the real segmentation)."""
    step = segment_length - overlap
    return 1 + max(0, (t - segment_length)) // step


def unfold_audio(audio: jnp.ndarray, segment_length: int, overlap: int) -> jnp.ndarray:
    """``(..., T)`` → ``(..., num_segments, segment_length)`` with stride
    ``segment_length - overlap`` (torch.Tensor.unfold semantics: trailing
    samples that don't fill a window are dropped)."""
    step = segment_length - overlap
    t = audio.shape[-1]
    num_segments = 1 + max(0, (t - segment_length)) // step
    starts = np.arange(num_segments)[:, None] * step
    idx = starts + np.arange(segment_length)[None, :]
    return audio[..., idx]


def fold_audio(
    segments: jnp.ndarray, total_length: int, segment_length: int, overlap: int
) -> jnp.ndarray:
    """Inverse of :func:`unfold_audio` with count-normalised averaging in the
    overlaps (reference utils/post_processing.py:12-33)."""
    step = segment_length - overlap
    num_segments = segments.shape[-2]
    starts = np.arange(num_segments)[:, None] * step
    idx = starts + np.arange(segment_length)[None, :]

    out_shape = segments.shape[:-2] + (total_length,)
    acc = jnp.zeros(out_shape, dtype=segments.dtype).at[..., idx].add(segments)
    count = (
        jnp.zeros((total_length,), dtype=segments.dtype)
        .at[idx]
        .add(jnp.ones((num_segments, segment_length), dtype=segments.dtype))
    )
    count = jnp.where(count == 0, 1.0, count)
    return acc / count
