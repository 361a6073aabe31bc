"""Inference engine for arbitrary wav files/directories.

Reference: trainer/inferencer.py:16-237 + base/base_inference.py. Loads a wav,
resamples it to the target SR, mono-mixes, pads with white noise to a segment
multiple, runs the (chunked) forward and writes `<stem>_enhanced.wav`.

Reference quirk preserved: ``highcut`` is computed *after* resampling to the
target rate (inferencer.py:227-230), so it evaluates to the full band
(1 + n_fft // 2) whenever the tag's target SR equals DATA.TARGET_SR —
regardless of the true input bandwidth.
"""

from __future__ import annotations

import glob
import os
import time
from pathlib import Path
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.logging import create_logger
from ..data.vctk import load_wav, save_wav
from ..dsp import fold_audio, unfold_audio
from ..dsp.degrade import resample_audio
from .steps import bucketed_forward, make_forward_fn


class Inferencer:
    def __init__(self, config, generator, gen_params, logger=None,
                 output_dir: Optional[str] = None):
        self.config = config
        self.generator = generator
        self.params = gen_params
        self.logger = logger or create_logger(config.OUTPUT)
        parts = config.TAG.split("_")
        self.input_sr = int(parts[0])
        self.target_sr = int(parts[1])
        self.num_frames_per_seg = int(config.DATA.SEGMENT * self.target_sr)
        self.output_dir = output_dir or os.path.join(
            config.INFERENCE.RESULTS_DIR, config.MODEL.NAME
        )
        os.makedirs(self.output_dir, exist_ok=True)
        self.forward = make_forward_fn(generator)

    # -- input loading (reference inferencer.py:183-237) ----------------------
    def load_input(self, file_path: str):
        audio, sr = load_wav(file_path)
        if sr != self.target_sr:
            audio = resample_audio(audio, sr, self.target_sr)
            sr = self.target_sr

        seg = self.num_frames_per_seg
        t = audio.shape[-1]
        pad = (seg - t) if t < seg else (seg - t % seg) % seg
        if pad:
            noise = (
                np.random.default_rng(0).standard_normal(pad).astype(np.float32)
                * self.config.DATA.PAD_WHITENOISE
            )
            audio = np.concatenate([audio, noise])

        highcut = int(
            (1 + self.config.DATA.STFT.N_FFT // 2)
            * (sr / self.config.DATA.TARGET_SR)
        )
        return (
            jnp.asarray(audio[None, None, :]),
            jnp.asarray([highcut], jnp.int32),
            pad,
        )

    def _forward_chunked(self, x, hf):
        seg_len = self.num_frames_per_seg
        overlap = self.config.INFERENCE.OVERLAP
        t = x.shape[-1]
        if t <= seg_len:
            return self.forward(self.params, x, hf)
        segments = unfold_audio(x, seg_len, overlap)
        s = segments.shape[2]
        out = bucketed_forward(
            self.forward,
            self.params,
            segments.reshape(s, 1, seg_len),
            jnp.broadcast_to(hf, (s,)),
        ).reshape(1, 1, s, seg_len)
        return fold_audio(out, t, seg_len, overlap)

    def infer_file(self, file_path: str, output_dir: Optional[str] = None,
                   quiet: bool = False):
        if not os.path.exists(file_path):
            self.logger.error(f"File not found: {file_path}")
            return None
        output_dir = output_dir or self.output_dir
        os.makedirs(output_dir, exist_ok=True)

        x, hf, _pad = self.load_input(file_path)
        t0 = time.time()
        wave_out = self._forward_chunked(x, hf)
        wave_out.block_until_ready()
        if not quiet:
            self.logger.info(f"Processing completed in {time.time() - t0:.2f}s")

        stem = Path(file_path).stem
        out_path = os.path.join(output_dir, f"{stem}_enhanced.wav")
        save_wav(out_path, np.asarray(wave_out[0, 0]), self.target_sr)
        if not quiet:
            self.logger.info(f"Enhanced audio saved to {out_path}")
        return wave_out

    def infer_directory(self, dir_path: str, output_dir: Optional[str] = None,
                        file_types=(".wav",)) -> List[str]:
        if not os.path.exists(dir_path):
            self.logger.error(f"Directory not found: {dir_path}")
            return []
        output_dir = output_dir or os.path.join(
            self.output_dir, os.path.basename(dir_path)
        )
        os.makedirs(output_dir, exist_ok=True)

        files = []
        for ext in file_types:
            files.extend(glob.glob(os.path.join(dir_path, f"*{ext}")))
        if not files:
            self.logger.warning(f"No audio files found in {dir_path}")
            return []
        self.logger.info(f"Found {len(files)} audio files to process")

        processed = []
        for fp in sorted(files):
            out = self.infer_file(fp, output_dir, quiet=True)
            if out is not None:
                processed.append(
                    os.path.join(output_dir, f"{Path(fp).stem}_enhanced.wav")
                )
        self.logger.info(f"Processed {len(processed)} files")
        return processed
