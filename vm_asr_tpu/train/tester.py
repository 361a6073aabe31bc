"""Evaluation engine: chunked batch-1 inference, RTF timing, wav export, CSV.

Reference: trainer/tester.py:16-240 + base/base_tester.py. Behaviour:
- clips ≤ one segment: single jitted forward, RTF = wall / audio-seconds
  (with block_until_ready so XLA's async dispatch doesn't fake the timing);
- longer clips: unfold into SEGMENT-length windows with TEST.OVERLAP-sample
  overlap, forward each (batched over segments — a TPU improvement over the
  reference's per-segment Python loop), mean-fold back;
- saves `_up/_orig/_down` wavs as 16-bit PCM and appends a row to
  `results_{16,48}kHz.csv` with the reference's exact column order.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.logging import create_logger
from ..core.tracker import MetricTracker
from ..data.vctk import save_wav
from ..dsp import fold_audio, num_segments, unfold_audio
from ..metrics import get_metrics
from .steps import (
    bucketed_forward,
    make_forward_fn,
    segment_bucket_counts,
    segment_buckets,
)

CSV_COLUMNS = ["sample_rate", "snr", "lsd", "lsd_hf", "lsd_lf", "rtf", "rtf_reciprocal"]
# Appended AFTER the reference's columns (prefix parity preserved) when
# TEST.COMPUTE_RTF is on: the per-clip wall RTF through a dev tunnel is
# H2D-dominated (~10x worse than the same chip on local PCIe — ROADMAP), so
# the CSV also records the device-compute-only RTF, measured per XLA program
# with the diff-D2H protocol (VERDICT r04 item 8).
COMPUTE_COLUMNS = ["rtf_compute", "rtf_compute_reciprocal"]


class Tester:
    def __init__(self, config, generator, gen_params, data_loader, logger=None,
                 output_dir: Optional[str] = None):
        self.config = config
        self.generator = generator
        self.params = gen_params
        self.loader = data_loader
        self.logger = logger or create_logger(config.OUTPUT)
        # TAG encodes `{input_sr}_{target_sr}` (reference base_tester.py:21-22)
        parts = config.TAG.split("_")
        self.input_sr = int(parts[0])
        self.target_sr = int(parts[1])
        self.num_frames_per_seg = int(config.DATA.SEGMENT * self.target_sr)
        self.output_dir = output_dir or config.OUTPUT
        os.makedirs(self.output_dir, exist_ok=True)
        self.forward = make_forward_fn(generator)
        self.metric_fns = get_metrics(config.TRAIN.METRICS)
        self.metrics = MetricTracker()
        # Compute-only RTF decomposition (VERDICT r04 item 8): per-XLA-program
        # device-resident seconds, measured once at warm-up with the
        # differential D2H-anchored protocol. Separates the framework's own
        # speed from host↔device transport (which dominates the wall RTF on
        # a dev tunnel but is ~µs on a TPU VM's local PCIe).
        self.compute_rtf = bool(config.TEST.get("COMPUTE_RTF", True))
        self._program_dt: Dict = {}

    def _num_segments(self, t: int) -> int:
        # Shared with unfold_audio so the warm-up program keys can never
        # drift from the real segmentation (ADVICE r03).
        return num_segments(t, self.num_frames_per_seg, self.config.TEST.OVERLAP)

    def _program_keys(self, shape) -> set:
        """The XLA program signatures a clip of this shape runs through —
        bucket sizes for long clips, the raw shape for single-segment ones."""
        t = shape[-1]
        if t <= self.num_frames_per_seg:
            return {shape}
        return segment_buckets(self._num_segments(t))

    def _measure_program_dt(self, key, iters: int = 4) -> float:
        """Device-resident seconds per execution of one XLA program (a
        bucket size, or a raw single-segment shape), via
        profiling.median_window_dt — the forward chains on its own output
        (same shape), so every timed execution is distinct."""
        from ..core.profiling import median_window_dt

        shape = key if isinstance(key, tuple) else (
            key, 1, self.num_frames_per_seg)
        x = jnp.zeros(shape, jnp.float32)
        hf = jnp.full((shape[0],), self.target_sr // 4, jnp.int32)
        dt, _ = median_window_dt(
            lambda s: self.forward(self.params, s, hf), x, iters=iters)
        return dt

    def _compute_seconds(self, shape) -> float:
        """Predicted device-compute seconds for a clip of this shape from
        the measured per-program times (mirrors bucketed_forward)."""
        t = shape[-1]
        if t <= self.num_frames_per_seg:
            return self._program_dt[shape]
        return sum(self._program_dt[b] * n for b, n in
                   segment_bucket_counts(self._num_segments(t)).items())

    def _forward_chunked(self, x: jnp.ndarray, hf: jnp.ndarray) -> jnp.ndarray:
        """Segment-batched chunked inference (reference tester.py:106-140),
        bucketed so any clip length reuses ≤4 compiled programs."""
        seg_len = self.num_frames_per_seg
        overlap = self.config.TEST.OVERLAP
        t = x.shape[-1]
        if t <= seg_len:
            return self.forward(self.params, x, hf)
        segments = unfold_audio(x, seg_len, overlap)  # (1, 1, S, seg)
        s = segments.shape[2]
        seg_batch = segments.reshape(s, 1, seg_len)
        hf_batch = jnp.broadcast_to(hf, (s,))
        out = bucketed_forward(self.forward, self.params, seg_batch, hf_batch)
        out = out.reshape(1, 1, s, seg_len)
        return fold_audio(out, t, seg_len, overlap)

    def evaluate(self) -> Dict[str, float]:
        self.metrics.reset()
        self.logger.info(
            f"[TEST] {self.input_sr} → {self.target_sr} Hz, "
            f"{len(self.loader)} files"
        )
        warmed_programs = set()
        for i, batch in enumerate(self.loader):
            keys = self._program_keys(batch.wave_input.shape)
            if not keys <= warmed_programs:
                # Untimed warm-up per XLA program (bucket size / raw shape):
                # the first forward through each program bears the compile
                # (tens of seconds on the remote tunnel), which would dwarf
                # that file's RTF. The reference's first file only pays cuDNN
                # autotune; compile-excluded timing is the comparable
                # protocol. Bucketing keeps this bounded at ≤4 programs for
                # ANY set of clip lengths.
                self._forward_chunked(
                    jnp.asarray(batch.wave_input),
                    jnp.asarray(batch.highcut),
                ).block_until_ready()
                if self.compute_rtf:
                    for key in keys - warmed_programs:
                        self._program_dt[key] = self._measure_program_dt(key)
                warmed_programs |= keys
            x = jnp.asarray(batch.wave_input)
            y = jnp.asarray(batch.wave_target)
            hf = jnp.asarray(batch.highcut)
            pad = int(batch.pad_lengths[0])

            t0 = time.time()
            wave_out = self._forward_chunked(x, hf)
            wave_out.block_until_ready()
            # D2H anchor: one element must land on the host before the
            # timer stops — over the remote tunnel block_until_ready can
            # ack before compute completes (local-hardware cost: ~µs, the
            # equivalent of the reference's cuda.synchronize).
            np.asarray(wave_out.ravel()[:1])
            run_time = time.time() - t0
            audio_seconds = (x.shape[-1] - pad) / self.config.DATA.TARGET_SR
            rtf = run_time / max(audio_seconds, 1e-9)

            vals = {
                name: float(fn(wave_out[:, 0, :], y[:, 0, :], hf=hf))
                for name, fn in self.metric_fns.items()
            }
            vals["rtf"] = rtf
            vals["rtf_reciprocal"] = 1.0 / rtf
            if self.compute_rtf:
                rtf_c = (self._compute_seconds(batch.wave_input.shape)
                         / max(audio_seconds, 1e-9))
                vals["rtf_compute"] = rtf_c
                vals["rtf_compute_reciprocal"] = 1.0 / rtf_c
            if "lsd" in self.metric_fns:
                # The floor-to-beat: LSD of the *degraded input* against the
                # target. Logged (not CSV — column parity with the reference)
                # so convergence is measurable without a second eval pass.
                vals["lsd_input"] = float(
                    self.metric_fns["lsd"](x[:, 0, :], y[:, 0, :], hf=hf)
                )
            for k, v in vals.items():
                self.metrics.update(k, v)

            if self.config.TEST.SAVE_RESULT:
                trim = x.shape[-1] - pad if pad else x.shape[-1]
                stem = batch.names[0].replace(".wav", "")
                sr = self.config.DATA.TARGET_SR
                save_wav(os.path.join(self.output_dir, f"{stem}_up.wav"),
                         np.asarray(wave_out[0, 0, :trim]), sr)
                save_wav(os.path.join(self.output_dir, f"{stem}_orig.wav"),
                         np.asarray(y[0, 0, :trim]), sr)
                save_wav(os.path.join(self.output_dir, f"{stem}_down.wav"),
                         np.asarray(x[0, 0, :trim]), sr)

            if i % 10 == 0:
                self.logger.info(
                    f"[TEST] {i + 1}/{len(self.loader)} "
                    + " ".join(f"{k}={v:.4f}" for k, v in vals.items())
                )

        log = self.metrics.result()
        log["sample_rate"] = self.input_sr
        self.logger.info(
            "[TEST] done: " + " ".join(f"{k}={v:.4f}" for k, v in log.items())
        )
        csv_name = (
            "results_16kHz.csv" if self.target_sr == 16000 else "results_48kHz.csv"
        )
        self.save_results_to_csv(log, filename=csv_name)
        return log

    @staticmethod
    def save_results_to_csv(results: Dict[str, float], filename: str) -> None:
        """Append a row with the reference's column order
        (reference tester.py:221-240); the compute-RTF decomposition
        columns, when measured, follow AFTER so the reference's prefix is
        byte-compatible."""
        cols = CSV_COLUMNS + [c for c in COMPUTE_COLUMNS if c in results]
        row = {k: results[k] for k in cols}
        exists = os.path.isfile(filename)
        with open(filename, "a", newline="") as f:
            writer = csv.writer(f)
            if not exists:
                writer.writerow([k.upper() for k in row])
            writer.writerow(row.values())
