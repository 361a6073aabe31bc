"""Host input pipeline: fixed-shape batches with on-the-fly degradation.

Reference: data_loader/data_loaders.py:25-79 (loader factory + 90/10
random_split) and 349-520 (per-sample load → pad → random-SR degrade).

TPU-first design:
- all randomness (SR draw, filter choice, padding noise) stays on the host
  (numpy RNG), exactly like the reference keeps it in DataLoader workers;
- every batch has the same static shape (SEGMENT seconds × TARGET_SR), so the
  jitted train step never retraces;
- a thread pool overlaps the scipy filtering/resampling with device compute
  (the analogue of DataLoader workers + pinned-memory prefetch,
  reference trainer.py:134-135).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..dsp.degrade import degrade


@dataclass
class Batch:
    wave_input: np.ndarray   # (B, 1, T) float32
    wave_target: np.ndarray  # (B, 1, T) float32
    highcut: np.ndarray      # (B,) int32
    names: List[str]
    pad_lengths: np.ndarray  # (B,) int32


class DegradingSampler:
    """Turns dataset items into fixed-length (input, target, highcut) tuples."""

    def __init__(self, dataset, config, training: bool = True,
                 input_sr: Optional[int] = None,
                 exact_length: Optional[bool] = None):
        self.dataset = dataset
        self.config = config
        self.training = training
        self.input_sr = input_sr
        # Train: crop/pad to exactly one segment. Eval: pad to a segment
        # *multiple* and keep the full clip — the Tester chunks it via
        # unfold/fold (reference data_loaders.py:371-389, tester.py:106-140).
        self.exact_length = training if exact_length is None else exact_length
        d = config.DATA
        self.target_sr = d.TARGET_SR
        self.num_frames = int(d.SEGMENT * self.target_sr)
        self.pad_eps = d.PAD_WHITENOISE
        self.n_fft = d.STFT.N_FFT
        self.filters = [tuple(f) for f in (
            d.LPF.LPF_TRAIN if training else d.LPF.LPF_TEST
        )]
        self.random_resample = list(d.RANDOM_RESAMPLE)
        self.weighted = d.WEIGHTED_SR

    def _draw_input_sr(self, rng: np.random.Generator) -> int:
        if self.input_sr is not None:
            return self.input_sr
        if len(self.random_resample) == 1:
            return int(self.random_resample[0])
        if self.weighted.ENABLE:
            # Lower SRs drawn with higher probability
            # (reference data_loaders.py:440-447).
            ridx = rng.choice(len(self.weighted.RANGES), p=self.weighted.WEIGHTS)
            lo, hi = self.weighted.RANGES[ridx]
        else:
            lo, hi = self.random_resample[0], self.random_resample[-1]
        return int(rng.integers(lo, hi + 1))

    def _fit_length(self, audio: np.ndarray, rng: np.random.Generator,
                    exact: bool = True) -> Tuple[np.ndarray, int]:
        """Pad with white noise to the segment length (train) or to a segment
        multiple (eval) (reference data_loaders.py:371-389)."""
        n = self.num_frames
        t = audio.shape[-1]
        if exact and t > n:
            return audio[:n], 0
        if exact:
            pad = n - t
        else:
            pad = (n - t % n) % n
        if pad:
            noise = rng.standard_normal(pad).astype(np.float32) * self.pad_eps
            audio = np.concatenate([audio, noise], axis=-1)
        return audio, pad

    def sample(self, index: int, rng: np.random.Generator,
               exact_length: Optional[bool] = None):
        if exact_length is None:
            exact_length = self.exact_length
        audio, sr, name = self.dataset.load(index)
        if sr != self.target_sr:
            from ..dsp.degrade import resample_audio

            audio = resample_audio(audio, sr, self.target_sr)
        audio, pad = self._fit_length(audio.astype(np.float32), rng, exact_length)

        sr_in = self._draw_input_sr(rng)
        filt = self.filters[rng.integers(len(self.filters))]
        x, highcut = degrade(audio, self.target_sr, sr_in, filt, self.n_fft)
        return x, audio, highcut, name, pad


class DataPipeline:
    """Shuffled, threaded, fixed-shape batch iterator."""

    def __init__(self, sampler: DegradingSampler, batch_size: int,
                 indices: Optional[Sequence[int]] = None, shuffle: bool = True,
                 seed: int = 123, num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 2):
        self.sampler = sampler
        self.batch_size = batch_size
        self.indices = list(indices if indices is not None
                            else range(len(sampler.dataset)))
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        b = self.batch_size
        return n // b if self.drop_last else -(-n // b)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _epoch_indices(self) -> List[int]:
        idx = list(self.indices)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Batch]:
        idx = self._epoch_indices()
        if self.drop_last:
            idx = idx[: len(self) * self.batch_size]
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        base_seed = (self.seed * 1_000_003 + self._epoch) % (2**31)

        def make_batch(bi: int, members: List[int]) -> Batch:
            outs = []
            for j, index in enumerate(members):
                rng = np.random.default_rng(
                    [base_seed, bi * self.batch_size + j]
                )
                outs.append(self.sampler.sample(index, rng))
            xs, ys, hcs, names, pads = zip(*outs)
            return Batch(
                wave_input=np.stack(xs)[:, None, :],
                wave_target=np.stack(ys)[:, None, :],
                highcut=np.asarray(hcs, np.int32),
                names=list(names),
                pad_lengths=np.asarray(pads, np.int32),
            )

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [
                    pool.submit(make_batch, bi, members)
                    for bi, members in enumerate(batches)
                ]
                for f in futures:
                    if stop.is_set():
                        break
                    q.put(f.result())
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


def train_valid_split(n: int, valid_split: float, seed: int = 42
                      ) -> Tuple[List[int], List[int]]:
    """90/10 random split with a fixed generator
    (reference data_loaders.py:31-38, torch.random_split(seed=42))."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_valid = int(n * valid_split)
    return list(perm[n_valid:]), list(perm[:n_valid])


def get_loaders(config, logger=None, dataset=None):
    """Loader factory (reference data_loaders.py:25-79).

    Returns (train_pipeline, valid_pipeline) in training mode or a single test
    pipeline in eval mode. ``dataset`` may be injected (e.g. SyntheticVCTK);
    otherwise the VCTK corpus at DATA.DATA_PATH is used.
    """
    from .vctk import VCTKDataset

    training = not config.EVAL_MODE
    pipeline_cls = DataPipeline
    if config.DATA.get("PIPELINE", "threads") == "grain":
        from .grain_pipeline import GrainPipeline

        pipeline_cls = GrainPipeline
    if dataset is None:
        root = f"{config.DATA.DATA_PATH.rstrip('/')}/{config.DATA.FLAC2WAV.DST_PATH}"
        # Reference behaviour (data_loaders.py:95-103): when the trimmed wav
        # tree is missing, convert the raw flac corpus in place. (The
        # reference also auto-DOWNLOADS via torchaudio; impossible without
        # egress — the raw tree must already be on disk.)
        if not os.path.isdir(root):
            from .vctk import convert_flac_corpus

            flac_root = os.path.join(
                config.DATA.DATA_PATH, "VCTK-Corpus-0.92",
                "wav48_silence_trimmed",
            )
            if os.path.isdir(flac_root):
                # Multi-host: only process 0 converts (per-file writes are
                # atomic, but N hosts converting the same 44k files at once
                # is wasteful); the rest wait on a done-marker.
                import time as _time

                import jax as _jax

                done_marker = root.rstrip("/") + ".converted"
                if _jax.process_index() == 0:
                    if logger:
                        logger.info(
                            "Trimmed wav files not found — converting flac "
                            f"to wav ({flac_root} → {root})"
                        )
                    convert_flac_corpus(
                        flac_root, root, config.DATA.FLAC2WAV.TIMESTAMPS,
                        mic_id=config.DATA.MIC_ID,
                    )
                    with open(done_marker, "w") as f:
                        f.write("ok\n")
                else:
                    while not os.path.exists(done_marker):
                        _time.sleep(5.0)
        dataset = VCTKDataset(
            root,
            training=training,
            mic_id=config.DATA.MIC_ID,
            train_split=tuple(config.DATA.TRAIN_SPLIT),
            use_quantity=config.DATA.USE_QUANTITY,
            seed=config.SEED,
        )

    if training:
        sampler = DegradingSampler(dataset, config, training=True)
        tr_idx, va_idx = train_valid_split(len(dataset), config.DATA.VALID_SPLIT)
        common = dict(
            batch_size=config.DATA.BATCH_SIZE,
            seed=config.SEED,
            num_workers=config.DATA.NUM_WORKERS,
        )
        train = pipeline_cls(sampler, indices=tr_idx,
                             shuffle=config.DATA.SHUFFLE, **common)
        valid = pipeline_cls(sampler, indices=va_idx, shuffle=False, **common)
        if logger:
            logger.info(
                f"Data: {len(tr_idx)} train / {len(va_idx)} valid samples"
            )
        return train, valid

    # Eval: batch 1, unshuffled, input SR parsed from the TAG
    # (reference data_loaders.py:67-76, 455).
    input_sr = int(config.TAG.split("_")[0])
    sampler = DegradingSampler(dataset, config, training=False, input_sr=input_sr)
    return pipeline_cls(
        sampler, batch_size=1, shuffle=False, seed=config.SEED,
        num_workers=config.DATA.NUM_WORKERS, drop_last=False,
    )
