"""TensorBoard writer proxy + audio/waveform/spectrogram artifact logging.

Reference: logger/visualization.py:9-257. The proxy injects the current step
and a `tag/mode` prefix into every call and measures steps/sec; artifact
helpers render waveform plots and 3-panel spectrograms (log2 / dB / phase)
via matplotlib into image tensors.

The writer backend is torch.utils.tensorboard (available in this image) and
is lazily imported; when TENSORBOARD.ENABLE is false everything becomes a
no-op, so headless training has zero extra deps.
"""

from __future__ import annotations

import time
import numpy as np


class TensorboardWriter:
    _SCALAR_FNS = {
        "add_scalar", "add_scalars", "add_audio", "add_image", "add_figure",
        "add_histogram", "add_text",
    }

    def __init__(self, log_dir: str, logger=None, enabled: bool = True):
        self.writer = None
        self.enabled = enabled
        if enabled:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except Exception as e:  # pragma: no cover
                if logger:
                    logger.warning(f"TensorBoard unavailable: {e}")
                self.enabled = False
        self.step = 0
        self.mode = ""
        self._timer = time.time()

    def set_step(self, step: int, mode: str = "train") -> None:
        self.mode = mode
        self.step = step
        if step == 0:
            self._timer = time.time()
        else:
            dt = time.time() - self._timer
            if self.enabled and dt > 0:
                self.writer.add_scalar(f"{mode}/steps_per_sec", 1.0 / dt, step)
            self._timer = time.time()

    def __getattr__(self, name):
        if name in self._SCALAR_FNS:
            if not self.enabled:
                return lambda *a, **k: None
            fn = getattr(self.writer, name)

            def wrapped(tag, *args, **kwargs):
                kwargs.setdefault("global_step", self.step)
                return fn(f"{tag}/{self.mode}" if self.mode else tag, *args, **kwargs)

            return wrapped
        raise AttributeError(name)

    def flush(self):
        if self.enabled:
            self.writer.flush()

    # -- artifact helpers (reference visualization.py:94-257) ----------------
    def log_audio(self, tag: str, wave: np.ndarray, sample_rate: int) -> None:
        if not self.enabled:
            return
        import torch

        self.add_audio(tag, torch.from_numpy(np.asarray(wave).reshape(1, -1)),
                       sample_rate=sample_rate)

    def log_waveform(self, tag: str, wave: np.ndarray) -> None:
        if not self.enabled:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 3))
        ax.plot(np.asarray(wave).reshape(-1))
        ax.set_xlabel("sample")
        ax.set_ylabel("amplitude")
        self.add_figure(tag, fig)
        plt.close(fig)

    def log_outputs(self, wave_in: np.ndarray, wave_out: np.ndarray,
                    wave_target: np.ndarray, config) -> None:
        """Epoch-end Input/Output/Target artifact dump, keyed on
        TENSORBOARD.LOG_ITEMS (reference trainer.py:448-457 +
        visualization.py:94-124; 'spectogram' typo kept for config parity)."""
        if not self.enabled:
            return
        items = list(config.TENSORBOARD.LOG_ITEMS)
        names = ["Input", "Output", "Target"]
        waves = [wave_in, wave_out, wave_target]
        if "audio" in items:
            for name, wave in zip(names, waves):
                self.log_audio(name, wave, config.DATA.TARGET_SR)
        if "waveform" in items:
            for name, wave in zip(names, waves):
                self.log_waveform(f"Waveform/{name}", wave)
        if "spectogram" in items or "spectrogram" in items:
            s = config.DATA.STFT
            for name, wave in zip(names, waves):
                self.log_spectrogram(f"Spectrogram/{name}", wave,
                                     s.N_FFT, s.HOP_LENGTH, s.WIN_LENGTH)

    def log_spectrogram(self, tag: str, wave: np.ndarray, n_fft: int,
                        hop_length: int, win_length: int) -> None:
        """3-panel log2-mag / dB / phase figure
        (reference visualization.py:136-257)."""
        if not self.enabled:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import jax.numpy as jnp

        from ..dsp import wav2spectro, amplitude_to_db

        w = jnp.asarray(np.asarray(wave).reshape(1, -1))
        mag, phase = wav2spectro(w, n_fft, hop_length, win_length, "log2")
        db = amplitude_to_db(jnp.square(jnp.exp2(mag)))
        fig, axs = plt.subplots(1, 3, figsize=(16, 4))
        for ax, img, title in zip(
            axs,
            [np.asarray(mag[0]), np.asarray(db[0]), np.asarray(phase[0])],
            ["log2 magnitude", "dB", "phase"],
        ):
            im = ax.imshow(img, aspect="auto", origin="lower", cmap="viridis")
            ax.set_title(title)
            fig.colorbar(im, ax=ax)
        self.add_figure(tag, fig)
        plt.close(fig)
