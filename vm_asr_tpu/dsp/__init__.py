from .stft import (
    amplitude_to_db,
    db_to_amplitude,
    hann_window,
    istft,
    spectro2wav,
    stft,
    wav2spectro,
)
from .segment import fold_audio, num_segments, unfold_audio
from .degrade import align_waveform, degrade, lowpass, resample_audio

__all__ = [
    "stft",
    "istft",
    "hann_window",
    "wav2spectro",
    "spectro2wav",
    "amplitude_to_db",
    "db_to_amplitude",
    "unfold_audio",
    "num_segments",
    "fold_audio",
    "lowpass",
    "resample_audio",
    "align_waveform",
    "degrade",
]
