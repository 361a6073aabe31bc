from .pipeline import Batch, DataPipeline, DegradingSampler, get_loaders, train_valid_split
from .vctk import SyntheticVCTK, VCTKDataset, load_wav, parse_silence_labels, save_wav, trim_silence

__all__ = [
    "Batch",
    "DataPipeline",
    "DegradingSampler",
    "get_loaders",
    "train_valid_split",
    "VCTKDataset",
    "SyntheticVCTK",
    "load_wav",
    "save_wav",
    "parse_silence_labels",
    "trim_silence",
]
