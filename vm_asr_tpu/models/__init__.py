from .discriminator import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    PeriodDiscriminator,
    ScaleDiscriminator,
)
from .factory import get_model
from .layers import DropPath, Mlp, PatchEmbed, PatchExpanding, PatchMerging
from .ss2d import SS2D
from .unet import DualStreamInteractiveMambaUNet, MambaUNet, UNetCore
from .vss import VSSBlock, VSSLayer
from .vssm import BackboneVSSM, VSSM

__all__ = [
    "VSSM",
    "BackboneVSSM",
    "SS2D",
    "VSSBlock",
    "VSSLayer",
    "UNetCore",
    "MambaUNet",
    "DualStreamInteractiveMambaUNet",
    "MultiPeriodDiscriminator",
    "MultiScaleDiscriminator",
    "PeriodDiscriminator",
    "ScaleDiscriminator",
    "get_model",
    "DropPath",
    "Mlp",
    "PatchEmbed",
    "PatchExpanding",
    "PatchMerging",
]
