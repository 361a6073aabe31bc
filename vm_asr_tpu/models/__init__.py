from .discriminator import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    PeriodDiscriminator,
    ScaleDiscriminator,
)
from .factory import get_model, to_stacked
from .layers import DropPath, Mlp, PatchEmbed, PatchExpanding, PatchMerging
from .ss2d import SS2D
from .unet import (
    DualStreamInteractiveMambaUNet,
    DualStreamStackedMambaUNet,
    MambaUNet,
    UNetCore,
    stack_dual_params,
)
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
    "DualStreamStackedMambaUNet",
    "stack_dual_params",
    "to_stacked",
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
