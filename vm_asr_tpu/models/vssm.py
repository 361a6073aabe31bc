"""VSSM image-classifier backbone (the upstream VMamba model).

Reference: model/vmamba.py:1846-2300 (`VSSM`, `Backbone_VSSM`). VM-ASR's
generator doesn't use these classes, but the reference ships them as part of
its model zoo (classification head + multi-stage feature backbone for
detection/segmentation use); they share every building block with the U-Net.

Structure: patch embed → N stages (VSSBlock×depth, PatchMerging between
stages) → LayerNorm → global average pool → Linear classifier.
``BackboneVSSM`` instead returns the per-stage feature maps (NHWC) with an
optional norm per tapped stage.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import LayerNorm, PatchEmbed, trunc_normal_init
from .unet import resolve_dims
from .vss import VSSLayer


class VSSM(nn.Module):
    num_classes: int = 1000
    in_chans: int = 3
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Any = 96
    ssm_d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_act: str = "silu"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    mlp_ratio: float = 4.0
    mlp_act: str = "gelu"
    mlp_drop_rate: float = 0.0
    gmlp: bool = False
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    patchembed_version: str = "v2"
    use_checkpoint: bool = False
    scan_impl: Optional[str] = None
    dtype: Any = jnp.float32

    def _stage_kwargs(self):
        return dict(
            ssm_d_state=self.ssm_d_state,
            ssm_ratio=self.ssm_ratio,
            ssm_dt_rank=self.ssm_dt_rank,
            ssm_act=self.ssm_act,
            ssm_conv=self.ssm_conv,
            ssm_conv_bias=self.ssm_conv_bias,
            ssm_drop_rate=self.ssm_drop_rate,
            mlp_ratio=self.mlp_ratio,
            mlp_act=self.mlp_act,
            mlp_drop_rate=self.mlp_drop_rate,
            gmlp=self.gmlp,
            use_checkpoint=self.use_checkpoint,
            scan_impl=self.scan_impl,
            dtype=self.dtype,
        )

    def setup(self):
        n = len(self.depths)
        dims = resolve_dims(self.dims, n)
        dpr = list(np.linspace(0.0, self.drop_path_rate, sum(self.depths)))
        self.patch_embed = PatchEmbed(
            embed_dim=dims[0], patch_size=self.patch_size,
            version=self.patchembed_version, patch_norm=self.patch_norm,
            dtype=self.dtype,
        )
        stages = []
        for i in range(n):
            sampler = ("merge", dims[i + 1]) if i < n - 1 else None
            stages.append(
                VSSLayer(
                    dim=dims[i],
                    drop_path=dpr[sum(self.depths[:i]): sum(self.depths[: i + 1])],
                    sampler=sampler,
                    concat_skip=False,
                    **self._stage_kwargs(),
                )
            )
        self.stages = stages
        self.norm = LayerNorm(dtype=self.dtype)
        self.head = nn.Dense(self.num_classes, kernel_init=trunc_normal_init,
                             dtype=self.dtype)

    def features(self, x, deterministic: bool = True):
        x = self.patch_embed(x)
        outs = []
        for stage in self.stages:
            x = stage(x, deterministic)
            outs.append(x)
        return outs

    def __call__(self, x, deterministic: bool = True):
        x = self.features(x, deterministic)[-1]
        x = self.norm(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool (NHWC)
        return self.head(x)


class BackboneVSSM(VSSM):
    """Multi-scale feature extractor (reference vmamba.py:2244-2300):
    returns the tapped stage outputs in NHWC with a LayerNorm per tap."""

    out_indices: Sequence[int] = (0, 1, 2, 3)

    def setup(self):
        super().setup()
        self.out_norms = [LayerNorm(dtype=self.dtype)
                          for _ in self.out_indices]

    def __call__(self, x, deterministic: bool = True) -> Tuple[jnp.ndarray, ...]:
        feats = self.features(x, deterministic)
        return tuple(
            norm(feats[i]) for i, norm in zip(self.out_indices, self.out_norms)
        )
