"""VSSBlock and VSSLayer (reference vmamba.py:1753-1843, model.py:889-958)."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import DropPath, GMlp, LayerNorm, Mlp, PatchExpanding, PatchMerging, torch_bias_init, torch_linear_init
from .ss2d import SS2D


class VSSBlock(nn.Module):
    """Pre-norm residual block: x + DropPath(SS2D(LN(x))), then the optional
    MLP branch x + DropPath(MLP(LN(x))) (reference vmamba.py:1826-1837)."""

    hidden_dim: int
    drop_path: float = 0.0
    use_norm: bool = True  # output-layer v3 passes nn.Identity (model.py:804,866)
    # ssm branch
    ssm_d_state: int = 1
    ssm_ratio: float = 2.0
    ssm_dt_rank: Any = "auto"
    ssm_act: str = "silu"
    ssm_conv: int = 3
    ssm_conv_bias: bool = True
    ssm_drop_rate: float = 0.0
    # mlp branch
    mlp_ratio: float = 4.0
    mlp_act: str = "gelu"
    mlp_drop_rate: float = 0.0
    gmlp: bool = False
    post_norm: bool = False
    use_checkpoint: bool = False
    scan_impl: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        ssm_branch = self.ssm_ratio > 0
        mlp_branch = self.mlp_ratio > 0

        def norm(name):
            if self.use_norm:
                return LayerNorm(dtype=self.dtype, name=name)
            return lambda v: v

        def body(x):
            if ssm_branch:
                op = SS2D(
                    d_model=self.hidden_dim,
                    d_state=self.ssm_d_state,
                    ssm_ratio=self.ssm_ratio,
                    dt_rank=self.ssm_dt_rank,
                    act=self.ssm_act,
                    d_conv=self.ssm_conv,
                    conv_bias=self.ssm_conv_bias,
                    dropout=self.ssm_drop_rate,
                    scan_impl=self.scan_impl,
                    dtype=self.dtype,
                    name="op",
                )
                if self.post_norm:
                    y = norm("norm")(op(x, deterministic))
                else:
                    y = op(norm("norm")(x), deterministic)
                x = x + DropPath(self.drop_path, name="drop_path")(
                    y, deterministic=deterministic
                )
            if mlp_branch:
                mlp_cls = GMlp if self.gmlp else Mlp
                mlp = mlp_cls(
                    hidden_features=int(self.hidden_dim * self.mlp_ratio),
                    out_features=self.hidden_dim,
                    act=self.mlp_act,
                    drop_rate=self.mlp_drop_rate,
                    dtype=self.dtype,
                    name="mlp",
                )
                if self.post_norm:
                    y = norm("norm2")(mlp(x, deterministic))
                else:
                    y = mlp(norm("norm2")(x), deterministic)
                x = x + DropPath(self.drop_path, name="drop_path2")(
                    y, deterministic=deterministic
                )
            return x

        if self.use_checkpoint:
            # Rematerialise activations in backward (the TPU analogue of the
            # reference's torch checkpoint, vmamba.py:1839-1843) — but keep
            # the selective-scan outputs (tagged in SS2D): recomputing the
            # scan costs another full kernel pass per block, while its saved
            # output is only (B, L, K·D) — most of the memory win comes from
            # dropping the projection/MLP intermediates, which XLA re-fuses
            # cheaply.
            policy = jax.checkpoint_policies.save_only_these_names("scan_out")
            return nn.remat(lambda m, v: body(v), policy=policy)(self, x)
        return body(x)


class VSSLayer(nn.Module):
    """skip_handler → VSSBlock×depth → sampler (reference model.py:889-958).

    sampler: None | ("merge", out_dim) | ("expand", use_norm)
    concat_skip: a 1×1 projection folding a concatenated skip (2C → C).
    """

    dim: int
    drop_path: Sequence[float] = ()
    use_norm: bool = True
    sampler: Optional[Tuple] = None
    concat_skip: bool = False
    # passthrough block kwargs
    ssm_d_state: int = 1
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
    use_checkpoint: bool = False
    scan_impl: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.concat_skip:
            # 1×1 conv reducing 2·dim → dim (reference model.py:914-922)
            x = nn.Dense(
                self.dim,
                kernel_init=torch_linear_init,
                bias_init=torch_bias_init(2 * self.dim),
                dtype=self.dtype,
                name="skip_conv",
            )(x)
        for i, dp in enumerate(self.drop_path):
            x = VSSBlock(
                hidden_dim=self.dim,
                drop_path=float(dp),
                use_norm=self.use_norm,
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
                name=f"blocks_{i}",
            )(x, deterministic)
        if self.sampler is not None:
            kind = self.sampler[0]
            if kind == "merge":
                x = PatchMerging(out_dim=self.sampler[1], dtype=self.dtype, name="sampler")(x)
            elif kind == "expand":
                x = PatchExpanding(use_norm=self.sampler[1], dtype=self.dtype, name="sampler")(x)
        return x
