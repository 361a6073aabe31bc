"""Building-block layers for the Mamba U-Net, in flax (channels-last / NHWC).

Reference counterparts: model/model.py:30-117 (LayerNorm2d / PatchMerging2D /
PatchExpanding), model/vmamba.py:483-538 (Mlp / gMlp), timm DropPath.
NHWC is TPU-native, so the reference's permute shims disappear.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Initializers matching torch defaults (so init statistics line up with the
# reference's model.py:960-967 _init_weights + torch layer defaults).
# ---------------------------------------------------------------------------
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
# torch nn.Linear / nn.Conv2d default: kaiming_uniform(a=sqrt(5)) ==
# uniform(±sqrt(1/fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# torch nn.LayerNorm uses eps=1e-5; flax defaults to 1e-6. All norms in
# this model family must match the reference's epsilon for parity.
def LayerNorm(**kwargs):
    kwargs.setdefault("epsilon", 1e-5)
    return nn.LayerNorm(**kwargs)


def _gelu_exact(x):
    # torch nn.GELU() is the exact erf form; flax nn.gelu defaults to the
    # tanh approximation, which diverges from the reference by ~1e-4.
    return nn.gelu(x, approximate=False)


_ACTIVATIONS = {
    "silu": nn.silu,
    "gelu": _gelu_exact,
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
}


def get_activation(name: str) -> Callable:
    return _ACTIVATIONS[name.lower()]


class DepthwiseConv2d(nn.Module):
    """Depthwise (per-channel) 2-D conv as kh·kw shifted multiply-adds.

    Parameter-compatible with ``nn.Conv(features=C, feature_group_count=C)``:
    kernel ``(kh, kw, 1, C)`` HWIO + optional bias ``(C,)`` — checkpoints and
    the torch-port bijection (compat/torch_port.py) are unchanged. Stride 1,
    SAME padding (the only configuration the model family uses — reference
    vmamba.py SS2D d_conv).

    Why not ``nn.Conv``: XLA GSPMD mis-partitions the grouped-convolution
    KERNEL gradient on any mesh with an axis the conv is replicated over —
    under a dp×mp mesh (parallel/context.py) the depthwise kernel grad comes
    back scaled by exactly the mp size (2.0000× on dp4×mp2; minimal repro:
    tests/test_mp.py::test_depthwise_conv_kernel_grad_mp), silently corrupting
    tensor-parallel training. Expressed as shifted elementwise FMAs, every
    gradient is a plain elementwise/reduction op GSPMD partitions correctly.
    It is also the natural TPU formulation: a depthwise conv never touches
    the MXU, and the kh·kw fused VPU multiply-adds avoid the grouped-conv
    lowering entirely.
    """

    features: int
    kernel_size: tuple
    use_bias: bool = True
    kernel_init: Callable = torch_linear_init
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        c = self.features
        kernel = self.param("kernel", self.kernel_init, (kh, kw, 1, c))
        bias = (
            self.param("bias", self.bias_init, (c,)) if self.use_bias else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        # SAME padding at stride 1: low = (k-1)//2, high = k-1-low.
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        xp = jnp.pad(
            x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0))
        )
        h, w = x.shape[1], x.shape[2]
        y = None
        for i in range(kh):
            for j in range(kw):
                t = xp[:, i : i + h, j : j + w, :] * kernel[i, j, 0]
                y = t if y is None else y + t
        return y if bias is None else y + bias


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics: rescale by keep prob)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """fc1 → act → drop → fc2 → drop (reference vmamba.py:483-509)."""

    hidden_features: int
    out_features: int
    act: str = "gelu"
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.act)
        x = nn.Dense(
            self.hidden_features,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="fc1",
        )(x)
        x = act(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_features,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="fc2",
        )(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class GMlp(nn.Module):
    """Gated MLP variant (reference vmamba.py:512-538)."""

    hidden_features: int
    out_features: int
    act: str = "gelu"
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_activation(self.act)
        x = nn.Dense(
            2 * self.hidden_features,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="fc1",
        )(x)
        x, z = jnp.split(x, 2, axis=-1)
        x = nn.Dense(
            self.out_features,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="fc2",
        )(x * act(z))
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class PatchMerging(nn.Module):
    """2× downsample: 2×2 space-to-depth → LN(4C) → Linear(4C → out_dim).

    Reference model/model.py:57-89 (gather order x0=(even,even), x1=(odd,even),
    x2=(even,odd), x3=(odd,odd)).
    """

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            self.out_dim,
            use_bias=False,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="reduction",
        )(x)
        return x


class PatchExpanding(nn.Module):
    """2× upsample: Linear(C → 2C) → depth-to-space 2×2 → (LN on C/2).

    Reference model/model.py:92-116.
    """

    use_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = nn.Dense(
            2 * c,
            use_bias=False,
            kernel_init=trunc_normal_init,
            dtype=self.dtype,
            name="expand",
        )(x)
        c2 = 2 * c
        # 'b h w (p1 p2 c) -> b (h p1) (w p2) c' with p1 = p2 = 2
        x = x.reshape(b, h, w, 2, 2, c2 // 4)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c2 // 4)
        if self.use_norm:
            x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class PatchEmbed(nn.Module):
    """Patch embedding. v1: one strided conv; v2: two 3×3/s2 convs with
    LN+GELU in between (reference model/model.py:580-633). NHWC throughout.
    """

    embed_dim: int
    patch_size: int = 4
    version: str = "v2"
    patch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.version == "v1":
            x = nn.Conv(
                self.embed_dim,
                kernel_size=(self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                kernel_init=torch_linear_init,
                dtype=self.dtype,
                name="proj",
            )(x)
            if self.patch_norm:
                x = LayerNorm(dtype=self.dtype, name="norm")(x)
            return x
        assert self.patch_size == 4, "v2 patch embed is fixed to 4x downsample"
        x = nn.Conv(
            self.embed_dim // 2,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            kernel_init=torch_linear_init,
            dtype=self.dtype,
            name="conv1",
        )(x)
        if self.patch_norm:
            x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = _gelu_exact(x)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            kernel_init=torch_linear_init,
            dtype=self.dtype,
            name="conv2",
        )(x)
        if self.patch_norm:
            x = LayerNorm(dtype=self.dtype, name="norm2")(x)
        return x
