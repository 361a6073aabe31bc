"""Reference (PyTorch) → flax parameter conversion.

Maps a reference VM-ASR generator ``state_dict`` (model/model.py:119-1552
module tree, checkpoints written by base/base_trainer.py:130-179) onto this
framework's flax tree (vm_asr_tpu/models/unet.py). Handles MambaUNet and
DualStreamInteractiveMambaUNet with patch-embed v1/v2 and output head
v2/v3 (v1's ConvTranspose head is an unused-by-configs ablation and is
rejected explicitly).

Name topology (reference → flax):

    patch_embed_mag.{0,2,5,7}        → core_mag/patch_embed/{conv1,norm1,conv2,norm2}
    layers_encoder_mag.{i}.*         → core_mag/encoders_{i}/*
    layers_decoder_mag.{i}.*         → core_mag/decoders_{i}/*
    output_layer_mag.{0,1,3,5}       → core_mag/{out_vss1,out_vss2,out_conv,out_vss3}
    <VSSLayer>.skip_handler.1        → skip_conv           (1×1 conv → Dense)
    <VSSLayer>.blocks.{d}.{norm,op,norm2,mlp} → blocks_{d}/…
    <VSSLayer>.sampler.{norm,reduction,expand} → sampler/…

Weight-layout transforms:

    torch Linear   (out, in)        → flax kernel (in, out)      — transpose
    torch Conv2d   (out, in/g, kh, kw) → flax (kh, kw, in/g, out) — permute
    torch 1×1 Conv (out, in, 1, 1)  → flax Dense (in, out)       — squeeze+T
    LayerNorm weight                → scale
    A_logs (K·D, N) / Ds (K·D,)     → (K, D, N) / (K, D)         — reshape
    x_proj_weight / dt_projs_weight / dt_projs_bias              — verbatim
      (flax SS2D keeps the reference's stacked-K layouts, ss2d.py:135-156)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

K_GROUP = 4  # fixed in the reference (vmamba.py:851 `k_group = 4`)

_STREAMS = {"": "core", "_mag": "core_mag", "_phase": "core_phase"}

# output_layer Sequential index → flax module (v3 head, model.py:773-887;
# the v2 head, model.py:675-771, uses the same 0/1/3 slots).
_OUTPUT_IDX = {"0": "out_vss1", "1": "out_vss2", "3": "out_conv", "5": "out_vss3"}


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(w) -> np.ndarray:
    return _t(w).T


def _conv(w) -> np.ndarray:
    return _t(w).transpose(2, 3, 1, 0)


def _conv1x1_to_dense(w) -> np.ndarray:
    w = _t(w)
    assert w.shape[2:] == (1, 1), f"expected 1x1 conv, got {w.shape}"
    return w[:, :, 0, 0].T


def _map_ss2d_leaf(leaf: str, value) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Map `op.<leaf>` of a VSSBlock (reference SS2D params)."""
    if leaf == "in_proj.weight":
        return ("in_proj", "kernel"), _linear(value)
    if leaf == "in_proj.bias":
        return ("in_proj", "bias"), _t(value)
    if leaf == "conv2d.weight":
        return ("conv2d", "kernel"), _conv(value)
    if leaf == "conv2d.bias":
        return ("conv2d", "bias"), _t(value)
    if leaf in ("x_proj_weight", "dt_projs_weight", "dt_projs_bias"):
        return (leaf,), _t(value)
    if leaf == "A_logs":
        v = _t(value)  # (K·D, N)
        return ("A_logs",), v.reshape(K_GROUP, -1, v.shape[-1])
    if leaf == "Ds":
        return ("Ds",), _t(value).reshape(K_GROUP, -1)
    if leaf == "out_norm.weight":
        return ("out_norm", "scale"), _t(value)
    if leaf == "out_norm.bias":
        return ("out_norm", "bias"), _t(value)
    if leaf == "out_proj.weight":
        return ("out_proj", "kernel"), _linear(value)
    if leaf == "out_proj.bias":
        return ("out_proj", "bias"), _t(value)
    raise KeyError(f"unknown SS2D leaf: {leaf}")


def _map_vss_layer(rest: str, value) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Map the inside of a reference VSSLayer Sequential
    (skip_handler/blocks/sampler, model.py:889-958)."""
    m = re.match(r"skip_handler\.1\.(weight|bias)$", rest)
    if m:
        if m.group(1) == "weight":
            return ("skip_conv", "kernel"), _conv1x1_to_dense(value)
        return ("skip_conv", "bias"), _t(value)

    m = re.match(r"blocks\.(\d+)\.(.+)$", rest)
    if m:
        block = f"blocks_{m.group(1)}"
        sub = m.group(2)
        for name, flax_name in (("norm", "norm"), ("norm2", "norm2")):
            mm = re.match(rf"{name}\.(weight|bias)$", sub)
            if mm:
                leaf = "scale" if mm.group(1) == "weight" else "bias"
                return (block, flax_name, leaf), _t(value)
        mm = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)$", sub)
        if mm:
            fc, leaf = mm.group(1), mm.group(2)
            if leaf == "weight":
                return (block, "mlp", fc, "kernel"), _linear(value)
            return (block, "mlp", fc, "bias"), _t(value)
        mm = re.match(r"op\.(.+)$", sub)
        if mm:
            path, arr = _map_ss2d_leaf(mm.group(1), value)
            return (block, "op") + path, arr

    m = re.match(r"sampler\.(norm|reduction|expand)\.(weight|bias)$", rest)
    if m:
        name, leaf = m.group(1), m.group(2)
        if name == "norm":
            return ("sampler", "norm", "scale" if leaf == "weight" else "bias"), _t(value)
        # reduction/expand are bias-free Linears (model.py:66, 102)
        return ("sampler", name, "kernel"), _linear(value)

    raise KeyError(f"unmapped VSSLayer entry: {rest}")


def _map_patch_embed(rest: str, value, version: str):
    idx, leaf = rest.split(".", 1)
    if version == "v2":
        names = {"0": "conv1", "2": "norm1", "5": "conv2", "7": "norm2"}
    else:  # v1: Sequential(Conv2d, Permute, LN) — model.py:589-599
        names = {"0": "proj", "2": "norm"}
    name = names[idx]
    if name.startswith("conv") or name == "proj":
        return (
            (name, "kernel" if leaf == "weight" else "bias"),
            _conv(value) if leaf == "weight" else _t(value),
        )
    return ((name, "scale" if leaf == "weight" else "bias"), _t(value))


def state_dict_to_flax(
    state_dict: Mapping[str, Any],
    dtype: Any = jnp.float32,
    drop_phase_decoders: bool = True,
) -> Dict[str, Any]:
    """Convert a reference generator state_dict into a flax ``params`` tree.

    Returns the nested tree to pass as ``{"params": tree}`` to
    ``model.apply``. Stream suffixes are auto-detected: keys named
    ``patch_embed_mag…`` map under ``core_mag``/``core_phase``
    (DualStreamInteractiveMambaUNet), bare names map under ``core``
    (MambaUNet).

    ``drop_phase_decoders``: in the reference's concat-skip dual-stream
    forwards the phase stream runs through the *magnitude* decoder
    (model.py:1148/1270/1386), so ``layers_decoder_phase`` receives no
    gradients and stays at its random init — dead weight in every
    published checkpoint. The flax model (phase_decoder_fix=False)
    doesn't materialise those parameters, so they are dropped here. Set
    False only for ``phase_decoder_fix=True`` models (which *do* use a
    phase decoder — note the reference weights being ported were never
    trained in that role).
    """
    from flax.traverse_util import unflatten_dict

    pe_version = (
        "v2"
        if any(k.startswith("patch_embed") and ".5." in k for k in state_dict)
        else "v1"
    )

    flat: Dict[Tuple[str, ...], jnp.ndarray] = {}
    for key, value in state_dict.items():
        if drop_phase_decoders and key.startswith("layers_decoder_phase."):
            continue
        m = re.match(
            r"(patch_embed|layers_encoder|layers_latent|layers_decoder|output_layer)"
            r"(_mag|_phase)?\.(.+)$",
            key,
        )
        if not m:
            raise KeyError(f"unrecognised reference key: {key}")
        group, suffix, rest = m.group(1), m.group(2) or "", m.group(3)
        root = _STREAMS[suffix]

        if group == "layers_latent":
            # ModuleList with a single bottleneck VSSLayer (model.py:299-332)
            idx, sub = rest.split(".", 1)
            assert idx == "0", f"unexpected latent index in {key}"
            path, arr = _map_vss_layer(sub, value)
            path = ("latent",) + path
        elif group == "patch_embed":
            path, arr = _map_patch_embed(rest, value, pe_version)
            path = ("patch_embed",) + path
        elif group in ("layers_encoder", "layers_decoder"):
            idx, sub = rest.split(".", 1)
            stage = ("encoders" if group == "layers_encoder" else "decoders") + f"_{idx}"
            path, arr = _map_vss_layer(sub, value)
            path = (stage,) + path
        else:  # output_layer
            idx, sub = rest.split(".", 1)
            if idx not in _OUTPUT_IDX:
                raise NotImplementedError(
                    f"output_layer index {idx} (key {key}): only the v2/v3 "
                    "heads are convertible; the v1 ConvTranspose head is an "
                    "unused ablation (reference model.py:635-673)."
                )
            name = _OUTPUT_IDX[idx]
            if name == "out_conv":
                if sub == "weight":
                    path, arr = (name, "kernel"), _conv1x1_to_dense(value)
                else:
                    path, arr = (name, "bias"), _t(value)
            else:
                path, arr = _map_vss_layer(sub, value)
                path = (name,) + path

        full = (root,) + path
        if full in flat:
            raise KeyError(f"duplicate mapping for {key} → {'/'.join(full)}")
        flat[full] = jnp.asarray(arr, dtype=dtype)

    return unflatten_dict(flat)


def load_torch_checkpoint(path: str, dtype: Any = jnp.float32) -> Dict[str, Any]:
    """Load a reference ``checkpoint-*-G.pth`` (base_trainer.py:130-179
    layout: {name, epoch, state_dict, optimizer, monitor_best, config})
    and return the converted flax params tree.

    Only the ``state_dict`` tensors are ever used, so the safe
    ``weights_only=True`` loader is tried first; a checkpoint whose header
    pickles arbitrary objects (the reference embeds its config object) falls
    back to a full unpickle — which EXECUTES code from the file — only after
    a loud warning. Load full-pickle checkpoints you trust, nothing else."""
    import torch

    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import warnings

        warnings.warn(
            f"{path}: not loadable with weights_only=True; falling back to "
            "full unpickling, which can execute arbitrary code from the "
            "checkpoint file. Only do this with checkpoints you trust.",
            stacklevel=2,
        )
        blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob["state_dict"] if isinstance(blob, dict) and "state_dict" in blob else blob
    return state_dict_to_flax(sd, dtype=dtype)


def disc_variables_from_torch(module, template: Mapping) -> Dict[str, Any]:
    """Convert a reference MPD/MSD discriminator into flax variables.

    The reference wraps every conv in torch spectral norm (the inverted flag,
    discriminator.py:37,177); reading ``layer.weight`` yields the *effective*
    weight W/σ, which we store directly and set the flax SpectralNorm σ
    to 1 — at ``update_stats=False`` the forward is then identical without
    reproducing torch's power-iteration state. (u vectors keep template
    values; they only matter when updating stats.)

    ``template``: freshly-initialised flax variables (params + batch_stats).
    """
    import torch

    params = {}
    for key, sub in template["params"].items():  # disc_{i}
        idx = int(key.split("_")[1])
        tdisc = module.discriminators[idx]
        new_sub = {}
        for name, leaf in sub.items():  # conv_{j} | conv_post
            if name == "conv_post":
                layer = tdisc.conv_post
            else:
                # PeriodDiscriminator names its stack `layers`,
                # ScaleDiscriminator names it `convs` (discriminator.py:41,178)
                stack = getattr(tdisc, "layers", None) or tdisc.convs
                layer = stack[int(name.split("_")[1])]
            with torch.no_grad():
                w = layer.weight.detach().cpu().numpy()  # effective (W/σ)
                b = layer.bias.detach().cpu().numpy()
            if w.ndim == 4:  # Conv2d (O, I, kh, kw) → (kh, kw, I, O)
                kernel = w.transpose(2, 3, 1, 0)
            else:  # Conv1d (O, I/g, k) → (k, I/g, O)
                kernel = w.transpose(2, 1, 0)
            assert kernel.shape == tuple(leaf["kernel"].shape), (
                name, kernel.shape, leaf["kernel"].shape)
            new_sub[name] = {
                "kernel": jnp.asarray(kernel, leaf["kernel"].dtype),
                "bias": jnp.asarray(b, leaf["bias"].dtype),
            }
        params[key] = new_sub

    import jax

    stats = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            jnp.ones_like(leaf) if path[-1].key == "sigma" else leaf
        ),
        template["batch_stats"],
    )
    return {"params": params, "batch_stats": stats}


def assert_tree_match(template: Mapping, converted: Mapping, prefix: str = ""):
    """Raise with a precise diff if the converted tree's keys/shapes differ
    from a freshly-initialised flax tree's."""
    t_keys, c_keys = set(template.keys()), set(converted.keys())
    if t_keys != c_keys:
        missing = sorted(t_keys - c_keys)
        extra = sorted(c_keys - t_keys)
        raise AssertionError(
            f"tree mismatch at '{prefix}': missing={missing[:8]} extra={extra[:8]}"
        )
    for k in t_keys:
        t, c = template[k], converted[k]
        if isinstance(t, Mapping):
            assert_tree_match(t, c, f"{prefix}/{k}")
        elif tuple(t.shape) != tuple(c.shape):
            raise AssertionError(
                f"shape mismatch at {prefix}/{k}: template {t.shape} vs "
                f"converted {c.shape}"
            )
