"""Model factory: config → model instances (reference model/__init__.py:8-67)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .discriminator import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    StackedMultiPeriodDiscriminator,
)
from .unet import (
    DualStreamInteractiveMambaUNet,
    DualStreamStackedMambaUNet,
    MambaUNet,
    stack_dual_params,
)


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def _generator_kwargs(config) -> Dict[str, Any]:
    v = config.MODEL.VSSM
    compute_dtype = _DTYPES[config.DTYPE.COMPUTE] if config.AMP_ENABLE else jnp.float32

    return dict(
        in_chans=v.IN_CHANS,
        patch_size=v.PATCH_SIZE,
        depths=tuple(v.DEPTHS),
        dims=v.DIMS,
        ssm_d_state=v.SSM_D_STATE,
        ssm_ratio=v.SSM_RATIO,
        ssm_dt_rank=v.SSM_DT_RANK,
        ssm_act=v.SSM_ACT_LAYER,
        ssm_conv=v.SSM_CONV,
        ssm_conv_bias=v.SSM_CONV_BIAS,
        ssm_drop_rate=v.SSM_DROP_RATE,
        mlp_ratio=v.MLP_RATIO,
        mlp_act=v.MLP_ACT_LAYER,
        mlp_drop_rate=v.MLP_DROP_RATE,
        gmlp=v.GMLP,
        drop_path_rate=v.DROP_PATH_RATE,
        patch_norm=v.PATCH_NORM,
        patchembed_version=v.PATCHEMBED,
        output_version=v.OUTPUT,
        concat_skip=v.CONCAT_SKIP,
        n_fft=config.DATA.STFT.N_FFT,
        hop_length=config.DATA.STFT.HOP_LENGTH,
        win_length=config.DATA.STFT.WIN_LENGTH,
        spectro_scale=config.DATA.STFT.SCALE,
        low_freq_replacement=config.TRAIN.LOW_FREQ_REPLACEMENT,
        lfr_mode=config.TRAIN.get("LFR_MODE", "torch"),
        use_checkpoint=bool(v.get("USE_CHECKPOINT", False)),
        dtype=compute_dtype,
    )


def get_model(config) -> Dict[str, Any]:
    """Build {"generator": …, "mpd"?: …, "msd"?: …} from the run config."""
    v = config.MODEL.VSSM
    compute_dtype = _DTYPES[config.DTYPE.COMPUTE] if config.AMP_ENABLE else jnp.float32
    # Trace-time global (like VM_ASR_SCAN_BWD): set before any jit of this
    # model. Reference force_fp32 semantics, vmamba.py:842-848. Set
    # unconditionally so a prior True (an earlier get_model in the same
    # process) can't leak into later models; an explicit
    # VM_ASR_SCAN_FP32_IO=1 env override still wins.
    import os as _os

    from ..ops.scan_api import set_scan_fp32_io

    set_scan_fp32_io(
        bool(v.get("SCAN_FP32_IO", False))
        or _os.environ.get("VM_ASR_SCAN_FP32_IO", "0") == "1"
    )
    kwargs = _generator_kwargs(config)

    name = config.MODEL.NAME
    if name == "DualStreamInteractiveMambaUNet":
        generator = DualStreamInteractiveMambaUNet(
            interact=v.INTERACT,
            phase_decoder_fix=bool(v.get("PHASE_DECODER_FIX", False)),
            fuse_streams=bool(v.get("FUSE_STREAMS", False)),
            **kwargs,
        )
    elif name in ("MambaUNet", "VM_ASR_BASIC"):
        generator = MambaUNet(**kwargs)
    else:
        raise ValueError(f"Unknown model name: {name}")

    models: Dict[str, Any] = {"generator": generator}
    adv = config.TRAIN.ADVERSARIAL
    if adv.ENABLE:
        # The reference trains the discriminators under AMP autocast
        # (trainer/trainer.py:138-139) — bf16 conv compute, fp32 params.
        # Loss entry points upcast scores/feature-maps to fp32 (losses.py),
        # matching autocast's fp32-listed loss ops.
        if "mpd" in adv.DISCRIMINATORS:
            periods = tuple(adv.get("MPD_PERIODS", [2, 3, 5, 7, 11]))
            if bool(adv.get("MPD_STACKED", False)):
                # vmapped period stacks: one batched conv per layer per
                # group instead of len(periods) sequential small convs —
                # loss-identical (see StackedMultiPeriodDiscriminator).
                raw_groups = adv.get("MPD_STACK_GROUPS", []) or None
                models["mpd"] = StackedMultiPeriodDiscriminator(
                    hidden=adv.MPD_HIDDEN,
                    periods=periods,
                    groups=tuple(tuple(g) for g in raw_groups)
                    if raw_groups else None,
                    dtype=compute_dtype,
                )
            else:
                models["mpd"] = MultiPeriodDiscriminator(
                    hidden=adv.MPD_HIDDEN,
                    periods=periods,
                    dtype=compute_dtype,
                )
        if "msd" in adv.DISCRIMINATORS:
            models["msd"] = MultiScaleDiscriminator(
                hidden=adv.get("MSD_HIDDEN", 128),
                dtype=compute_dtype,
            )
    return models


def to_stacked(config, generator, params):
    """Serving path: swap a dual-stream generator + unstacked params for the
    stream-stacked execution model (unet.DualStreamStackedMambaUNet — ~half
    the traced ops, identical outputs). No-op unless the config enables
    MODEL.VSSM.STACKED_EXECUTION, the model is the dual-stream U-Net, and
    ``params`` still carry the unstacked {core_mag, core_phase} layout."""
    v = config.MODEL.VSSM
    if not bool(v.get("STACKED_EXECUTION", False)):
        return generator, params
    if config.MODEL.NAME != "DualStreamInteractiveMambaUNet":
        return generator, params
    if v.INTERACT == "single" or "core_mag" not in params:
        return generator, params

    stacked = DualStreamStackedMambaUNet(
        interact=v.INTERACT,
        phase_decoder_fix=bool(v.get("PHASE_DECODER_FIX", False)),
        **_generator_kwargs(config),
    )
    dims, depths = v.DIMS, list(v.DEPTHS)
    has_latent = not isinstance(dims, int) and len(dims) == len(depths) + 1
    sp = stack_dual_params(
        params,
        concat_skip=bool(v.CONCAT_SKIP),
        has_latent=has_latent,
        phase_decoder_fix=bool(v.get("PHASE_DECODER_FIX", False)),
    )
    return stacked, sp
