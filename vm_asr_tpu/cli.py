"""Command-line entry point.

Mirrors the reference's CLI surface (main.py:28-92):

    python -m vm_asr_tpu.cli --cfg configs/vm_asr_48k_MPD.yaml --tag 48k_MPD
    python -m vm_asr_tpu.cli --cfg ... --eval --tag 16000_48000 --resume RUN_DIR
    python -m vm_asr_tpu.cli --cfg ... --inference --tag 16000_48000 \
        --resume RUN_DIR --input file.wav

Modes: train (default) / --eval / --inference; `--opts KEY VALUE ...` freeform
overrides; `--input_sr N` collapses the random-resample range (specialised
models); TAG doubles as `{input_sr}_{target_sr}` for eval/infer
(reference main.py:239-283).
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np


def parse_option(argv=None):
    p = argparse.ArgumentParser("VM-ASR/TPU train/eval/infer")
    p.add_argument("--cfg", type=str, required=True, metavar="FILE",
                   help="path to config yaml")
    p.add_argument("--opts", nargs="+", default=None,
                   help="override config options: KEY VALUE pairs")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="run directory to resume / load checkpoints from")
    p.add_argument("--accumulation_steps", type=int, default=None)
    p.add_argument("--disable_amp", action="store_true")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--tag", type=str, default=None)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--inference", action="store_true")
    p.add_argument("--throughput", action="store_true")
    p.add_argument("--optim", type=str, default=None)
    p.add_argument("--input_sr", type=int, default=None)
    p.add_argument("--target_sr", type=int, default=None)
    p.add_argument("--input", type=str, default=None,
                   help="wav file or directory for --inference")
    p.add_argument("--synthetic_data", action="store_true",
                   help="use the synthetic corpus instead of VCTK (smoke runs)")
    p.add_argument("--synthetic_n", type=int, default=64,
                   help="synthetic corpus size (with --synthetic_data)")
    return p.parse_args(argv)


def validate_resume_path(config):
    """Resume dir must exist and contain checkpoints
    (reference main.py:228-236)."""
    path = config.MODEL.RESUME_PATH
    if path and not os.path.isdir(path):
        raise FileNotFoundError(f"Resume path not found: {path}")


def main(argv=None):
    args = parse_option(argv)

    from .core import create_logger, get_config

    config = get_config(args)
    logger = create_logger(config.OUTPUT)
    logger.info(f"Mode: {'eval' if config.EVAL_MODE else 'inference' if config.INFERENCE_MODE else 'train'}")

    # Seeding (reference main.py:293-298): host-side RNGs; JAX keys are
    # threaded explicitly from config.SEED.
    random.seed(config.SEED)
    np.random.seed(config.SEED)

    import jax
    import jax.numpy as jnp

    from .core.checkpoint import CheckpointManager
    from .data import SyntheticVCTK, get_loaders
    from .models import get_model

    models = get_model(config)
    logger.info(f"Model: {config.MODEL.NAME} ({list(models.keys())})")

    dataset = None
    if args.synthetic_data:
        dataset = SyntheticVCTK(
            n_items=args.synthetic_n, sr=config.DATA.TARGET_SR,
            duration=config.DATA.SEGMENT + 0.05,
            training=not (config.EVAL_MODE or config.INFERENCE_MODE),
        )

    if config.THROUGHPUT_MODE:
        # The reference left this a TODO (main.py:83); here it measures real
        # numbers: batched inference RTF and segments/sec on the live backend.
        from .core.profiling import benchmark

        generator = models["generator"]
        seg = int(config.DATA.SEGMENT * config.DATA.TARGET_SR)
        bsz = config.DATA.BATCH_SIZE
        x = jnp.zeros((bsz, 1, seg), jnp.float32)
        hf = jnp.full((bsz,), 171, jnp.int32)
        params = jax.jit(generator.init)(
            jax.random.PRNGKey(config.SEED), x[:1], hf[:1]
        )["params"]
        generator, params = _maybe_stack(config, generator, params, logger)
        stats = benchmark(
            lambda p, v, h: generator.apply({"params": p}, v, h,
                                            deterministic=True),
            params, x, hf, iters=10,
            # chain outputs into inputs: the remote tunnel memoizes repeated
            # identical executions, which would fake the throughput.
            chain=lambda out, p, v, h: (p, v + 1e-6 * out, h),
        )
        segs_per_sec = bsz / stats["seconds_per_call"]
        logger.info(
            f"throughput: {segs_per_sec:.1f} segments/s "
            f"({segs_per_sec * config.DATA.SEGMENT:.0f}x real-time, "
            f"batch {bsz})"
        )
        return 0

    if config.INFERENCE_MODE:
        from .train.inferencer import Inferencer

        # Validate cheap preconditions before the (expensive) model init.
        if args.input is None:
            raise ValueError("--inference requires --input FILE_OR_DIR")
        if not os.path.exists(args.input):
            raise FileNotFoundError(f"--input path does not exist: {args.input}")
        params = _load_generator_params(config, models["generator"], logger)
        generator, params = _maybe_stack(config, models["generator"], params,
                                         logger)
        inferencer = Inferencer(config, generator, params, logger)
        if os.path.isdir(args.input):
            inferencer.infer_directory(args.input)
        else:
            inferencer.infer_file(args.input)
        return 0

    if config.EVAL_MODE:
        from .train.tester import Tester

        loader = get_loaders(config, logger, dataset=dataset)
        params = _load_generator_params(config, models["generator"], logger)
        generator, params = _maybe_stack(config, models["generator"], params,
                                         logger)
        out_dir = os.path.join(
            config.TEST.RESULTS_DIR,
            config.MODEL.NAME,
            str(config.TAG.split("_")[1]),
            str(config.TAG.split("_")[0]),
        )
        tester = Tester(config, generator, params, loader, logger,
                        output_dir=out_dir)
        tester.evaluate()
        return 0

    # -- training --------------------------------------------------------------
    from .core.wandb_utils import finish_wandb_run, init_wandb_run
    from .train.trainer import Trainer

    run = init_wandb_run(config, logger,
                         resume=bool(config.MODEL.RESUME_PATH))
    train_loader, valid_loader = get_loaders(config, logger, dataset=dataset)
    trainer = Trainer(config, models, train_loader, valid_loader, logger)
    try:
        trainer.train()
    finally:
        finish_wandb_run(run)
    return 0


def _maybe_stack(config, generator, params, logger):
    """Swap in the stream-stacked execution model for eval/inference when
    MODEL.VSSM.STACKED_EXECUTION is set (identical outputs, ~half the ops)."""
    from .models.factory import to_stacked

    new_gen, new_params = to_stacked(config, generator, params)
    if new_gen is not generator:
        logger.info("Stacked dual-stream execution enabled "
                    "(MODEL.VSSM.STACKED_EXECUTION)")
    return new_gen, new_params


def _load_generator_params(config, generator, logger):
    """Load `best-G` params from the resume dir
    (reference utils/utils.py:159-176)."""
    import jax
    import jax.numpy as jnp

    from .core.checkpoint import CheckpointManager

    run_dir = config.MODEL.RESUME_PATH or config.OUTPUT
    ckpt = CheckpointManager(run_dir)
    seg = int(config.DATA.SEGMENT * config.DATA.TARGET_SR)
    dummy_x = jnp.zeros((1, 1, seg), jnp.float32)
    dummy_hf = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(generator.init)(jax.random.PRNGKey(config.SEED),
                                        dummy_x, dummy_hf)
    params = variables["params"]
    for kind in ("best", "latest"):
        restored = ckpt.restore("G", kind)
        if restored is not None:
            logger.info(f"Loaded {kind} generator checkpoint from {run_dir}")
            loaded = restored["state"]
            if isinstance(loaded, dict) and "params" in loaded:
                loaded = loaded["params"]
            return jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b, a.dtype), params, loaded
            )
    # Reference-format torch checkpoints (`*best-G*.pth`, the published
    # artifact layout — reference utils/utils.py:159-176): convert through
    # compat.torch_port so a reference run dir is directly evaluable.
    import glob as _glob

    pths = sorted(_glob.glob(os.path.join(run_dir, "*best*G*.pth")))
    if pths:
        from .compat.torch_port import load_torch_checkpoint

        loaded = load_torch_checkpoint(pths[0])
        logger.info(f"Loaded reference torch checkpoint {pths[0]}")
        return jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(b, a.dtype), params, loaded
        )
    logger.warning(
        f"No checkpoint found in {run_dir}; using random init "
        "(reference tolerates absent checkpoints too, utils.py:121-129)"
    )
    return params


if __name__ == "__main__":
    sys.exit(main())
