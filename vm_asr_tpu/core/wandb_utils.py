"""Weights & Biases integration (gated — reference utils/utils.py:93-109).

wandb is not part of this image; when WANDB.ENABLE is on and the package is
importable, the run is initialised with the reference's grouping/tagging
scheme and TensorBoard patching. Otherwise everything degrades to a no-op
with a single warning.
"""

from __future__ import annotations


def init_wandb_run(config, logger=None, resume: bool = False):
    if not config.WANDB.ENABLE:
        return None
    try:
        import wandb
    except ImportError:
        if logger:
            logger.warning("WANDB.ENABLE is set but wandb is not installed; "
                           "logging to TensorBoard only.")
        return None

    # Patch tensorboard so writer scalars mirror to wandb
    # (reference utils.py:100-103).
    wandb.tensorboard.patch(root_logdir=config.OUTPUT)
    run = wandb.init(
        project=config.WANDB.PROJECT,
        entity=config.WANDB.ENTITY,
        group=config.MODEL.NAME,
        name=config.TAG,
        tags=list(config.WANDB.TAGS),
        mode=config.WANDB.MODE,
        resume="allow" if (resume or config.WANDB.RESUME) else None,
        config=config.to_dict(),
    )
    return run


def finish_wandb_run(run) -> None:
    if run is not None:
        run.finish()
