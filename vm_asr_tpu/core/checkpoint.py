"""Orbax checkpointing with the reference's latest/best/epoch-N lifecycle.

Reference: base/base_trainer.py:130-179 (per-model
``checkpoint-{latest,best,epoch-N}-{G|mpd|msd}.pth`` containing state_dict +
optimizer + config + epoch + monitor_best) and utils/utils.py:112-178
(resume: restore model+optimizer+config+epoch; eval: `*best-G*`).

Here each checkpoint is an orbax directory holding the full train-state
pytree plus metadata; the same naming scheme is preserved so run folders look
familiar.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_saveable(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, output_dir: str):
        self.dir = os.path.abspath(output_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    # -- paths ---------------------------------------------------------------
    def _path(self, kind: str, model_tag: str) -> str:
        return os.path.join(self.dir, f"checkpoint-{kind}-{model_tag}")

    # -- save ----------------------------------------------------------------
    def save(
        self,
        model_tag: str,
        state: Any,
        epoch: int,
        monitor_best: float,
        config: Optional[dict] = None,
        best: bool = False,
        epoch_copy: bool = False,
    ) -> None:
        """Save `latest` (always), plus `best` / `epoch-N` copies
        (reference base_trainer.py:130-179)."""
        payload = _to_saveable(state)
        meta = {
            "epoch": int(epoch),
            "monitor_best": float(monitor_best),
            "model_tag": model_tag,
        }

        def write(path):
            if os.path.exists(path):
                shutil.rmtree(path)
            self._ckptr.save(path, payload)
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
            if config is not None:
                with open(os.path.join(path, "config.json"), "w") as f:
                    json.dump(config, f, indent=2, default=str)

        write(self._path("latest", model_tag))
        if best:
            write(self._path("best", model_tag))
        if epoch_copy:
            write(self._path(f"epoch-{epoch}", model_tag))

    # -- restore ---------------------------------------------------------------
    def restore(self, model_tag: str, kind: str = "latest",
                target: Any = None) -> Optional[Dict[str, Any]]:
        path = self._path(kind, model_tag)
        if not os.path.isdir(path):
            return None
        state = self._ckptr.restore(path, item=target)
        meta_path = os.path.join(path, "meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return {"state": state, **meta}

    @staticmethod
    def find_best(path: str, model_tag: str = "G") -> Optional[str]:
        """Glob a `*best*-<tag>` checkpoint dir under a run folder
        (reference utils/utils.py:159-176)."""
        hits = sorted(glob.glob(os.path.join(path, f"checkpoint-best-{model_tag}")))
        if not hits:
            hits = sorted(glob.glob(os.path.join(path, f"*best*{model_tag}*")))
        return hits[0] if hits else None

    def has(self, model_tag: str, kind: str = "latest") -> bool:
        return os.path.isdir(self._path(kind, model_tag))
