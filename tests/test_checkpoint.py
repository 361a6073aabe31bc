"""CheckpointManager lifecycle (reference base_trainer.py:130-179,
utils/utils.py:112-178)."""

import numpy as np

import jax.numpy as jnp

from vm_asr_tpu.core.checkpoint import CheckpointManager


def _state(val):
    return {"params": {"w": np.full((3, 3), val, np.float32)},
            "step": np.int32(val)}


def test_latest_best_epoch_lifecycle(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("G", _state(1), epoch=0, monitor_best=1.0, config={"A": 1},
              best=True)
    ckpt.save("G", _state(2), epoch=1, monitor_best=1.0, best=False)
    ckpt.save("G", _state(3), epoch=2, monitor_best=0.5, best=True,
              epoch_copy=True)

    assert ckpt.has("G", "latest")
    assert ckpt.has("G", "best")
    assert ckpt.has("G", "epoch-2")

    latest = ckpt.restore("G", "latest")
    assert latest["epoch"] == 2
    np.testing.assert_array_equal(latest["state"]["params"]["w"],
                                  np.full((3, 3), 3, np.float32))
    best = ckpt.restore("G", "best")
    assert best["monitor_best"] == 0.5

    # typed restore against a target pytree
    target = _state(0)
    restored = ckpt.restore("G", "best", target=target)
    np.testing.assert_array_equal(restored["state"]["params"]["w"],
                                  np.full((3, 3), 3, np.float32))


def test_restore_missing_returns_none(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    assert ckpt.restore("G", "latest") is None
    assert not ckpt.has("mpd")


def test_find_best(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("G", _state(1), epoch=0, monitor_best=1.0, best=True)
    path = CheckpointManager.find_best(str(tmp_path), "G")
    assert path is not None and path.endswith("checkpoint-best-G")
