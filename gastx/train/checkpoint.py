"""Checkpoint save/restore.

Parity target: the reference checkpoint dict
``{epoch, lr, random_state, optimizer, model_pos}`` (trainval.py:151-157) and
its resume semantics (epoch, optimizer state, lr, and the training batcher's
numpy RandomState restored, trainval.py:98-106). gastx checkpoints hold the
full TrainState pytree (params + BN stats + amsgrad state) as host numpy
arrays plus the same scheduling metadata. PyTorch ``.bin`` interchange lives
in :mod:`gastx.io.torch_import`.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, epoch: int, lr: float, train_state,
                    batcher_random_state: Optional[Any] = None,
                    extra: Optional[Dict] = None) -> None:
    blob = {
        "format": "gastx-checkpoint-v1",
        "epoch": epoch,
        "lr": lr,
        "train_state": _to_host(train_state),
        "random_state": (batcher_random_state.get_state()
                         if batcher_random_state is not None else None),
        "extra": extra or {},
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    assert blob.get("format") == "gastx-checkpoint-v1", "unknown checkpoint"
    return blob


def restore_batcher_random_state(blob: Dict):
    """Rebuild the numpy RandomState for reproducible shuffle resume."""
    if blob.get("random_state") is None:
        return None
    rs = np.random.RandomState()
    rs.set_state(blob["random_state"])
    return rs
