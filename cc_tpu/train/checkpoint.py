"""Checkpoint / resume via orbax.

The reference saves 5 files per experiment ({dispnet,posenet,masknet,
flownet,optimizer}_checkpoint.pth.tar) with best-copy promotion
(utils.py:55-63, train.py:396-413). Here: ONE composite pytree
{params x4, batch_stats, opt_state, step} per save, written to
<dir>/checkpoint and promoted to <dir>/best when the decisive error improves
— same recovery semantics (--resume), one atomic artifact.
"""
from __future__ import annotations

import os
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp

from cc_tpu.train.state import TrainState


def _ckptr():
    return ocp.StandardCheckpointer()


def save_checkpoint(save_dir: str, state: TrainState,
                    is_best: bool = False) -> str:
    """Write <save_dir>/checkpoint (and promote to <save_dir>/best)."""
    save_dir = os.path.abspath(save_dir)
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "checkpoint")
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = _ckptr()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    if is_best:
        best = os.path.join(save_dir, "best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return path


def load_checkpoint(path: str, target: TrainState) -> TrainState:
    """Restore a TrainState saved by save_checkpoint; `target` provides the
    tree structure/shapes (from init_state)."""
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "checkpoint")):
        path = os.path.join(path, "checkpoint")
    restored = _ckptr().restore(path, target=jax.device_get(target))
    return restored
