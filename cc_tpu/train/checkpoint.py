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
    # process identity via the distributed helpers (== jax.process_* in a
    # real launch; lets tests simulate a multi-process launch without
    # confusing orbax's own jax.process_count()-based internals)
    from cc_tpu.parallel import distributed
    if distributed.process_count() > 1:
        # Multi-host launch: checkpoint I/O here is primary-only (save) or
        # per-process independent (restore from a shared FS), and it only
        # ever touches host-local numpy trees — so orbax's collective
        # barriers must be scoped to THIS process alone. The default
        # StandardCheckpointer syncs across all processes ("should be
        # called by all hosts"), which deadlocks a primary-only save: the
        # other processes are already inside the next epoch's all-reduce.
        me = distributed.process_index()
        return ocp.Checkpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me},
                barrier_sync_key_prefix=f"proc{me}"))
    return ocp.StandardCheckpointer()


def _host_tree(state: TrainState):
    """Fully host-local numpy copy of the state (device_get alone raises
    on non-addressable global arrays in a multi-process launch)."""
    from cc_tpu.parallel import distributed
    if distributed.process_count() > 1:
        return distributed.host_local_tree(state)
    return jax.device_get(state)


def save_checkpoint(save_dir: str, state: TrainState,
                    is_best: bool = False) -> str:
    """Write <save_dir>/checkpoint (and promote to <save_dir>/best)."""
    save_dir = os.path.abspath(save_dir)
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "checkpoint")
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = _ckptr()
    ckptr.save(path, _host_tree(state))
    if hasattr(ckptr, "wait_until_finished"):  # sync Checkpointer lacks it
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
    ckptr = _ckptr()
    tgt = _host_tree(target)
    if isinstance(ckptr, ocp.StandardCheckpointer):
        restored = ckptr.restore(path, target=tgt)
    else:  # process-scoped plain Checkpointer: no target= sugar
        restored = ckptr.restore(path, args=ocp.args.StandardRestore(tgt))
    return restored
