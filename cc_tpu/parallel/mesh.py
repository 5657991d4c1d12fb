"""Device-mesh data parallelism — the TPU-native replacement for the
reference's torch.nn.DataParallel (train.py:300-303).

Design (SURVEY.md §2.8 / §5.8): a 1-D mesh over all local devices with the
batch sharded on the 'data' axis and parameters replicated. Under jit with
these shardings, XLA inserts the gradient all-reduce over ICI automatically.
The same mesh abstraction scales unchanged from 1 chip to a pod slice
(multi-host would only add jax.distributed.initialize at startup).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over local devices (or the first n)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Mesh over the largest device count that divides the global batch
    (data parallelism requires batch % mesh size == 0)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while batch_size % n != 0:
        n -= 1
    return make_mesh(n, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays) sharded on the batch axis.

    Single process: a plain device_put of the full batch. Multi-host (after
    jax.distributed.initialize): each process passes only its OWN rows of
    the global batch (parallel/distributed.py process_batch_slice) and the
    shards are assembled into one global jax.Array — the TPU-native
    equivalent of the reference's DataParallel scatter (train.py:300-303),
    except no host ever materializes the full global batch."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
