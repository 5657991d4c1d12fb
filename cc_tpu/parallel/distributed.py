"""Multi-host (multi-process) initialization for pod-slice training.

The reference is strictly single-process (torch.nn.DataParallel,
train.py:300-303). The TPU-native scale-out path keeps the SAME mesh
abstraction (parallel/mesh.py) — jax.devices() becomes the global device
list after jax.distributed.initialize, the 1-D data mesh spans all hosts,
and the jitted step is unchanged: XLA routes the gradient all-reduce over
ICI within a slice and DCN across slices.

What changes per process is only the data feed: each host loads the rows
of the global batch that live on its local devices (process_batch_slice),
and only process 0 writes checkpoints/logs.

Untestable on this single-host environment beyond the no-op path; the
arithmetic helpers are unit-tested with explicit (process_index,
process_count) arguments.
"""
from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize multi-process JAX if a multi-host launch is detected.

    Explicit arguments win; otherwise standard launcher env vars are used
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU-pod metadata that jax.distributed.initialize auto-detects).
    Returns True if distributed mode was initialized. Must be called
    before any backend/device use.
    """
    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    # A pod slice exports a COMMA-SEPARATED worker list; a single entry
    # (e.g. this environment's TPU_WORKER_HOSTNAMES=localhost) is a
    # single-host launch and must stay out of the multi-process runtime.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod = (len(workers.split(",")) > 1
              or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")))
    if not explicit and not on_pod:
        return False
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    # jax.distributed.initialize reads JAX_COORDINATOR_ADDRESS itself but
    # has NO env path for num_processes / process_id (it only auto-detects
    # them from cluster launchers: Slurm/OpenMPI/TPU pod metadata) — so a
    # plain env-var launch (JAX_NUM_PROCESSES/JAX_PROCESS_ID, e.g. the
    # 2-process CPU integration test) must forward them explicitly here.
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def warmup_collectives(timeout_ms: int = 1_800_000) -> None:
    """Align all processes, then run one tiny all-reduce over the global
    device set so the cross-process communicator clique is created while
    the processes are in lockstep.

    Why: communicator creation is the one rendezvous with a short hard
    deadline — the CPU backend's gloo TCP-store exchange times out at 30s
    (not configurable from jax), and process skew routinely exceeds that
    when tracing/compilation serializes (shared-core hosts) or differs
    across hosts. The clique is cached by the backend, so the training
    step's gradient all-reduce reuses it; once the context exists,
    collectives tolerate skew (a peer blocked in compilation just delays
    the op). The alignment barrier runs on the coordination service
    (pure gRPC, explicit generous timeout). On real pods this is the
    usual warmup no-op-with-benefits."""
    from jax._src import distributed as jdist
    client = jdist.global_state.client
    if client is not None:
        client.wait_at_barrier("cc_warmup_collectives", timeout_ms)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("d",))
    x = jax.device_put(np.ones(len(devs), np.float32),
                       NamedSharding(mesh, P("d")))
    jnp.sum(x).block_until_ready()


def process_batch_slice(global_batch_size: int,
                        process_index: int | None = None,
                        process_count: int | None = None) -> slice:
    """The rows of the global batch this process should load.

    With the batch axis sharded over a 1-D mesh of all global devices (in
    jax.devices() order = process-major), process p owns the contiguous
    rows [p*B/P, (p+1)*B/P). B must divide evenly by the process count.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    per = global_batch_size // n
    return slice(p * per, (p + 1) * per)


def host_local_tree(tree):
    """Host-local numpy copy of a pytree that may hold multi-host global
    jax.Arrays: fully-replicated leaves (params / batch_stats / opt_state
    under the mesh's replicated out_shardings) fetch whole; batch-sharded
    leaves fetch this process's first device shard. Lets primary-only
    non-collective work (validation, image logging, checkpoint writes) run
    as purely local computation instead of touching non-addressable arrays
    — a collective the other processes never join."""
    import numpy as np

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                return np.asarray(x)
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)
    return jax.tree_util.tree_map(fetch, tree)


def process_count() -> int:
    """Number of launch processes (1 on a single host)."""
    return jax.process_count()


def process_index() -> int:
    """This process's index in the launch (0 on a single host)."""
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
