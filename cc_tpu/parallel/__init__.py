from cc_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
)
from cc_tpu.parallel.distributed import (
    initialize as initialize_distributed, process_batch_slice, is_primary,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "initialize_distributed", "process_batch_slice",
           "is_primary"]
