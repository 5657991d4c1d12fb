"""One process of a REAL multi-process `cc-train` launch (CPU backend).

Spawned by tests/test_distributed_2proc.py with the standard launcher env
vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); with
them unset this is the single-process control run of the same workload.
Unlike tests/test_multihost_wiring.py (which monkeypatches the distributed
helpers inside one process), every link here is the real thing:
jax.distributed.initialize, gloo cross-process CPU collectives under the
jitted step's gradient all-reduce, jax.make_array_from_process_local_data
assembly of per-process batch rows, primary-only orbax checkpoint writes on
host-local copies of non-addressable replicated arrays.

Reference equivalent: the parallel backend wiring at
/root/reference/train.py:300-303 (DataParallel), which never has a second
process to test against.

Usage: python tests/mh_train_worker.py DATA_DIR EXP_NAME EPOCH_SIZE
(cwd = the shared run directory; checkpoints/ and experiment_recorder.md
land there).
"""
from __future__ import annotations

import os
import sys


def main() -> int:
    data, name, epoch_size = sys.argv[1], sys.argv[2], sys.argv[3]
    import jax

    # sitecustomize pins jax_platforms='axon,cpu' via jax.config (env vars
    # lose) — lock the CPU backend the same way tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    # own cache dir: 1-device-CPU programs, distinct from the 8-device
    # pytest profile and from any axon-written AOT entries
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/cc_tpu_jax_cache_cpu_mp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from cc_tpu.cli.train import main as train_main
    train_main([
        data, "--name", name,
        "--epochs", "1", "--epoch-size", epoch_size,
        "-b", "2", "-j", "1", "--height", "64", "--width", "64",
        "--loader", "python", "--smoothness-type", "edgeaware",
        "-wssim", "0.3", "-m", "0.1", "-s", "0.05", "-c", "0.1",
        "--lr", "1e-4", "--print-freq", "1", "--seed", "0",
    ])

    want = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    got = jax.process_count()
    print(f"WORKER_DONE process={jax.process_index()}/{got}")
    return 0 if got == want else 3


if __name__ == "__main__":
    sys.exit(main())
