"""Test configuration: force an 8-device local-CPU platform.

Tests never require real TPU hardware. Sharding/pjit tests use an 8-device
CPU mesh (the idiomatic "multi-chip without a cluster" substitute, see
SURVEY.md §4e).

NOTE: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
plugin in every process and pins jax_platforms='axon,cpu' via jax.config —
env vars (JAX_PLATFORMS/XLA_FLAGS) do NOT override that, only an explicit
config update does. jax_num_cpu_devices is the jax>=0.5 replacement for
--xla_force_host_platform_device_count.
"""
import os

# On few-core CI hosts the N virtual devices' executions serialize; XLA's
# CPU collective rendezvous then hits its default 40s TERMINATE timeout and
# SIGABRTs the process. Raise it (must be in XLA_FLAGS before jax init).
_flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_collective_call_terminate_timeout_seconds=3000"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the big jitted graphs (models, train step)
# compile once per machine instead of once per pytest run. NOTE: must NOT
# share a dir with axon/TPU runs — the axon remote-compile helper writes
# CPU AOT entries for a different machine profile (mismatched CPU features
# stall collectives until XLA's stuck-check aborts the process).
jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Initialize the backend NOW, locking the platform choice in. Without this,
# a test that imports a cc_tpu.cli module before any jax use would let
# cli/__init__.py re-apply a JAX_PLATFORMS env var (the driver environment
# exports JAX_PLATFORMS=axon) and silently move the whole test process onto
# the remote TPU — where big programs fail the remote-compile size limit
# and compile caches cross profiles. The init call must be an unconditional
# statement (not inside an assert, which python -O strips).
_backend, _n_devices = jax.default_backend(), len(jax.devices())
if _backend != "cpu" or _n_devices != 8:
    raise RuntimeError(
        f"test platform lock failed: backend={_backend} devices={_n_devices}"
        " (expected cpu x8)")

# Shared fabricated-dataset/checkpoint session fixtures, registered HERE so
# every test module uses one instance (importing them per-module would
# re-register and re-fabricate per importer).
from tests.cli_fixtures import *  # noqa: E402,F401,F403
