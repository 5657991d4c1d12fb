"""Test configuration: force an 8-device virtual CPU platform.

Tests never require real TPU hardware. Sharding/pjit tests use an 8-device
CPU mesh (the idiomatic "multi-chip without a cluster" substitute, see
SURVEY.md §4e). Must run before jax initializes its backends.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the big jitted graphs (models, train step)
# compile once per machine instead of once per pytest run.
jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
