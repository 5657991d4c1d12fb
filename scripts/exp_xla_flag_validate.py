"""Validate XLA TPU option NAMES against the axon server compiler (cheap:
tiny matmul compile per name; invalid names 500 out). Round-5 helper for
exp_xla_flags.py — only names that validate here are worth a ~10-min
full-step compile."""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")

CANDIDATES = [
    ("xla_tpu_scoped_vmem_limit_kib", "65536"),
    ("xla_tpu_enable_latency_hiding_scheduler", "true"),
    ("xla_tpu_enable_experimental_fusion_cost_model", "true"),
    ("xla_tpu_licm_size_inflation_ratio", "2"),
    ("xla_tpu_enable_dot_strength_reduction", "true"),
    ("xla_tpu_memory_bound_loop_optimizer", "true"),
    ("xla_tpu_enable_multi_level_nested_loop_fusion", "true"),
    ("xla_tpu_rwb_fusion", "true"),
    ("xla_tpu_copy_elision", "true"),
    ("xla_tpu_enable_aggressive_broadcast_priority_update", "true"),
    ("xla_tpu_dot_dot_fusion", "true"),
    ("xla_tpu_vector_load_fusion_size", "128"),
]


def main():
    a = jnp.ones((256, 256), jnp.float32)
    low = jax.jit(lambda a: (a @ a).sum()).lower(a)
    low.compile()  # warm the tunnel once
    names = sys.argv[1:]
    todo = ([(n.partition("=")[0], n.partition("=")[2] or "true")
             for n in names] if names else CANDIDATES)
    for name, val in todo:
        try:
            low.compile(compiler_options={name: val})
            print(f"VALID   {name}={val}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            # Only a compiler rejection that names the option counts as
            # "invalid"; a tunnel/transport failure (UNAVAILABLE, timeouts)
            # must abort the sweep rather than silently misclassify every
            # remaining candidate as a bad name.
            if name in msg or "option" in msg.lower() or "flag" in msg.lower():
                print(f"invalid {name}  ({msg.splitlines()[0][:80]})",
                      flush=True)
            else:
                print(f"ERROR   {name}: not an option-name rejection — "
                      f"aborting sweep ({msg.splitlines()[0][:120]})",
                      flush=True)
                raise


if __name__ == "__main__":
    main()
