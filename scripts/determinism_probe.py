"""Bitwise run-to-run determinism probe for the CC train step on TPU.

Two identical-seed bf16 soaks diverged visibly by step ~150 (loss 0.31 vs
0.64), and a faithful replay of a NaN-producing window did not reproduce
the NaN — suggesting the axon TPU execution is not bitwise deterministic
run-to-run. This probe runs the SAME jitted step from the SAME initial
state over the SAME batches twice (and again in a fresh process, compared
via a printed digest) and reports the first step whose loss bits differ.

Usage: python scripts/determinism_probe.py [n_steps]
"""
from __future__ import annotations

import os
import sys
import struct

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cc_tpu.train import TrainConfig, make_models, init_state, build_train_step


def run_once(cfg, mods, step, n, batches):
    state = init_state(cfg, jax.random.PRNGKey(0))
    losses = []
    for i in range(n):
        state, m = step(state, batches[i % 8])
        losses.append(float(np.asarray(jax.device_get(m["loss"]))))
    return losses


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    dtype = os.environ.get("CC_DET_DTYPE", "bfloat16")
    cfg = TrainConfig(height=256, width=832, batch_size=4, wssim=0.997,
                      smoothness_type="edgeaware", mask_loss_weight=0.1,
                      flow_photo_loss_weight=0.5, cam_photo_loss_weight=1.0,
                      smooth_loss_weight=0.1, consensus_loss_weight=0.3,
                      lr=1e-4, compute_dtype=dtype)
    mods = make_models(cfg)
    step = build_train_step(cfg, mods, donate=False)
    r = np.random.RandomState(0)
    k = np.array([[832 * 0.6, 0, 416], [0, 256 * 1.2, 128], [0, 0, 1]],
                 np.float32)[None].repeat(4, 0)
    batches = []
    for _ in range(8):
        batches.append({
            "tgt": jnp.asarray(r.rand(4, 256, 832, 3).astype(np.float32) * 2 - 1),
            "refs": jnp.asarray(r.rand(4, 4, 256, 832, 3).astype(np.float32) * 2 - 1),
            "intrinsics": jnp.asarray(k),
            "intrinsics_inv": jnp.asarray(np.linalg.inv(k))})

    a = run_once(cfg, mods, step, n, batches)
    b = run_once(cfg, mods, step, n, batches)
    bits = lambda x: struct.pack("<f", x).hex()
    first_diff = next((i for i, (x, y) in enumerate(zip(a, b)) if
                       bits(x) != bits(y)), None)
    print(f"# dtype={dtype} n={n}")
    print("digest_run_a:", " ".join(bits(x) for x in a[:8]), "...",
          bits(a[-1]))
    print("digest_run_b:", " ".join(bits(x) for x in b[:8]), "...",
          bits(b[-1]))
    if first_diff is None:
        print(f"DETERMINISTIC within process over {n} steps")
    else:
        print(f"NONDETERMINISTIC: first loss-bit difference at step "
              f"{first_diff}: {a[first_diff]!r} vs {b[first_diff]!r}")


if __name__ == "__main__":
    main()
