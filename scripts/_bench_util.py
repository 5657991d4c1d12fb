"""Shared on-TPU micro-benchmark plumbing for the scripts/ harnesses.

Encodes the two platform gotchas every timing here must respect (see
.claude/skills/verify/SKILL.md and PARITY.md):
- jax.block_until_ready is a NO-OP on the axon plugin: every timed window
  must end in a device-to-host readback;
- that readback must be of a SCALAR — device_get of a large array drags
  MBs through the ~100 MB/s remote tunnel and inflates the measurement
  (this exact artifact once faked a 122 ms result for a 1.5 ms conv).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _scalarize(x):
    return jnp.sum(x.astype(jnp.float32))


def sync(x) -> float:
    """Force device completion; returns the (reduced) value as a float."""
    if getattr(x, "size", 1) > 1:
        x = _scalarize(x)
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def bench(name: str, fn, *args, steps: int = 20, windows: int = 2) -> float:
    """Compile, then time `steps` chained calls per window (best window);
    prints one aligned line and returns seconds/step."""
    t0 = time.perf_counter()
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / steps
        best = dt if best is None else min(best, dt)
    print(f"{name:26s} {best * 1e3:9.3f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return best
