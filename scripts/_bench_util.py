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


def paper_config(b: int = 4, h: int = 256, w: int = 832, **overrides):
    """The canonical full-step operating point every scripts/ harness and
    bench.py time: CC paper flags at 832x256 batch 4 (reference
    train.py's run recipe). Keep ONE definition so a future change to the
    paper defaults can't silently de-calibrate one harness against the
    others (advisor r5). Pre-r5 scripts inline the same literals; they are
    frozen measurement artifacts backing PARITY.md and stay as-is."""
    from cc_tpu.train import TrainConfig
    base = dict(
        height=h, width=w, batch_size=b,
        wssim=0.997, smoothness_type="edgeaware",
        mask_loss_weight=0.1, flow_photo_loss_weight=0.5,
        cam_photo_loss_weight=1.0, smooth_loss_weight=0.1,
        consensus_loss_weight=0.3, lr=1e-4,
    )
    base.update(overrides)
    return TrainConfig(**base)


def paper_batch(cfg, seed: int = 0):
    """Deterministic synthetic batch (images in [-1,1], plausible KITTI
    intrinsics) at cfg's shapes — the input every harness times against."""
    b, h, w = cfg.batch_size, cfg.height, cfg.width
    r = np.random.RandomState(seed)
    k = np.array([[w * 0.6, 0, w / 2], [0, h * 1.2, h / 2], [0, 0, 1]],
                 dtype=np.float32)[None].repeat(b, 0)
    return {
        "tgt": jnp.asarray(r.rand(b, h, w, 3).astype(np.float32) * 2 - 1),
        "refs": jnp.asarray(
            r.rand(b, cfg.nb_ref_imgs, h, w, 3).astype(np.float32) * 2 - 1),
        "intrinsics": jnp.asarray(k),
        "intrinsics_inv": jnp.asarray(np.linalg.inv(k)),
    }


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
