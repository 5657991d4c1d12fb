"""Minimal programmatic use of cc_tpu — no CLI, no dataset on disk.

Builds the full 4-net Competitive Collaboration training step (DispResNet6 +
PoseNetB6 + MaskNet6 + Back2Future, all 5 losses, Adam), runs it on a
synthetic moving-camera batch, and checkpoints the state. The same code
scales from 1 chip to a pod slice by passing a mesh (see the comment).

Run (any backend; first compile of the step takes minutes):

    python examples/minimal_train.py --height 64 --width 64 --steps 5
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_batch(rng: np.random.RandomState, b: int, h: int, w: int,
                    n_refs: int = 4):
    """A smooth random scene: (0.5, 0.5)-normalized frames + intrinsics."""
    base = rng.rand(b, h + 8, w + 8, 3).astype(np.float32)
    tgt = base[:, 4:4 + h, 4:4 + w]
    refs = np.stack([base[:, 4 + dy:4 + dy + h, 4 + dx:4 + dx + w]
                     for dy, dx in ((-2, 0), (-1, 0), (1, 0), (2, 0))
                     ][:n_refs], axis=1)
    k = np.array([[w * 0.6, 0, w / 2], [0, h * 1.2, h / 2], [0, 0, 1]],
                 np.float32)[None].repeat(b, 0)
    return {
        "tgt": jnp.asarray(tgt * 2 - 1),
        "refs": jnp.asarray(refs * 2 - 1),
        "intrinsics": jnp.asarray(k),
        "intrinsics_inv": jnp.asarray(np.linalg.inv(k)),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("-b", "--batch-size", type=int, default=2)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args(argv)

    from cc_tpu.train import (TrainConfig, build_train_step, init_state,
                              make_models)

    cfg = TrainConfig(
        height=args.height, width=args.width, batch_size=args.batch_size,
        # paper-default weights (README.md:59-66); smaller wssim keeps the
        # tiny synthetic scene numerically tame
        cam_photo_loss_weight=1.0, mask_loss_weight=0.1,
        smooth_loss_weight=0.1, flow_photo_loss_weight=0.5,
        consensus_loss_weight=0.3, wssim=0.3,
        smoothness_type="edgeaware", lr=1e-4,
        # mixed precision: compute_dtype="bfloat16" (pair with
        # clip_grad_norm=5.0 and skip_nonfinite_updates=True)
    )
    mods = make_models(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))

    # Data-parallel over every local device instead: pass a mesh —
    #   from cc_tpu.parallel import make_mesh, shard_batch
    #   mesh = make_mesh()                      # 1-D batch mesh
    #   step = build_train_step(cfg, mods, mesh=mesh)
    #   batch = shard_batch(batch, mesh)        # per step
    step = build_train_step(cfg, mods, donate=True)

    rng = np.random.RandomState(0)
    for i in range(args.steps):
        t0 = time.perf_counter()
        batch = synthetic_batch(rng, args.batch_size, args.height,
                                args.width)
        state, metrics = step(state, batch)
        loss = float(np.asarray(jax.device_get(metrics["loss"])))
        print(f"step {i}: loss={loss:.4f} "
              f"({time.perf_counter() - t0:.2f}s)")
        assert np.isfinite(loss)

    if args.checkpoint_dir:
        from cc_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint_dir, state)
        print(f"checkpoint written to {args.checkpoint_dir}")
    return state


if __name__ == "__main__":
    main()
