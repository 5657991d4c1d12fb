"""Ablation timing of the CC train step on the real TPU.

Times variants of the jitted step (forwards-only, +each loss, per-net) with
forced D2H sync per window (block_until_ready is a no-op on the axon
plugin). Output: one line per variant with ms/step, so the perf pass knows
where the 433 ms actually goes.

Usage:  python scripts/ablate.py [variant ...]
        (no args = all variants; each variant compiles its own program,
         first run ~minutes each on the remote-compile tunnel)
Env:    CC_ABL_DTYPE=float32|bfloat16, CC_ABL_STEPS=20
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from scripts._bench_util import sync as _sync  # noqa: E402


def make_batch(cfg, b):
    r = np.random.RandomState(0)
    h, w = cfg.height, cfg.width
    k = np.array([[w * 0.6, 0, w / 2], [0, h * 1.2, h / 2], [0, 0, 1]],
                 dtype=np.float32)[None].repeat(b, 0)
    return {
        "tgt": jnp.asarray(r.rand(b, h, w, 3).astype(np.float32) * 2 - 1),
        "refs": jnp.asarray(
            r.rand(b, 4, h, w, 3).astype(np.float32) * 2 - 1),
        "intrinsics": jnp.asarray(k),
        "intrinsics_inv": jnp.asarray(np.linalg.inv(k)),
    }


def main():
    from cc_tpu.train import TrainConfig, make_models, init_state
    from cc_tpu.train.state import apply_net
    from cc_tpu.train.step import forward_all, compute_losses

    dtype = os.environ.get("CC_ABL_DTYPE", "float32")
    steps = int(os.environ.get("CC_ABL_STEPS", "20"))
    cfg = TrainConfig(height=256, width=832, batch_size=4,
                      wssim=0.997, smoothness_type="edgeaware",
                      mask_loss_weight=0.1, flow_photo_loss_weight=0.5,
                      cam_photo_loss_weight=1.0, smooth_loss_weight=0.1,
                      consensus_loss_weight=0.3, lr=1e-4,
                      compute_dtype=dtype)
    mods = make_models(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg, cfg.batch_size)
    params, bs = state.params, state.batch_stats

    def tree_sum(t):
        leaves = jax.tree_util.tree_leaves(t)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    def loss_with(mask):
        """mask: set of loss names to include; forwards always run."""
        def f(params, batch):
            outputs, _ = forward_all(cfg, mods, params, bs, batch)
            if not mask:  # forwards only: scalarize every output
                return tree_sum([outputs["disparities"], outputs["pose"],
                                 outputs["exp_masks"], outputs["flow_fwd"],
                                 outputs["flow_bwd"]])
            import dataclasses
            c = dataclasses.replace(
                cfg,
                cam_photo_loss_weight=cfg.cam_photo_loss_weight if "l1" in mask else 0.0,
                mask_loss_weight=cfg.mask_loss_weight if "l2" in mask else 0.0,
                smooth_loss_weight=cfg.smooth_loss_weight if "l3" in mask else 0.0,
                flow_photo_loss_weight=cfg.flow_photo_loss_weight if "l4" in mask else 0.0,
                consensus_loss_weight=cfg.consensus_loss_weight if "l5" in mask else 0.0,
            )
            total, _ = compute_losses(c, outputs, batch)
            return total
        return f

    def net_only(name):
        def f(params, batch):
            tgt = batch["tgt"]
            refs = [batch["refs"][:, i] for i in range(4)]
            dt = cfg.compute_dtype
            if name == "disp":
                out, _ = apply_net(mods.disp, params["disp"], bs["disp"],
                                   tgt, training=True, compute_dtype=dt)
            elif name == "pose":
                out, _ = apply_net(mods.pose, params["pose"], bs["pose"],
                                   tgt, refs, training=True, compute_dtype=dt)
            elif name == "mask":
                out, _ = apply_net(mods.mask, params["mask"], bs["mask"],
                                   tgt, refs, training=True, compute_dtype=dt)
            elif name == "flow":
                out, _ = apply_net(mods.flow, params["flow"], bs["flow"],
                                   tgt, refs[1:3], training=True,
                                   compute_dtype=dt)
            return tree_sum(out)
        return f

    # --- primitive micro-variants at the real loss-stack shapes -----------
    # The CC loss stack at 832x256 b4 performs ~60 bilinear warps and ~36
    # SSIMs across the 6-scale pyramid per step. These micro functions
    # reproduce those op counts in isolation so the hot primitive is
    # unambiguous.
    h0, w0 = cfg.height, cfg.width
    scale_hw = [(h0 >> s, w0 >> s) for s in range(6)]

    def micro(fn_name):
        from cc_tpu.geometry import flow_warp
        from cc_tpu.losses.ssim import ssim
        from cc_tpu.ops.image import adaptive_avg_pool

        def f(params, batch):
            # differentiate w.r.t. an image-sized leaf so there IS a backward
            tgt = batch["tgt"] + tree_sum(params["pose"]) * 0.0
            ref = batch["refs"][:, 0]
            total = 0.0
            if fn_name == "warp60":
                for (h, w) in scale_hw:
                    t = adaptive_avg_pool(tgt, (h, w))
                    r = adaptive_avg_pool(ref, (h, w))
                    base = jnp.stack([t[..., 0], r[..., 1]], -1)
                    for i in range(10):
                        total = total + jnp.mean(
                            flow_warp(r, base * (0.1 * i)))
            elif fn_name == "ssim36":
                for (h, w) in scale_hw:
                    t = adaptive_avg_pool(tgt, (h, w))
                    r = adaptive_avg_pool(ref, (h, w))
                    for i in range(6):
                        total = total + jnp.mean(ssim(t, r * (0.1 + i)))
            elif fn_name == "pool36":
                for (h, w) in scale_hw:
                    for i in range(6):
                        total = total + jnp.mean(
                            adaptive_avg_pool(tgt * (1 + 0.1 * i), (h, w)))
            return total
        return f

    variants = {
        "fwd_only": loss_with(set()),
        "full": loss_with({"l1", "l2", "l3", "l4", "l5"}),
        "l1_photo_cam": loss_with({"l1"}),
        "l3_smooth": loss_with({"l3"}),
        "l4_photo_flow": loss_with({"l4"}),
        "l5_consensus": loss_with({"l5"}),
        "net_disp": net_only("disp"),
        "net_pose": net_only("pose"),
        "net_mask": net_only("mask"),
        "net_flow": net_only("flow"),
        "micro_warp60": micro("warp60"),
        "micro_ssim36": micro("ssim36"),
        "micro_pool36": micro("pool36"),
    }
    chosen = sys.argv[1:] or list(variants)

    print(f"# dtype={dtype} steps/window={steps} "
          f"device={jax.devices()[0]}", flush=True)
    for name in chosen:
        f = variants[name]
        gf = jax.jit(jax.grad(lambda p, b: f(p, b)))
        t_c0 = time.perf_counter()
        g = gf(params, batch)
        _sync(tree_sum(g))
        compile_s = time.perf_counter() - t_c0
        # timed: chain grads through params-like accumulation is awkward;
        # instead run N independent calls and sync the last — calls on the
        # same stream execute in order, so the last sync covers all N.
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(steps):
                g = gf(params, batch)
            _sync(jax.tree_util.tree_leaves(g)[0])
            dt_w = (time.perf_counter() - t0) / steps
            best = dt_w if best is None else min(best, dt_w)
        print(f"{name:16s} {best*1e3:8.1f} ms/step   "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
