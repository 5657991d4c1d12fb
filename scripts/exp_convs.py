"""Conv-lowering experiments on the real TPU (round-2 perf pass).

The 4-net forward+backward is 125 ms of the 215 ms step. Question: do the
classic exact rearrangements pay on this chip/XLA version?

  C1  dilated-input ConvTranspose k4 s2 (current lowering) at decoder shapes
  C2  depth-to-space equivalent: conv k3 with 4x output channels at input
      res + pixel shuffle (exact same linear map, 1.78x fewer MACs if XLA
      does not skip dilation zeros)
  C3  fine-level k3 conv at C=16, 832x256 (current)
  C4  space-to-depth equivalent: k2 conv at C=64, 416x128 (1.78x more MACs,
      4x better MXU lane utilization)
  C5  full train step at b8 (frames/s batch scaling; b4 = 215 ms baseline)

Usage: python scripts/exp_convs.py [c1 c2 ...]   (default: all)
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


from scripts._bench_util import sync as _sync, bench  # noqa: E402


r = np.random.RandomState(0)


def tconv_dilated(x, k4):
    """Current lowering: lhs-dilated conv, k=4 s=2 p=1 (models/layers.py)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, k4.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=dn)


def tconv_d2s(x, k4):
    """Exact d2s equivalent of k=4 s=2 p=1: phase filters from the same
    [4,4,I,O] kernel; 3-tap common window, x padded (1,1)."""
    kh, kw, ci, co = k4.shape
    # phase (a,b) uses taps u = 2*mu + r_a with r_a = (2 - a) % 2:
    # a=0 -> u in {0,2} reading x[t-1..t]; a=1 -> u in {1,3} at x[t..t+1];
    # both fit a common 3-tap window over x padded (1,1).

    def phase_filter(a, b):
        f = jnp.zeros((3, 3, ci, co), k4.dtype)
        for i, u in enumerate(((0, 2, None) if a == 0 else (None, 1, 3))):
            if u is None:
                continue
            for j, v in enumerate(((0, 2, None) if b == 0 else (None, 1, 3))):
                if v is None:
                    continue
                f = f.at[i, j].set(k4[u, v])
        return f

    filt = jnp.concatenate([phase_filter(a, b)
                            for a in (0, 1) for b in (0, 1)], axis=-1)
    dn = jax.lax.conv_dimension_numbers(x.shape, filt.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, filt, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=dn)
    b_, h, w, _ = y.shape
    y = y.reshape(b_, h, w, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b_, 2 * h, 2 * w, co)
    return y


def main():
    chosen = set(sys.argv[1:]) or {"c0", "c1", "c2", "c3", "c4", "c5"}
    print(f"# device={jax.devices()[0]}", flush=True)

    if "c0" in chosen:
        # exactness check of the d2s rewrite on-device
        x = jnp.asarray(r.rand(2, 16, 24, 8).astype(np.float32))
        k4 = jnp.asarray(r.rand(4, 4, 8, 12).astype(np.float32) - 0.5)
        a = jax.jit(tconv_dilated)(x, k4)
        b = jax.jit(tconv_d2s)(x, k4)
        d = float(jnp.abs(a - b).max())
        print(f"C0 d2s exactness: shapes {a.shape} vs {b.shape}  maxdiff {d:.2e}",
              flush=True)

    # decoder-representative tconv chain: levels (C_in -> C_out @ HxW_in)
    chain = [(256, 128, 16, 52), (128, 64, 32, 104), (64, 32, 64, 208),
             (32, 16, 128, 416)]
    B = 4
    xs = [jnp.asarray(r.rand(B, h, w, ci).astype(np.float32))
          for ci, co, h, w in chain]
    ks = [jnp.asarray((r.rand(4, 4, ci, co) - 0.5).astype(np.float32))
          for ci, co, h, w in chain]

    if "c1" in chosen:
        def f(xs, ks):
            tot = 0.0
            for x, k in zip(xs, ks):
                tot = tot + jnp.sum(tconv_dilated(x, k))
            return tot
        g = jax.jit(jax.grad(lambda xs: f(xs, ks)))
        bench("C1 tconv dilated chain", g, xs)

    if "c2" in chosen:
        def f(xs, ks):
            tot = 0.0
            for x, k in zip(xs, ks):
                tot = tot + jnp.sum(tconv_d2s(x, k))
            return tot
        g = jax.jit(jax.grad(lambda xs: f(xs, ks)))
        bench("C2 tconv d2s chain", g, xs)

    if "c3" in chosen:
        x = jnp.asarray(r.rand(B, 256, 832, 16).astype(np.float32))
        k = jnp.asarray((r.rand(3, 3, 16, 16) - 0.5).astype(np.float32))
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        def f(x):
            y = x
            for _ in range(4):
                y = jax.lax.conv_general_dilated(
                    y, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
            return jnp.sum(y)
        bench("C3 fine conv C16 x4", jax.jit(jax.grad(f)), x)

    if "c4" in chosen:
        x = jnp.asarray(r.rand(B, 128, 416, 64).astype(np.float32))
        k = jnp.asarray((r.rand(2, 2, 64, 64) - 0.5).astype(np.float32))
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        def f(x):
            y = x
            for _ in range(4):
                y = jax.lax.conv_general_dilated(
                    y, k, (1, 1), ((1, 0), (1, 0)), dimension_numbers=dn)
            return jnp.sum(y)
        bench("C4 s2d conv C64 x4", jax.jit(jax.grad(f)), x)

    if "c6" in chosen:
        # MXU control: ideal-shape conv (C 256->256 at 104x32) — if even
        # this is slow, conv inefficiency is platform-wide, not layout
        x = jnp.asarray(r.rand(B, 32, 104, 256).astype(np.float32))
        k = jnp.asarray((r.rand(3, 3, 256, 256) - 0.5).astype(np.float32))
        xb = x.astype(jnp.bfloat16)
        kb = k.astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        def f(x, k):
            y = x
            for _ in range(8):
                y = jax.lax.conv_general_dilated(
                    y, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
            return jnp.sum(y.astype(jnp.float32))
        t = bench("C6 MXU conv256 f32 x8", jax.jit(f), x, k)
        gf = 8 * 2 * 9 * 256 * 256 * 32 * 104 * B / 1e9
        print(f"   -> {gf/t/1e3:.1f} TFLOP/s fp32", flush=True)
        t = bench("C6b MXU conv256 bf16 x8", jax.jit(f), xb, kb)
        print(f"   -> {gf/t/1e3:.1f} TFLOP/s bf16", flush=True)

    if "c7" in chosen:
        # ragged concat channels (decoder iconv inputs are 17/21/37-wide):
        # does zero-padding C_in to a multiple of 8 remove layout copies?
        for ci in (17, 24, 37, 40):
            x = jnp.asarray(r.rand(B, 128, 416, ci).astype(np.float32))
            k = jnp.asarray((r.rand(3, 3, ci, 32) - 0.5).astype(np.float32))
            dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                                ("NHWC", "HWIO", "NHWC"))

            def f(x, k):
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
                return jnp.sum(y)
            bench(f"C7 conv ci={ci}", jax.jit(jax.grad(f)), x, k)

    if "c5" in chosen:
        from cc_tpu.train import (TrainConfig, make_models, init_state,
                                  build_train_step)
        for b in (8,):
            cfg = TrainConfig(height=256, width=832, batch_size=b,
                              wssim=0.997, smoothness_type="edgeaware",
                              mask_loss_weight=0.1,
                              flow_photo_loss_weight=0.5,
                              cam_photo_loss_weight=1.0,
                              smooth_loss_weight=0.1,
                              consensus_loss_weight=0.3, lr=1e-4,
                              compute_dtype="float32")
            mods = make_models(cfg)
            state = init_state(cfg, jax.random.PRNGKey(0))
            step = build_train_step(cfg, mods, donate=True)
            k = np.array([[832 * .6, 0, 416], [0, 256 * 1.2, 128], [0, 0, 1]],
                         np.float32)[None].repeat(b, 0)
            batch = {
                "tgt": jnp.asarray(r.rand(b, 256, 832, 3).astype(np.float32)),
                "refs": jnp.asarray(
                    r.rand(b, 4, 256, 832, 3).astype(np.float32)),
                "intrinsics": jnp.asarray(k),
                "intrinsics_inv": jnp.asarray(np.linalg.inv(k))}

            def run(state):
                state, m = step(state, batch)
                return state, m
            # time with per-window sync
            state, m = run(state)
            _sync(m["loss"])
            t0 = time.perf_counter()
            N = 20
            for _ in range(N):
                state, m = run(state)
            _sync(m["loss"])
            dt = (time.perf_counter() - t0) / N
            print(f"C5 full step b{b}        {dt*1e3:9.1f} ms "
                  f"= {b/dt:.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
