"""Gather-formulation experiments on the real TPU (round-2 perf pass).

The CC step's warp stack costs ~85 ms (micro_warp60) = ~7.5 ns/index,
~30x above the random-access HBM floor. XLA lowers the current
axis=1 take_along_axis to a slow per-index path; these experiments time
alternative formulations to find a fast one:

  E1  current grid_sample, 1 fine warp (256x832, 3ch img -> packed 12ch)
  E2  current grid_sample, 1 coarse warp (64x208)  [scaling probe]
  E3  take_along_axis axis=-1, per-row lane gather [R=1024, T=833]
  E8  take_along_axis axis=-1, FLAT-table 2D gather (the whole warp as
      one lane gather per channel): img [B, C, S] idx [B, C, P]
  E8b same but single-channel table [B*C rows share nothing]
  E5  Pallas select-loop row gather (EXP2 kernel) at [256, 832]
  E9  raw lax.gather of 2x2xC windows from the padded image (NO img4
      pack: one index per pixel fetches the whole bilinear window)
  E10 raw lax.gather of (1,1,4C) slices from img4 kept 4-D with 2-D
      (y,x) start indices (skips the flat-index reshape of the operand)
  E1g the current form's gather ONLY (packed table + take_along_axis),
      the apples-to-apples baseline for E9/E10

Usage: python scripts/exp_gather.py [e1 e2 ...]  (default: all)
"""
from __future__ import annotations

import os
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from scripts._bench_util import sync as _sync, bench  # noqa: E402


B, H, W, C = 4, 256, 832, 3
r = np.random.RandomState(0)
img = jnp.asarray(r.rand(B, H, W, C).astype(np.float32))
flow = jnp.asarray((r.rand(B, H, W, 2).astype(np.float32) - 0.5) * 20)


def main():
    chosen = set(sys.argv[1:]) or {"e1", "e2", "e3", "e8", "e8b", "e5",
                                   "e1g", "e9", "e10"}
    print(f"# device={jax.devices()[0]}", flush=True)

    from cc_tpu.geometry import flow_warp

    if "e1" in chosen:
        f = jax.jit(lambda i, fl: flow_warp(i, fl))
        bench("E1 grid_sample fine", f, img, flow)

    if "e2" in chosen:
        h2, w2 = H // 4, W // 4
        i2 = img[:, :h2, :w2]
        f2 = flow[:, :h2, :w2] * 0.25
        f = jax.jit(lambda i, fl: flow_warp(i, fl))
        bench("E2 grid_sample /4", f, i2, f2)

    if "e3" in chosen:
        # per-row lane gather: R rows, table T=W+1, P=W indices per row
        tab = jnp.asarray(r.rand(B * H, W + 1).astype(np.float32))
        idx = jnp.asarray(r.randint(0, W + 1, (B * H, W)).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=-1))
        bench("E3 lane gather row", f, tab, idx)

    if "e8" in chosen:
        # whole 2D warp as ONE flat lane gather per channel
        S, P = (H + 1) * (W + 1), H * W
        tab = jnp.asarray(r.rand(B, C, S).astype(np.float32))
        idx = jnp.asarray(
            r.randint(0, S, (B, 1, P)).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.take_along_axis(
            t, jnp.broadcast_to(i, (B, C, P)), axis=-1))
        bench("E8 flat lane gather", f, tab, idx)

    if "e8b" in chosen:
        # packed-channel flat gather: table [B, S, 4C] gather axis=1 is the
        # CURRENT form; this variant keeps channels minor but gathers along
        # axis=-1 of a [B*4C, S] layout (per-channel planes)
        S, P = (H + 1) * (W + 1), H * W
        tab = jnp.asarray(r.rand(B * 12, S).astype(np.float32))
        idx = jnp.asarray(
            np.repeat(r.randint(0, S, (B, 1, P)), 12, 1).reshape(B * 12, P)
            .astype(np.int32))
        f = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=-1))
        bench("E8b flat gather 12ch", f, tab, idx)

    if {"e1g", "e9", "e10"} & chosen:
        # shared inputs for the round-5 raw-gather forms: edge-padded image
        # planes + per-pixel integer tap coordinates (what grid_sample
        # computes at sampling.py:82-84)
        Hp, Wp, P = H + 1, W + 1, H * W
        imgp = jnp.asarray(r.rand(B, Hp, Wp, C).astype(np.float32))
        # FLOW-LIKE indices (identity grid + <=10 px jitter), not uniform
        # random: the TPU gather unit is ~6x faster on local indices
        # (5.5 vs 32 ns/index, PARITY.md) and the in-step regime is local
        gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        jy = np.clip(gy[None] + r.randint(-10, 11, (B, H, W)), 0, Hp - 2)
        jx = np.clip(gx[None] + r.randint(-10, 11, (B, H, W)), 0, Wp - 2)
        iy = jnp.asarray(jy.reshape(B, P).astype(np.int32))
        ix = jnp.asarray(jx.reshape(B, P).astype(np.int32))

    if "e1g" in chosen:
        # the CURRENT form's gather alone: packed [B, S, 4C] table,
        # take_along_axis axis=1 (sampling.py:85)
        tab = jnp.asarray(r.rand(B, Hp * Wp, 4 * C).astype(np.float32))

        def cur(t, y, x):
            flat = (y * Wp + x)[..., None]
            return jnp.take_along_axis(t, flat, axis=1)
        bench("E1g packed take_along_axis", jax.jit(cur), tab, iy, ix)

    if "e9" in chosen:
        # raw lax.gather: one (2, 2, C) window per output pixel, straight
        # from the padded image — no 4C pack materialization at all
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2))

        def win(ip, y, x):
            starts = jnp.stack(
                [jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                                  y.shape), y, x], axis=-1)  # [B, P, 3]
            return jax.lax.gather(
                ip, starts.reshape(B * P, 3), dn, slice_sizes=(1, 2, 2, C),
                mode=jax.lax.GatherScatterMode.CLIP)  # [B*P, 2, 2, C]
        bench("E9 lax.gather 2x2 window", jax.jit(win), imgp, iy, ix)

    if "e10" in chosen:
        # raw lax.gather of (1, 1, 4C) slices from img4 kept 4-D, 2-D (y,x)
        # start indices per pixel — same fetch as E1g without flattening
        # the operand to [B, S, 4C] (the 2.9 ms 'gather-operand reshapes'
        # formatting item)
        img4 = jnp.asarray(r.rand(B, Hp, Wp, 4 * C).astype(np.float32))
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(1, 2),
            start_index_map=(1, 2), operand_batching_dims=(0,),
            start_indices_batching_dims=(0,))

        def g4(t, y, x):
            starts = jnp.stack([y, x], axis=-1)  # [B, P, 2]
            return jax.lax.gather(
                t, starts, dn, slice_sizes=(1, 1, 1, 4 * C),
                mode=jax.lax.GatherScatterMode.CLIP)  # [B, P, 4C]
        bench("E10 lax.gather 4-D img4", jax.jit(g4), img4, iy, ix)

    if "e5" in chosen:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        imgs = jnp.asarray(r.rand(H, W).astype(np.float32))
        idxs = jnp.asarray(r.randint(0, H, (H, W)).astype(np.int32))

        def k2(img_ref, idx_ref, out_ref):
            idxv = idx_ref[:]
            acc = jnp.zeros_like(out_ref)

            def body(h, acc):
                row = img_ref[h, :]
                return jnp.where(idxv == h, row[None, :], acc)
            acc = jax.lax.fori_loop(0, H, body, acc)
            out_ref[:] = acc

        f = jax.jit(functools.partial(
            pl.pallas_call, k2,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))())
        g = jax.jit(lambda a, b: f(a, b))
        bench("E5 pallas select-loop", g, imgs, idxs)


if __name__ == "__main__":
    main()
