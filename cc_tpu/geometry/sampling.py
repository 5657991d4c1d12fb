"""Differentiable bilinear sampling (grid_sample) and flow warping, NHWC.

TPU-native replacement for the reference's two hot native ops:
torch.nn.functional.grid_sample (used at inverse_warp.py:190,281 and
back2future.py:310-312). Semantics match torch's grid_sample with
align_corners=True (the torch<=1.2 default the reference ran under):

- normalized coords in [-1, 1] map to pixel centers 0..W-1 / 0..H-1,
- padding_mode='zeros': out-of-bounds corner taps contribute exact 0
  (boundary samples blend with 0),
- padding_mode='border': sampling location clamped to the image rect.

Implemented as ONE packed gather: the 2x2 tap neighborhood is pre-shifted
into 4C channels (cheap vectorized pads/slices), so a single
take_along_axis fetches all four bilinear taps per output pixel. XLA TPU
lowers small-slice gathers to a sequential dynamic-slice loop over the
index count — the loop count, not the byte count, is the cost — so one
4C-channel gather is ~4x cheaper than four C-channel gathers (round-2 perf
pass; numerics are bit-identical to the 4-gather form).
"""
from __future__ import annotations

import os

import jax.numpy as jnp

# CC_TPU_IMG4=flat keeps the gather operand AND its output in the flat
# [B, pixels, 4C] shape end-to-end (weights — 1/12th the bytes — are
# flattened instead of reshaping the taps back to [B, H, W, 4, C]; the
# output reshape then moves C instead of 4C channels). Bit-identical
# accumulation order; default stays the measured round-2 form until the
# full-step A/B on hardware says otherwise.
_IMG4_FLAT = os.environ.get("CC_TPU_IMG4", "packed") == "flat"


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = "zeros") -> jnp.ndarray:
    """Bilinear sample `img` [B, H, W, C] at normalized `grid` [B, Hg, Wg, 2].

    grid[..., 0] is x in [-1, 1], grid[..., 1] is y (align_corners=True).
    Semantics match torch grid_sample (align_corners=True); zeros mode
    zero-weights out-of-bounds taps exactly (inverse_warp.py:72-76 contract:
    fully-OOB pixels come out exactly 0).
    """
    b, h, w, c = img.shape
    # Coordinate math is always fp32: under compute_dtype=bfloat16 a bf16
    # x-coordinate at w=832 quantizes to ~4 px (8 mantissa bits) and the
    # bilinear fractions lose all precision. Taps are gathered in img.dtype
    # (bandwidth), accumulated in fp32, cast back. Identity in fp32 mode.
    x = (grid[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (h - 1)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)
    elif padding_mode != "zeros":
        raise ValueError(f"unknown padding_mode: {padding_mode!r}")

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    # Pack the 2x2 neighborhood into channels: img4[i, j] = the 4 taps whose
    # top-left corner is (i-1, j-1) of the unpadded image. Edge padding makes
    # the packed taps equal to the old per-tap clip() fetches at every
    # position reachable with nonzero weight (border mode exact; zeros mode
    # fetches at clamped positions only where the valid mask already zeroes
    # the weight).
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    views = (imgp[:, :-1, :-1], imgp[:, :-1, 1:],
             imgp[:, 1:, :-1], imgp[:, 1:, 1:])  # [B, H+1, W+1, C] each
    if _IMG4_FLAT:
        img4 = jnp.concatenate(
            [v.reshape(b, (h + 1) * (w + 1), c) for v in views], axis=-1)
    else:
        img4 = jnp.concatenate(views, axis=-1).reshape(
            b, (h + 1) * (w + 1), 4 * c)

    iy = (jnp.clip(y0f, -1.0, h - 1.0) + 1.0).astype(jnp.int32)
    ix = (jnp.clip(x0f, -1.0, w - 1.0) + 1.0).astype(jnp.int32)
    flat = (iy * (w + 1) + ix).reshape(b, -1, 1)
    taps = jnp.take_along_axis(img4, flat, axis=1)  # [B, P, 4C]
    if _IMG4_FLAT:
        taps = taps.reshape(b, -1, 4, c)  # minor-dim split only
    else:
        taps = taps.reshape(b, grid.shape[1], grid.shape[2], 4, c)

    weights = []
    for dy, wyy in ((0.0, wy0), (1.0, wy1)):
        for dx, wxx in ((0.0, wx0), (1.0, wx1)):
            weight = wxx * wyy
            if padding_mode == "zeros":
                cx = x0f + dx
                cy = y0f + dy
                valid = ((cx >= 0) & (cx <= w - 1)
                         & (cy >= 0) & (cy <= h - 1))
                weight = weight * valid.astype(weight.dtype)
            weights.append(weight)

    # fp32 accumulation, same order as the 4-gather form (bit-identical in
    # fp32 mode); cast back so bf16 callers keep a bf16 compute path
    if _IMG4_FLAT:  # flatten the small side (weights), not the taps
        weights = [wt.reshape(b, -1) for wt in weights]
    out = taps[..., 0, :] * weights[0][..., None]
    for t in range(1, 4):
        out = out + taps[..., t, :] * weights[t][..., None]
    if _IMG4_FLAT:
        out = out.reshape(b, grid.shape[1], grid.shape[2], c)
    return out.astype(img.dtype)


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray,
              padding_mode: str = "zeros") -> jnp.ndarray:
    """Warp `img` [B, H, W, C] by optical `flow` [B, H, W, 2] (pixels).

    out(p) = img(p + flow(p)). Parity: inverse_warp.py:164-192.
    """
    _, h, w, _ = flow.shape
    # fp32 grid construction (see grid_sample: bf16 coords quantize ~4 px)
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    X = gx + flow[..., 0].astype(jnp.float32)
    Y = gy + flow[..., 1].astype(jnp.float32)
    Xn = 2.0 * (X / (w - 1.0) - 0.5)
    Yn = 2.0 * (Y / (h - 1.0) - 0.5)
    grid = jnp.stack([Xn, Yn], axis=-1)
    return grid_sample(img, grid, padding_mode=padding_mode)
