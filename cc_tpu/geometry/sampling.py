"""Differentiable bilinear sampling (grid_sample) and flow warping, NHWC.

TPU-native replacement for the reference's two hot native ops:
torch.nn.functional.grid_sample (used at inverse_warp.py:190,281 and
back2future.py:310-312). Semantics match torch's grid_sample with
align_corners=True (the torch<=1.2 default the reference ran under):

- normalized coords in [-1, 1] map to pixel centers 0..W-1 / 0..H-1,
- padding_mode='zeros': out-of-bounds corner taps contribute exact 0
  (boundary samples blend with 0),
- padding_mode='border': sampling location clamped to the image rect.

Implemented as four gathers via take_along_axis; XLA lowers these to TPU
gather ops and fuses the weighting arithmetic. A Pallas fused
warp-and-difference kernel can slot in behind the same API later.
"""
from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img_flat: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
               h: int, w: int) -> jnp.ndarray:
    """Gather img[b, iy, ix, :] for integer index maps ix/iy [B, Hg, Wg]."""
    b = img_flat.shape[0]
    flat = (iy * w + ix).reshape(b, -1, 1)
    out = jnp.take_along_axis(img_flat, flat, axis=1)
    return out.reshape(b, ix.shape[1], ix.shape[2], img_flat.shape[-1])


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = "zeros") -> jnp.ndarray:
    """Bilinear sample `img` [B, H, W, C] at normalized `grid` [B, Hg, Wg, 2].

    grid[..., 0] is x in [-1, 1], grid[..., 1] is y (align_corners=True).
    """
    b, h, w, c = img.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

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

    img_flat = img.reshape(b, h * w, c)
    out = jnp.zeros((b, grid.shape[1], grid.shape[2], c), img.dtype)
    for dy, wyy in ((0.0, wy0), (1.0, wy1)):
        for dx, wxx in ((0.0, wx0), (1.0, wx1)):
            cx = x0f + dx
            cy = y0f + dy
            ix = jnp.clip(cx, 0, w - 1).astype(jnp.int32)
            iy = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
            tap = _gather_2d(img_flat, ix, iy, h, w)
            weight = wxx * wyy
            if padding_mode == "zeros":
                valid = ((cx >= 0) & (cx <= w - 1) & (cy >= 0) & (cy <= h - 1))
                weight = weight * valid.astype(img.dtype)
            out = out + tap * weight[..., None]
    return out


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray,
              padding_mode: str = "zeros") -> jnp.ndarray:
    """Warp `img` [B, H, W, C] by optical `flow` [B, H, W, 2] (pixels).

    out(p) = img(p + flow(p)). Parity: inverse_warp.py:164-192.
    """
    _, h, w, _ = flow.shape
    gx = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    gy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    X = gx + flow[..., 0]
    Y = gy + flow[..., 1]
    Xn = 2.0 * (X / (w - 1.0) - 0.5)
    Yn = 2.0 * (Y / (h - 1.0) - 0.5)
    grid = jnp.stack([Xn, Yn], axis=-1)
    return grid_sample(img, grid, padding_mode=padding_mode)
