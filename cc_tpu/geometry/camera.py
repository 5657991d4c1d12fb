"""Pinhole camera projection (pixel <-> camera frames), NHWC.

Behavioral parity with /root/reference/inverse_warp.py:13-79 (set_id_grid,
pixel2cam, cam2pixel). No module-global grid cache — the grid is a traced
constant under jit, so XLA hoists it for free.
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel coordinate grid [H, W, 3] with rows (x, y, 1)."""
    x = jnp.arange(w, dtype=dtype)[None, :].repeat(h, axis=0)
    y = jnp.arange(h, dtype=dtype)[:, None].repeat(w, axis=1)
    ones = jnp.ones((h, w), dtype=dtype)
    return jnp.stack([x, y, ones], axis=-1)


def pixel2cam(depth: jnp.ndarray, intrinsics_inv: jnp.ndarray) -> jnp.ndarray:
    """Back-project pixels to camera-frame 3D points.

    Args:
      depth: [B, H, W]
      intrinsics_inv: [B, 3, 3]
    Returns:
      cam coords [B, H, W, 3]  (parity: inverse_warp.py:31-45, NCHW->NHWC)
    """
    _, h, w = depth.shape
    pix = pixel_grid(h, w, depth.dtype)  # [H, W, 3]
    rays = jnp.einsum("bij,hwj->bhwi", intrinsics_inv, pix)
    return rays * depth[..., None]


def cam2pixel(
    cam_coords: jnp.ndarray,
    proj_rot: jnp.ndarray,
    proj_tr: jnp.ndarray | None,
    padding_mode: str | None,
) -> jnp.ndarray:
    """Project camera-frame points into normalized pixel coords of another view.

    Args:
      cam_coords: [B, H, W, 3]
      proj_rot: [B, 3, 3] (K @ R)
      proj_tr: [B, 3] or None (K @ t)
      padding_mode: 'zeros' applies the reference's sentinel trick — any
        normalized coordinate outside [-1, 1] is set to exactly 2 so a
        zeros-padded sampler returns exact 0 with no boundary blend
        (inverse_warp.py:72-76). 'border'/None leave coords untouched.
    Returns:
      normalized coords [B, H, W, 2] in [-1, 1], x then y.
    """
    b, h, w, _ = cam_coords.shape
    p = jnp.einsum("bij,bhwj->bhwi", proj_rot, cam_coords)
    if proj_tr is not None:
        p = p + proj_tr[:, None, None, :]
    X, Y = p[..., 0], p[..., 1]
    Z = jnp.maximum(p[..., 2], 1e-3)  # clamp parity: inverse_warp.py:68

    X_norm = 2 * (X / Z) / (w - 1) - 1
    Y_norm = 2 * (Y / Z) / (h - 1) - 1
    if padding_mode == "zeros":
        # stop_gradient parity with the .detach() mask in the reference —
        # the sentinel assignment carries no gradient w.r.t. the mask itself.
        X_norm = jnp.where(jnp.abs(X_norm) > 1, 2.0, X_norm)
        Y_norm = jnp.where(jnp.abs(Y_norm) > 1, 2.0, Y_norm)
    return jnp.stack([X_norm, Y_norm], axis=-1)


def scale_intrinsics(intrinsics: jnp.ndarray, downscale) -> jnp.ndarray:
    """Rescale K for a pyramid level: first two ROWS divided by downscale.

    Parity: loss_functions.py:91 (torch.cat((intrinsics[:, 0:2]/downscale,
    intrinsics[:, 2:]), dim=1)).
    """
    scale = jnp.array([1.0 / downscale, 1.0 / downscale, 1.0])
    return intrinsics * scale[None, :, None]


def scale_intrinsics_inv(intrinsics_inv: jnp.ndarray, downscale) -> jnp.ndarray:
    """Rescale K^-1 for a pyramid level: first two COLUMNS times downscale.

    Parity: loss_functions.py:92.
    """
    scale = jnp.array([downscale, downscale, 1.0])
    return intrinsics_inv * scale[None, None, :]
