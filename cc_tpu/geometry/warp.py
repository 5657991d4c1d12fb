"""Rigid-scene warping: inverse_warp, pose2flow, flow2oob (NHWC).

Parity targets: /root/reference/inverse_warp.py:195-283.
"""
from __future__ import annotations

import jax.numpy as jnp

from cc_tpu.geometry.camera import cam2pixel, pixel2cam
from cc_tpu.geometry.rotation import pose_vec2mat
from cc_tpu.geometry.sampling import grid_sample


def _src_pixel_coords(depth, pose, intrinsics, intrinsics_inv,
                      rotation_mode, padding_mode):
    """Shared projection: target pixels -> source-view normalized coords."""
    cam_coords = pixel2cam(depth, intrinsics_inv)          # [B,H,W,3]
    pose_mat = pose_vec2mat(pose, rotation_mode)           # [B,3,4]
    proj = intrinsics @ pose_mat                           # [B,3,4]
    return cam2pixel(cam_coords, proj[:, :, :3], proj[:, :, 3], padding_mode)


def inverse_warp(img, depth, pose, intrinsics, intrinsics_inv,
                 rotation_mode: str = "euler",
                 padding_mode: str = "zeros"):
    """Warp source `img` [B,H,W,C] into the target frame.

    depth [B,H,W] (target), pose [B,6] target->source, K/K^-1 [B,3,3].
    Parity: inverse_warp.py:250-283.
    """
    coords = _src_pixel_coords(depth, pose, intrinsics, intrinsics_inv,
                               rotation_mode, padding_mode)
    return grid_sample(img, coords, padding_mode=padding_mode)


def pose2flow(depth, pose, intrinsics, intrinsics_inv,
              rotation_mode: str = "euler", padding_mode=None):
    """Rigid flow [B,H,W,2] induced by depth+pose. Parity: inverse_warp.py:195-220."""
    _, h, w = depth.shape
    coords = _src_pixel_coords(depth, pose, intrinsics, intrinsics_inv,
                               rotation_mode, padding_mode)
    gx = jnp.arange(w, dtype=depth.dtype)[None, None, :]
    gy = jnp.arange(h, dtype=depth.dtype)[None, :, None]
    X = (w - 1) * (coords[..., 0] / 2.0 + 0.5) - gx
    Y = (h - 1) * (coords[..., 1] / 2.0 + 0.5) - gy
    return jnp.stack([X, Y], axis=-1)


def flow2oob(flow):
    """Boolean out-of-bounds mask [B,H,W] for a flow field [B,H,W,2].

    Parity: inverse_warp.py:222-238.
    """
    _, h, w, _ = flow.shape
    gx = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    gy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    Xn = 2.0 * ((gx + flow[..., 0]) / (w - 1.0) - 0.5)
    Yn = 2.0 * ((gy + flow[..., 1]) / (h - 1.0) - 0.5)
    return (jnp.abs(Xn) > 1) | (jnp.abs(Yn) > 1)
