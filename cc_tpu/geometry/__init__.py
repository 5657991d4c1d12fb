"""Geometry core: camera projection, rotations, differentiable warping.

TPU-native rebuild of the reference geometry layer (/root/reference/inverse_warp.py).
All functions are pure jnp, NHWC, fully differentiable, and jit/vmap/pjit friendly.
"""
from cc_tpu.geometry.rotation import euler2mat, quat2mat, pose_vec2mat
from cc_tpu.geometry.camera import (
    pixel_grid,
    pixel2cam,
    cam2pixel,
    scale_intrinsics,
    scale_intrinsics_inv,
)
from cc_tpu.geometry.sampling import grid_sample, flow_warp
from cc_tpu.geometry.warp import inverse_warp, pose2flow, flow2oob

__all__ = [
    "euler2mat",
    "quat2mat",
    "pose_vec2mat",
    "pixel_grid",
    "pixel2cam",
    "cam2pixel",
    "scale_intrinsics",
    "scale_intrinsics_inv",
    "grid_sample",
    "flow_warp",
    "inverse_warp",
    "pose2flow",
    "flow2oob",
]
