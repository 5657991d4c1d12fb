"""Rotation parameterizations: Euler angles, quaternions, 6-DoF pose vectors.

Behavioral parity with /root/reference/inverse_warp.py:82-162 (euler2mat,
quat2mat, pose_vec2mat), expressed as batched jnp math.
"""
from __future__ import annotations

import jax.numpy as jnp


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (rx, ry, rz) [B, 3] -> rotation matrices [B, 3, 3].

    R = Rx @ Ry @ Rz, matching inverse_warp.py:82-119.
    """
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)

    cosz, sinz = jnp.cos(z), jnp.sin(z)
    zmat = jnp.stack(
        [cosz, -sinz, zeros, sinz, cosz, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)

    cosy, siny = jnp.cos(y), jnp.sin(y)
    ymat = jnp.stack(
        [cosy, zeros, siny, zeros, ones, zeros, -siny, zeros, cosy], axis=1
    ).reshape(-1, 3, 3)

    cosx, sinx = jnp.cos(x), jnp.sin(x)
    xmat = jnp.stack(
        [ones, zeros, zeros, zeros, cosx, -sinx, zeros, sinx, cosx], axis=1
    ).reshape(-1, 3, 3)

    return xmat @ ymat @ zmat


def quat2mat(quat: jnp.ndarray) -> jnp.ndarray:
    """3-coefficient quaternion [B, 3] -> rotation matrices [B, 3, 3].

    w is reconstructed as 1 before normalization (inverse_warp.py:122-143).
    """
    b = quat.shape[0]
    full = jnp.concatenate([jnp.ones((b, 1), quat.dtype), quat], axis=1)
    full = full / jnp.linalg.norm(full, axis=1, keepdims=True)
    w, x, y, z = full[:, 0], full[:, 1], full[:, 2], full[:, 3]

    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z

    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=1,
    ).reshape(b, 3, 3)
    return rot


def pose_vec2mat(vec: jnp.ndarray, rotation_mode: str = "euler") -> jnp.ndarray:
    """6-DoF pose [B, 6] (tx, ty, tz, rx, ry, rz) -> [B, 3, 4] transform.

    Parity: inverse_warp.py:146-162.
    """
    translation = vec[:, :3, None]  # [B, 3, 1]
    rot = vec[:, 3:]
    if rotation_mode == "euler":
        rot_mat = euler2mat(rot)
    elif rotation_mode == "quat":
        rot_mat = quat2mat(rot)
    else:
        raise ValueError(f"unknown rotation_mode: {rotation_mode!r}")
    return jnp.concatenate([rot_mat, translation], axis=2)
