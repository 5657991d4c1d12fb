"""Smoothness regularizers. Parity: loss_functions.py:287-341.

Inputs are lists over scales of NHWC tensors ([B,h,w,C]); gradients are taken
over the spatial axes (1, 2).
"""
from __future__ import annotations

import jax.numpy as jnp

from cc_tpu.losses.charbonnier import mean32
from cc_tpu.ops.image import adaptive_avg_pool


def _grad_hw(x):
    dy = x[:, 1:, :, :] - x[:, :-1, :, :]
    dx = x[:, :, 1:, :] - x[:, :, :-1, :]
    return dx, dy


def smooth_loss(preds):
    """2nd-order gradient L1, per-scale weight /= 2.3
    (loss_functions.py:323-341)."""
    if not isinstance(preds, (list, tuple)):
        preds = [preds]
    loss = 0.0
    weight = 1.0
    for p in preds:
        dx, dy = _grad_hw(p)
        dx2, dxdy = _grad_hw(dx)
        dydx, dy2 = _grad_hw(dy)
        loss = loss + weight * (
            mean32(jnp.abs(dx2)) + mean32(jnp.abs(dxdy))
            + mean32(jnp.abs(dydx)) + mean32(jnp.abs(dy2)))
        weight /= 2.3
    return loss


def edge_aware_smoothness_loss(img, preds):
    """|∇pred| * exp(-|∇img|), multi-scale (loss_functions.py:287-319).

    Kept quirk: the reference computes a per-scale weight but never applies
    it — all scales contribute equally; we do the same.
    """
    if not isinstance(preds, (list, tuple)):
        preds = [preds]

    loss = 0.0
    for p in preds:
        h, w = p.shape[1], p.shape[2]
        img_s = adaptive_avg_pool(img, (h, w))
        # NOTE: reference's gradient_x differentiates along H and gradient_y
        # along W (NCHW dims 2/3, loss_functions.py:288-294); the sum is
        # symmetric so this matches _grad_hw's (dx, dy) with names swapped.
        p_dx, p_dy = _grad_hw(p)
        i_dx, i_dy = _grad_hw(img_s)
        w_x = jnp.exp(-jnp.mean(jnp.abs(i_dx), axis=-1, keepdims=True))
        w_y = jnp.exp(-jnp.mean(jnp.abs(i_dy), axis=-1, keepdims=True))
        loss = loss + mean32(jnp.abs(p_dx) * w_x) + mean32(
            jnp.abs(p_dy) * w_y)
    return loss
