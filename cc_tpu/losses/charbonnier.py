"""Charbonnier (robust L1) penalties + disparity normalization.

Parity: loss_functions.py:13-25.
"""
from __future__ import annotations

import jax.numpy as jnp


def mean32(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Mean with an fp32 accumulator. Identity-cost for fp32 inputs (XLA
    folds the no-op convert); REQUIRED for loss_dtype=bfloat16 inputs —
    a bf16 mean over ~1e5+ elements loses all low-order contributions
    (bf16 has 8 mantissa bits) and the scalar losses drive the optimizer."""
    return jnp.mean(x.astype(jnp.float32), axis=axis)


def robust_l1(x: jnp.ndarray, q: float = 0.5, eps: float = 1e-2,
              axis=None) -> jnp.ndarray:
    """mean((x^2 + eps)^q) — scalar Charbonnier penalty (per-`axis` means
    when given; used by the stacked loss forms to reduce each ref view of
    a [B,N,...] tensor in ONE reduce op). The elementwise penalty runs in
    x's dtype (bf16 under loss_dtype=bfloat16); the mean reduces in fp32
    (see mean32)."""
    return mean32(jnp.power(x * x + eps, q), axis=axis)


def robust_l1_per_pix(x: jnp.ndarray, q: float = 0.5,
                      eps: float = 1e-2) -> jnp.ndarray:
    """(x^2 + eps)^q elementwise."""
    return jnp.power(x * x + eps, q)


def spatial_normalize(disp: jnp.ndarray) -> jnp.ndarray:
    """Divide disparity [B,H,W,1] by its per-sample global mean
    (loss_functions.py:13-16)."""
    mean = jnp.mean(disp, axis=(1, 2, 3), keepdims=True)
    return disp / mean
