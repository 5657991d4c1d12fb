"""Charbonnier (robust L1) penalties + disparity normalization.

Parity: loss_functions.py:13-25.
"""
from __future__ import annotations

import jax.numpy as jnp


def robust_l1(x: jnp.ndarray, q: float = 0.5, eps: float = 1e-2) -> jnp.ndarray:
    """mean((x^2 + eps)^q) — scalar Charbonnier penalty."""
    return jnp.mean(jnp.power(x * x + eps, q))


def robust_l1_per_pix(x: jnp.ndarray, q: float = 0.5,
                      eps: float = 1e-2) -> jnp.ndarray:
    """(x^2 + eps)^q elementwise."""
    return jnp.power(x * x + eps, q)


def spatial_normalize(disp: jnp.ndarray) -> jnp.ndarray:
    """Divide disparity [B,H,W,1] by its per-sample global mean
    (loss_functions.py:13-16)."""
    mean = jnp.mean(disp, axis=(1, 2, 3), keepdims=True)
    return disp / mean
