"""Explainability-mask regularizers. Parity: loss_functions.py:139-158."""
from __future__ import annotations

import jax.numpy as jnp

from cc_tpu.losses.charbonnier import mean32


def logical_or(a, b):
    """Soft OR: 1 - (1-a)(1-b) (loss_functions.py:157-158)."""
    return 1.0 - (1.0 - a) * (1.0 - b)


def _safe_log(x):
    # torch BCE clamps log at -100; sigmoid outputs can underflow to 0 in fp32.
    return jnp.maximum(jnp.log(x), -100.0)


def explainability_loss(mask):
    """BCE(mask, 1) summed over scales — pulls masks toward rigid=1
    (loss_functions.py:148-155)."""
    if not isinstance(mask, (list, tuple)):
        mask = [mask]
    loss = 0.0
    for m in mask:
        loss = loss + mean32(-_safe_log(m))
    return loss


def gaussian_explainability_loss(mask):
    """exp(-mean((m-0.5)^2)/0.15) summed over scales (loss_functions.py:139-145;
    unused in the reference default path)."""
    if not isinstance(mask, (list, tuple)):
        mask = [mask]
    loss = 0.0
    for m in mask:
        loss = loss + jnp.exp(-mean32((m - 0.5) ** 2) / 0.15)
    return loss
