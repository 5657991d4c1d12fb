"""SSIM map with a Gaussian window (parity: /root/reference/ssim.py).

Returns the SSIM *map* (not its mean), like the reference's functional `ssim`
(window 13, sigma 1.5, zero 'same' padding, depthwise convolution).
Implemented as two separable depthwise convolutions per filtered quantity —
XLA fuses these into efficient TPU convolutions.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(x: jnp.ndarray, window_size: int, sigma: float
                    ) -> jnp.ndarray:
    """Separable depthwise Gaussian with zero 'same' padding, NHWC."""
    c = x.shape[-1]
    g = jnp.asarray(_gaussian_1d(window_size, sigma), dtype=x.dtype)
    kh = jnp.tile(g.reshape(window_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(g.reshape(1, window_size, 1, 1), (1, 1, 1, c))
    pad = window_size // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), ((pad, pad), (0, 0)), dimension_numbers=dn,
        feature_group_count=c)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), ((0, 0), (pad, pad)), dimension_numbers=dn,
        feature_group_count=c)
    return x


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 13,
         sigma: float = 1.5) -> jnp.ndarray:
    """SSIM map of two NHWC images; constants C1=0.01^2, C2=0.03^2."""
    mu1 = _depthwise_blur(img1, window_size, sigma)
    mu2 = _depthwise_blur(img2, window_size, sigma)

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2

    sigma1_sq = _depthwise_blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window_size, sigma) - mu1_mu2

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
