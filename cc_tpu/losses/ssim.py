"""SSIM map with a Gaussian window (parity: /root/reference/ssim.py).

Returns the SSIM *map* (not its mean), like the reference's functional `ssim`
(window 13, sigma 1.5, zero 'same' padding, depthwise convolution).

TPU note (round-2 perf pass): a depthwise conv with C=3 uses 3 of the VPU's
128 lanes (~2% utilization) and the CC loss stack runs ~200 Gaussian-blur
passes per step. The separable blur is instead applied as two banded-matrix
einsums over H and W — these hit the MXU at full tile utilization and are
mathematically identical to the zero-'same'-padded depthwise convolution
(row o of the matrix holds g[i-o+pad] for |i-o| <= pad, zeros elsewhere, so
edge rows truncate exactly like zero padding).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


@lru_cache(maxsize=None)
def _blur_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """Banded [n, n] matrix equal to a zero-'same'-padded 1-D conv with the
    Gaussian kernel."""
    g = _gaussian_1d(window_size, sigma)
    pad = window_size // 2
    m = np.zeros((n, n), dtype=np.float32)
    for o in range(n):
        lo = max(0, o - pad)
        hi = min(n, o + pad + 1)
        m[o, lo:hi] = g[lo - o + pad:hi - o + pad]
    return m


def _depthwise_blur(x: jnp.ndarray, window_size: int, sigma: float
                    ) -> jnp.ndarray:
    """Separable Gaussian with zero 'same' padding, NHWC, via MXU einsums
    (applied through ops.image's shared separable-matrix machinery)."""
    from cc_tpu.ops.image import _apply_separable
    return _apply_separable(x, _blur_matrix(x.shape[1], window_size, sigma),
                            _blur_matrix(x.shape[2], window_size, sigma))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 13,
         sigma: float = 1.5) -> jnp.ndarray:
    """SSIM map of two NHWC images; constants C1=0.01^2, C2=0.03^2."""
    c = img1.shape[-1]
    # one fused blur over the 5 filtered quantities (stacked on channels)
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1)
    blurred = _depthwise_blur(stacked, window_size, sigma)
    mu1 = blurred[..., 0 * c:1 * c]
    mu2 = blurred[..., 1 * c:2 * c]

    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2

    sigma1_sq = blurred[..., 2 * c:3 * c] - mu1_sq
    sigma2_sq = blurred[..., 3 * c:4 * c] - mu2_sq
    sigma12 = blurred[..., 4 * c:5 * c] - mu1_mu2

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
