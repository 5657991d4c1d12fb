"""Image resampling ops with exact torch-parity semantics, NHWC.

The reference leans on three torch resamplers whose exact numerics leak into
losses and eval metrics (SURVEY.md §7 hard-part 3):

- nn.functional.adaptive_avg_pool2d  (loss_functions.py:36-37, 89-90, ...)
- nn.functional.upsample(mode='bilinear')  with align_corners=False
  (torch>=1.0 default; models + flow metrics)
- nn.functional.upsample default 'nearest'  (back2future.py:267-271)

All are implemented as separable row/col weight matrices precomputed in
Python (shapes are static under jit) and applied as two einsums — these hit
the MXU rather than scalar gather loops, and are exact.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Row-pooling matrix [n_out, n_in] with torch adaptive_avg_pool semantics:
    bin i averages input[start:end), start = floor(i*In/Out),
    end = ceil((i+1)*In/Out)."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -((-(i + 1) * n_in) // n_out)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


@lru_cache(maxsize=None)
def _bilinear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Row interpolation matrix [n_out, n_in] matching torch bilinear resize."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    for i in range(n_out):
        if align_corners:
            x = i * (n_in - 1) / max(n_out - 1, 1)
        else:
            x = (i + 0.5) * n_in / n_out - 0.5
            x = min(max(x, 0.0), n_in - 1.0)
        x0 = int(math.floor(x))
        x1 = min(x0 + 1, n_in - 1)
        w1 = x - x0
        m[i, x0] += 1.0 - w1
        m[i, x1] += w1
    return m


def _apply_separable(img: jnp.ndarray, row_m: np.ndarray,
                     col_m: np.ndarray) -> jnp.ndarray:
    """Apply row/col resampling matrices to [B, H, W, C] (or [B, H, W])."""
    rm = jnp.asarray(row_m, dtype=img.dtype)
    cm = jnp.asarray(col_m, dtype=img.dtype)
    if img.ndim == 3:
        out = jnp.einsum("oh,bhw->bow", rm, img)
        return jnp.einsum("pw,bow->bop", cm, out)
    out = jnp.einsum("oh,bhwc->bowc", rm, img)
    return jnp.einsum("pw,bowc->bopc", cm, out)


def _box_mean(img: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """Mean over non-overlapping kh x kw blocks of [B,H,W(,C)]."""
    b, h, w = img.shape[:3]
    if img.ndim == 3:
        return img.reshape(b, h // kh, kh, w // kw, kw).mean(axis=(2, 4))
    return img.reshape(b, h // kh, kh, w // kw, kw, img.shape[-1]).mean(
        axis=(2, 4))


def adaptive_avg_pool(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch adaptive_avg_pool2d for NHWC (exact, incl. non-divisible sizes)."""
    h, w = img.shape[1], img.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img
    if h % oh == 0 and w % ow == 0:
        # Divisible fast path (every pyramid level at 832x256): box mean.
        # Pool by REPEATED HALVING while both factors are even — means of
        # equal-size means are the exact block mean (within fp rounding),
        # and each halving stage emits the same subgraph as the coarser
        # pyramid levels' first stages, so XLA CSE shares the whole pooling
        # pyramid across the loss stack instead of re-reading the full-res
        # image once per scale (profiled 10.4 -> ~2 ms/step).
        kh, kw = h // oh, w // ow
        while kh % 2 == 0 and kw % 2 == 0 and (kh, kw) != (1, 1):
            img = _box_mean(img, 2, 2)
            kh, kw = kh // 2, kw // 2
        if (kh, kw) != (1, 1):
            img = _box_mean(img, kh, kw)
        return img
    return _apply_separable(img, _adaptive_pool_matrix(h, oh),
                            _adaptive_pool_matrix(w, ow))


def resize_bilinear(img: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear') for NHWC (no antialiasing)."""
    h, w = img.shape[1], img.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img
    return _apply_separable(img, _bilinear_matrix(h, oh, align_corners),
                            _bilinear_matrix(w, ow, align_corners))


def upsample2x_bilinear(img: jnp.ndarray,
                        align_corners: bool = False) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2, mode='bilinear') parity."""
    return resize_bilinear(img, (img.shape[1] * 2, img.shape[2] * 2),
                           align_corners=align_corners)


def upsample_nearest(img: jnp.ndarray, scale: int) -> jnp.ndarray:
    """F.upsample(scale_factor=k) default-nearest parity for NHWC."""
    out = jnp.repeat(img, scale, axis=1)
    return jnp.repeat(out, scale, axis=2)
