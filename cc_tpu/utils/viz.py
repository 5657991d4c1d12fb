"""Visualization: colormapped scalar maps + Middlebury flow color wheel.

Parity: utils.py:8-53 (tensor2array with rainbow/magma/bone colormaps) and
flowutils/flowlib.py:189-226, 345-437 (flow_to_image). Host-side numpy;
arrays are NHWC (or HW / HW2).
"""
from __future__ import annotations

import numpy as np


def _opencv_rainbow_cmap(n: int = 1000) -> np.ndarray:
    """[n, 3] lookup approximating OpenCV's Rainbow (utils.py:19-29)."""
    stops = np.array([0.0, 0.4, 0.6, 0.8, 1.0])
    colors = np.array([
        (1.0, 0.0, 0.0), (1.0, 1.0, 0.0), (0.0, 1.0, 0.0),
        (0.0, 0.0, 1.0), (0.6, 0.0, 1.0)])
    x = np.linspace(0, 1, n)
    return np.stack([np.interp(x, stops, colors[:, c]) for c in range(3)],
                    axis=1)


def _matplotlib_cmap(name: str, n: int) -> np.ndarray:
    """[n, 3] LUT matching the reference's COLORMAPS table (utils.py:32-34):
    'bone' is the segment colormap resampled at n=10000; 'magma' goes
    through high_res_colormap (utils.py:8-16): the 256-entry listed LUT
    linearly re-interpolated to 1000 samples."""
    import matplotlib
    base = matplotlib.colormaps[name]
    if name == "magma":
        x = np.linspace(0, 1, base.N)
        low = base(x)
        new_x = np.linspace(0, 1, n)
        return np.stack([np.interp(new_x, x, low[:, i]) for i in range(3)],
                        axis=1)
    res = base.resampled(n)
    centers = (np.arange(n) + 0.5) / n  # exact bin k under trunc(x*n)
    return res(centers)[:, :3]


_CMAPS: dict = {}


def _get_cmap(name: str) -> np.ndarray:
    if name not in _CMAPS:
        if name == "rainbow":
            _CMAPS[name] = _opencv_rainbow_cmap()
        else:  # reference LUT sizes: bone 10000, magma 1000 (utils.py:32-34)
            _CMAPS[name] = _matplotlib_cmap(name,
                                            10000 if name == "bone" else 1000)
    return _CMAPS[name]


def scalar_to_rgb(array: np.ndarray, max_value=None,
                  colormap: str = "rainbow") -> np.ndarray:
    """HW scalar map -> HW3 float RGB via a colormap (tensor2array parity
    for 1-channel inputs; returns HWC rather than CHW).

    Indexing reproduces matplotlib Colormap.__call__ exactly (the
    reference applies its LUTs through it, utils.py:43): idx = trunc(x*N)
    in fp32, x*N == N lands in bin N-1, out-of-range maps to the
    first/last LUT row (the default under/over colors)."""
    array = np.asarray(array, np.float32)
    array = np.squeeze(array)
    if max_value is None:
        max_value = float(array.max()) or 1.0
    cmap = _get_cmap(colormap)
    n = len(cmap)
    xa = (array / max_value) * np.float32(n)
    xa = np.where(xa == n, n - 1, xa)
    idx = np.clip(xa.astype(np.int32), 0, n - 1)
    return cmap[idx].astype(np.float32)


def image_to_display(img: np.ndarray) -> np.ndarray:
    """(0.5,0.5)-normalized HWC image -> [0,1] RGB (tensor2array parity)."""
    return 0.5 + np.asarray(img, np.float32) * 0.5


def _make_color_wheel() -> np.ndarray:
    """Middlebury color wheel [55, 3] (flowlib.py:345-397)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    wheel = np.zeros((RY + YG + GC + CB + BM + MR, 3))
    col = 0
    wheel[:RY, 0] = 255
    wheel[:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


_WHEEL = _make_color_wheel()
_UNKNOWN_FLOW_THRESH = 1e7


def _make_logscale_wheel() -> np.ndarray:
    """[55, 3] wheel in [0, 1] built with exact arange fractions — the
    flow_viz variant (flow_viz.py:58-101) differs from the Middlebury wheel
    (_WHEEL) by floor rounding; parity requires its own construction."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    wheel = np.zeros((RY + YG + GC + CB + BM + MR, 3))
    col = 0
    wheel[:RY, 0] = 1
    wheel[:RY, 1] = np.arange(0, 1, 1. / RY)
    col += RY
    wheel[col:col + YG, 0] = np.arange(1, 0, -1. / YG)
    wheel[col:col + YG, 1] = 1
    col += YG
    wheel[col:col + GC, 1] = 1
    wheel[col:col + GC, 2] = np.arange(0, 1, 1. / GC)
    col += GC
    wheel[col:col + CB, 1] = np.arange(1, 0, -1. / CB)
    wheel[col:col + CB, 2] = 1
    col += CB
    wheel[col:col + BM, 2] = 1
    wheel[col:col + BM, 0] = np.arange(0, 1, 1. / BM)
    col += BM
    wheel[col:col + MR, 2] = np.arange(1, 0, -1. / MR)
    wheel[col:col + MR, 0] = 1
    return wheel


_LOG_WHEEL = _make_logscale_wheel()


def flow_to_image_logscale(flow: np.ndarray, scaledown: float = 6.0,
                           logscale: bool = True) -> np.ndarray:
    """Alternative log-scale flow colorization
    (parity: flowutils/flow_viz.py:12-55, computeFlowImage). HW2 -> HW3
    uint8, bit-exact with the reference."""
    flow = np.asarray(flow, np.float32)
    u, v = flow[..., 0], flow[..., 1]
    radius = np.sqrt(u ** 2 + v ** 2)
    if logscale:
        radius = np.log(radius + 1)
    radius = radius / scaledown
    rot = np.arctan2(-v, -u) / np.pi
    ncols = len(_LOG_WHEEL)
    fk = (rot + 1) / 2 * (ncols - 1)
    k0 = fk.astype(np.uint8)
    k1 = k0.astype(np.int32) + 1
    k1[k1 == ncols] = 0
    f = fk - k0

    img = np.zeros(u.shape + (3,))
    for c in range(3):
        col0 = _LOG_WHEEL[k0, c]
        col1 = _LOG_WHEEL[k1, c]
        col = (1 - f) * col0 + f * col1
        inside = radius <= 1
        col[inside] = 1 - radius[inside] * (1 - col[inside])
        col[~inside] *= 0.75
        img[..., c] = np.floor(255 * col).astype(np.uint8)
    return img.astype(np.uint8)


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """HW2 (or HW3 with validity) flow -> HW3 uint8 Middlebury colorization
    (flowlib.py:189-226 + compute_color 400-437)."""
    flow = np.asarray(flow, np.float32)
    u, v = flow[..., 0].copy(), flow[..., 1].copy()

    idx_unknown = (np.abs(u) > _UNKNOWN_FLOW_THRESH) | (
        np.abs(v) > _UNKNOWN_FLOW_THRESH)
    u[idx_unknown] = 0
    v[idx_unknown] = 0

    rad = np.sqrt(u ** 2 + v ** 2)
    # the same expression as flowlib.py:214-219 (float64 eps) so numpy's
    # promotion — and therefore every downstream floor() — matches exactly
    maxrad = max(-1, np.max(rad))
    u = u / (maxrad + np.finfo(float).eps)
    v = v / (maxrad + np.finfo(float).eps)

    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    ncols = len(_WHEEL)
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    img = np.zeros(u.shape + (3,), np.uint8)
    for c in range(3):
        col0 = _WHEEL[k0, c] / 255.0
        col1 = _WHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        inside = rad <= 1
        col[inside] = 1 - rad[inside] * (1 - col[inside])
        col[~inside] *= 0.75
        img[..., c] = np.uint8(np.floor(255 * col * (~idx_unknown)))
    return img
