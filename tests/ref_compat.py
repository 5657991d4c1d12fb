"""Optional parity harness against the reference implementation.

If /root/reference exists (and torch-cpu is installed), parity tests import
the reference's pure-Python modules and compare numerics. The reference was
written for torch<=1.2 where F.grid_sample defaulted to align_corners=True;
modern torch defaults to False, so we pin the paper-era default before the
reference modules capture the symbol.

This module never copies reference code — it imports it read-only, purely as
a test oracle. All tests using it are skipped when the reference is absent.
"""
from __future__ import annotations

import os
import sys

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    if not os.path.isdir(REFERENCE_PATH):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


_patched = False


def load_reference():
    """Import reference modules with paper-era torch defaults pinned."""
    global _patched
    import torch.nn.functional as F

    if not _patched:
        orig_grid_sample = F.grid_sample

        def grid_sample_ac_true(input, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=None):
            if align_corners is None:
                align_corners = True
            return orig_grid_sample(input, grid, mode=mode,
                                    padding_mode=padding_mode,
                                    align_corners=align_corners)

        F.grid_sample = grid_sample_ac_true
        _patched = True

    _install_correlation_shim()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import inverse_warp as ref_inverse_warp  # noqa: F401
    import loss_functions as ref_loss_functions  # noqa: F401
    import ssim as ref_ssim  # noqa: F401

    return ref_inverse_warp, ref_loss_functions, ref_ssim


def _install_correlation_shim():
    """The reference's flow nets import the native-CUDA
    `spatial_correlation_sampler` package (absent here). Provide a pure-torch
    CPU equivalent (kernel_size=1, stride=1 semantics: channel-summed local
    correlation, [b, ph, pw, h, w] output) so they can serve as test oracles.
    """
    import sys
    import types

    if "spatial_correlation_sampler" in sys.modules:
        return
    import torch
    import torch.nn.functional as F

    def spatial_correlation_sample(input1, input2, kernel_size=1,
                                   patch_size=9, stride=1, padding=0,
                                   dilation_patch=1):
        assert kernel_size == 1 and stride == 1 and padding == 0
        b, c, h, w = input1.shape
        r = (patch_size // 2) * dilation_patch
        pad2 = F.pad(input2, (r, r, r, r))
        out = input1.new_zeros(b, patch_size, patch_size, h, w)
        for pi in range(patch_size):
            for pj in range(patch_size):
                oy, ox = pi * dilation_patch, pj * dilation_patch
                out[:, pi, pj] = (
                    input1 * pad2[:, :, oy:oy + h, ox:ox + w]).sum(1)
        return out

    mod = types.ModuleType("spatial_correlation_sampler")
    mod.spatial_correlation_sample = spatial_correlation_sample
    sys.modules["spatial_correlation_sampler"] = mod


def to_torch_nchw(x):
    """numpy NHWC -> torch NCHW (images/flows); passthrough for matrices."""
    import numpy as np
    import torch

    x = np.asarray(x)
    if x.ndim == 4:
        return torch.from_numpy(np.ascontiguousarray(
            np.transpose(x, (0, 3, 1, 2))))
    return torch.from_numpy(np.ascontiguousarray(x))


def from_torch_nchw(t):
    """torch NCHW -> numpy NHWC."""
    import numpy as np

    x = t.detach().cpu().numpy()
    if x.ndim == 4:
        return np.transpose(x, (0, 2, 3, 1))
    return x
