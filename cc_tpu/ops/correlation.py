"""Local correlation cost volume (the reference's only native-CUDA op).

Replaces the `spatial-correlation-sampler` C++/CUDA extension invoked from
back2future.py:15-25 (kernel 1, patch 9, stride 1) and FlowNetC6.py:18-30
(kernel 1, patch 21, dilation_patch 2).

Semantics (kernel_size=1, stride=1, zero padding of the displaced map):

  out[b, h, w, pi*P + pj] = mean_c f1[b, h, w, c] * f2[b, h+dy, w+dx, c]
  with dy = (pi - P//2) * dilation, dx = (pj - P//2) * dilation,
  out-of-bounds f2 taps read as 0.

Two implementations behind one API:
- XLA path (default, works on any backend): statically-unrolled shifted
  windows of a zero-padded f2; XLA fuses the P*P multiplies+channel
  reductions into a small number of kernels.
- Pallas TPU kernel (cc_tpu.ops.correlation_pallas): keeps an f1 tile and the
  haloed f2 window resident in VMEM so HBM traffic is ~2 reads + 1 write
  instead of P*P reads. Enabled via use_pallas=True or CC_TPU_PALLAS_CORR=1.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def correlation_xla(f1: jnp.ndarray, f2: jnp.ndarray, patch_size: int,
                    dilation: int = 1) -> jnp.ndarray:
    """Reference XLA implementation; inputs [B,H,W,C] -> [B,H,W,P*P]."""
    b, h, w, c = f1.shape
    r = (patch_size // 2) * dilation
    f2p = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    inv_c = 1.0 / c
    outs = []
    for pi in range(patch_size):
        for pj in range(patch_size):
            oy = pi * dilation
            ox = pj * dilation
            shifted = f2p[:, oy:oy + h, ox:ox + w, :]
            outs.append(jnp.sum(f1 * shifted, axis=-1) * inv_c)
    return jnp.stack(outs, axis=-1)


def correlation(f1: jnp.ndarray, f2: jnp.ndarray, patch_size: int,
                dilation: int = 1, use_pallas: bool | None = None
                ) -> jnp.ndarray:
    """Local correlation of f1 against displaced f2 (see module docstring)."""
    if use_pallas is None:
        use_pallas = os.environ.get("CC_TPU_PALLAS_CORR", "0") == "1"
    if use_pallas:
        from cc_tpu.ops.correlation_pallas import correlation_pallas
        return correlation_pallas(f1, f2, patch_size, dilation)
    return correlation_xla(f1, f2, patch_size, dilation)


def b2f_channel_permutations(patch_size: int = 9) -> tuple[np.ndarray, np.ndarray]:
    """Back2Future's fwd/bwd correlation channel reorders as static permutations.

    Parity with the idx_fwd/idx_bwd LongTensors built at back2future.py:56-59
    (there constructed on .cuda(); here plain numpy applied as a static take).
    fwd: transpose + flip both axes of the (pi, pj) displacement grid;
    bwd: transpose only.
    """
    n = patch_size * patch_size
    idx = np.array(
        [list(range(k, -1, -patch_size)) for k in range(n - 1, n - 1 - patch_size, -1)]
    ).flatten()
    return idx, idx[::-1].copy()
