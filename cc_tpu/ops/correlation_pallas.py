"""Pallas TPU kernel for the local correlation cost volume.

Replaces the reference's only native-CUDA op (spatial-correlation-sampler,
back2future.py:15-25 / FlowNetC6.py:18-30) with a VMEM-resident kernel:
each (batch, row-tile) program holds an f1 tile and the haloed f2 window in
VMEM and emits all P*P displacement channels — HBM traffic is ~2 reads +
1 write instead of P*P shifted reads.

Grid: (B, H/TH). f2 arrives pre-padded by r = (P//2)*dilation on both
spatial axes; its row block is element-indexed (pl.Element) so consecutive
programs read overlapping halo windows.

Backward passes are expressed in XLA (shifted windows) via custom_vjp — they
run inside the same fused autodiff program and XLA fuses the elementwise
work; a Pallas backward can slot in later if profiling demands it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lanes(n: int) -> int:
    return -(-n // 128) * 128


def _pick_row_tile(h: int, w: int, c: int, patch: int, dilation: int,
                   bytes_per_el: int = 4, vmem_budget: int = 10 * 2 ** 20
                   ) -> int:
    """Largest divisor row-tile of H that fits f1 + f2 halo + out + one
    displacement-row of live slices in VMEM (lane-padded accounting)."""
    r = (patch // 2) * dilation
    cl = _lanes(c)
    for th in [t for t in (h, 64, 32, 16, 8, 4, 2, 1) if h % t == 0]:
        f1 = th * w * cl
        f2 = (th + 2 * r) * _lanes(w + 2 * r) * cl
        out = th * w * _lanes(patch * patch)
        live = patch * (th * w * cl + th * w * 128)
        if (f1 + f2 + out + live) * bytes_per_el <= vmem_budget:
            return th
    return 1


def _corr_kernel(f1_ref, f2_ref, out_ref, *, patch: int, dilation: int,
                 inv_c: float):
    th, w = f1_ref.shape[1], f1_ref.shape[2]
    f1 = f1_ref[0]
    # One displacement ROW (patch channels) per store: keeps live slice
    # count at `patch` (a full P*P stack OOMs VMEM from lane padding), while
    # avoiding per-channel minor-dim stores.
    for pi in range(patch):
        oy = pi * dilation
        vals = []
        for pj in range(patch):
            ox = pj * dilation
            shifted = f2_ref[0, oy:oy + th, ox:ox + w, :]
            vals.append(jnp.sum(f1 * shifted, axis=-1) * inv_c)
        out_ref[0, :, :, pi * patch:(pi + 1) * patch] = jnp.stack(
            vals, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas(f1: jnp.ndarray, f2: jnp.ndarray, patch_size: int,
                       dilation: int = 1) -> jnp.ndarray:
    """[B,H,W,C] x2 -> [B,H,W,P*P]; semantics of ops.correlation."""
    return _forward(f1, f2, patch_size, dilation)


# Set True (tests) to run the kernel in the Pallas interpreter on CPU.
INTERPRET = False


def _forward(f1, f2, patch_size, dilation):
    b, h, w, c = f1.shape
    r = (patch_size // 2) * dilation
    f2p = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    th = _pick_row_tile(h, w, c, patch_size, dilation)

    kernel = functools.partial(_corr_kernel, patch=patch_size,
                               dilation=dilation, inv_c=1.0 / c)
    grid = (b, h // th)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            # overlapping halo windows -> element-indexed block (Mosaic
            # requires all dims Element if any is)
            pl.BlockSpec((pl.Element(1), pl.Element(th + 2 * r),
                          pl.Element(w + 2 * r), pl.Element(c)),
                         lambda bi, i: (bi, i * th, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, patch_size * patch_size),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, patch_size * patch_size),
                                       f1.dtype),
        interpret=INTERPRET,
    )(f1, f2p)


def _corr_fwd(f1, f2, patch_size, dilation):
    return _forward(f1, f2, patch_size, dilation), (f1, f2)


def _corr_bwd(patch_size, dilation, residuals, g):
    """XLA backward (gather-only, no scatters):
      df1[p,c] = (1/C) sum_d g[p,d] f2[p + dvec(d), c]
      df2[q,c] = (1/C) sum_d g[q - dvec(d), d] f1[q - dvec(d), c]
    with dvec(d) = (pi*dil - r, pj*dil - r). Padding g and f1 by r turns the
    transpose into shifted windows too.
    """
    f1, f2 = residuals
    b, h, w, c = f1.shape
    r = (patch_size // 2) * dilation
    inv_c = 1.0 / c
    f2p = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    f1p = jnp.pad(f1, ((0, 0), (r, r), (r, r), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (r, r), (r, r), (0, 0)))

    df1 = jnp.zeros_like(f1)
    df2 = jnp.zeros_like(f2)
    for pi in range(patch_size):
        for pj in range(patch_size):
            oy, ox = pi * dilation, pj * dilation
            ch = pi * patch_size + pj
            df1 = df1 + (g[..., ch:ch + 1]
                         * f2p[:, oy:oy + h, ox:ox + w, :]) * inv_c
            iy, ix = 2 * r - oy, 2 * r - ox
            df2 = df2 + (gp[:, iy:iy + h, ix:ix + w, ch:ch + 1]
                         * f1p[:, iy:iy + h, ix:ix + w, :]) * inv_c
    return df1, df2


correlation_pallas.defvjp(_corr_fwd, _corr_bwd)
