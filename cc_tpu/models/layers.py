"""Shared Flax building blocks with exact torch layer-geometry parity.

The reference nets use torch Conv2d/ConvTranspose2d with symmetric explicit
padding; torch's shapes differ from XLA 'SAME' padding for strided convs, so
every layer here uses explicit (lo, hi) padding. ConvTranspose2d is realized
as an input-dilated conv (lhs_dilation) with padding (k-1-p, k-1-p+op) —
bit-compatible with torch for any (k, s, p, output_padding) and importable
from torch checkpoints by a spatial flip + [I,O,kh,kw]->[kh,kw,I,O] transpose.

All modules are NHWC.
"""
from __future__ import annotations

import os
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier_uniform = nn.initializers.xavier_uniform()


def uniform01(key, shape, dtype=jnp.float32):
    """torch init.uniform default (0,1) — used by the flow nets' bias init
    (back2future.py:106-116, FlowNetC6.py:84-94)."""
    return jax.random.uniform(key, shape, dtype)


class _DotConv(nn.Conv):
    """nn.Conv with small-channel cases lowered to pixel matmuls.

    XLA's conv path is pathological for tiny-channel convs (the per-conv
    trace shows the iconv6 1x1 ci=17->16 at 0.3-0.9 TF/s across
    fwd/dgrad/wgrad, ~3 ms for a conv whose bandwidth bound is ~0.3 ms, and
    the fine-scale 3x3 convs at 0.4-8 TF/s). Two dot lowerings measured
    faster on v5e (scripts/exp_fine_convs.py):
      - 1x1 (any stride): dot_general over flattened pixels — 2.3x
        fwd+grads; full-step fp32 19.16 -> 20.76 f/s;
      - 3x3 stride-1 with ci,co <= cap: 9 tap-shifted pixel matmuls
        accumulated (no im2col materialization) — 19-29% fwd+grads at the
        fine shapes; full-step fp32 20.76 -> 22.78 f/s at cap 64. Isolated
        microbenches also favored taps at 128-256 channels, but the full
        step REGRESSED at cap 256 (19.9 f/s): in-step, the mid-channel
        convs sit in fused contexts the micro cannot reproduce — hence the
        measured-in-step, dtype-conditional caps below, not the
        micro-suggested ones.
    Parameter names/shapes are exactly nn.Conv's ('kernel' [kh,kw,ci,co],
    'bias' [co]) so checkpoints and torch import/export are unaffected."""

    # In-step-measured channel caps for the 3x3 tap lowering, per compute
    # dtype (the lowering itself is dtype-agnostic; only the crossover vs
    # XLA's conv path moves): fp32 r3 — 64 wins, 256 regresses, 128 measured
    # neutral-minus r5 (22.71 vs 22.77 f/s); bf16 r5 — 128 wins +1.0%
    # (26.02/26.08 vs 25.82 f/s, reproduced). CC_TPU_TAP_CAP overrides both
    # for A/B runs only.
    TAP_MAX_C = 64
    TAP_MAX_C_BF16 = 128

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        # the lowerings implement plain dense convs only — any dilation,
        # grouping, or anisotropic stride must fall through to nn.Conv
        # (silently ignoring them would be numerically wrong, not slow)
        def _pair(v):  # flax accepts None / int / sequence
            return ((1, 1) if v is None
                    else (v, v) if isinstance(v, int) else tuple(v))
        st = _pair(self.strides)  # nn.Conv's default is the int 1
        s = st[0]
        plain = (_pair(self.kernel_dilation) == (1, 1)
                 and _pair(self.input_dilation) == (1, 1)
                 and self.feature_group_count == 1
                 and st[0] == st[1]
                 # a kernel mask or a conv-primitive override would be
                 # silently dropped by the dot lowerings
                 and self.mask is None
                 and self.conv_general_dilated is None
                 and self.conv_general_dilated_cls is None)
        is_1x1 = (plain and tuple(k) == (1, 1)
                  and self.padding == ((0, 0), (0, 0)))
        env_cap = os.environ.get("CC_TPU_TAP_CAP")
        if env_cap:
            try:
                cap = int(env_cap)
            except ValueError:
                raise ValueError(
                    f"CC_TPU_TAP_CAP must be an integer channel cap, "
                    f"got {env_cap!r}") from None
        else:
            # Key the cap on the COMPUTE dtype promote_dtype will use
            # (module dtype when set, else the input's): in production
            # apply_net casts params+inputs together so x.dtype is the
            # compute dtype, but a module constructed with an explicit
            # dtype= must cap per that dtype, not per its input's.
            comp_dt = self.dtype or x.dtype
            cap = (self.TAP_MAX_C_BF16 if comp_dt == jnp.bfloat16
                   else self.TAP_MAX_C)
        is_tap = (plain and tuple(k) == (3, 3) and s == 1
                  and self.padding == ((1, 1), (1, 1))
                  and x.shape[-1] <= cap
                  and self.features <= cap)
        if not (is_1x1 or is_tap):
            return super().__call__(x)
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(k) + (x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        dot = lambda a, w2d: jax.lax.dot_general(
            a, w2d, (((3,), (0,)), ((), ())), precision=self.precision)
        if is_1x1:
            if s != 1:  # k=1, p=0: output (i,j) reads input (s*i, s*j)
                x = x[:, ::s, ::s, :]
            y = dot(x, kernel[0, 0])
        else:
            h, w = x.shape[1], x.shape[2]
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = None
            for dy in range(3):
                for dx in range(3):
                    t = dot(xp[:, dy:dy + h, dx:dx + w, :], kernel[dy, dx])
                    y = t if y is None else y + t
        if bias is not None:
            y = y + bias
        return y


class Conv(nn.Module):
    """torch nn.Conv2d parity: explicit symmetric padding (k-1)//2 by default."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    pad: int | None = None
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2 if self.pad is None else self.pad
        return _DotConv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            kernel_init=xavier_uniform,
            bias_init=self.bias_init,
            name="Conv_0",
        )(x)


def _tconv_phase_info(k: int, p: int):
    """Per-output-phase (a in {0,1}) tap selection for a stride-2
    ConvTranspose realized as a conv at INPUT resolution + depth-to-space.

    With pl = k-1-p (the dilated form's lo pad), output t = 2*tau + a reads
    input x[tau + mu + delta_a] against kernel tap u = 2*mu + r_a, where
    r_a = (pl - a) % 2 and delta_a = (a + r_a - pl) // 2. Returns
    (taps_per_phase, delta_per_phase, window_lo, window_size).
    """
    pl = k - 1 - p
    taps, deltas = [], []
    for a in (0, 1):
        r = (pl - a) % 2
        us = list(range(r, k, 2))
        taps.append(us)
        deltas.append((a + r - pl) // 2)
    lo = min(deltas)
    hi = max(d + len(t) - 1 for d, t in zip(deltas, taps))
    return taps, deltas, lo, hi - lo + 1


def _tconv_d2s(x, kernel, k: int, p: int, op: int):
    """Exact stride-2 ConvTranspose as one input-resolution conv with 4x
    output channels + pixel interleave. Same stored kernel layout as the
    dilated form; identical results (bit-identical on TPU for the model
    cases). Cuts the 75% zero-MACs the lhs-dilated lowering spends at
    output resolution (measured ~15% faster on the disp decoder chain)."""
    ci, co = kernel.shape[2], kernel.shape[3]
    taps, deltas, lo, win = _tconv_phase_info(k, p)
    filt = jnp.zeros((win, win, ci, co * 4), kernel.dtype)
    for a in (0, 1):
        for b in (0, 1):
            ph = 2 * a + b
            for i, u in enumerate(taps[a]):
                for j, v in enumerate(taps[b]):
                    filt = filt.at[deltas[a] + i - lo, deltas[b] + j - lo,
                                   :, ph * co:(ph + 1) * co].set(
                                       kernel[u, v])
    dn = jax.lax.conv_dimension_numbers(
        x.shape, filt.shape, ("NHWC", "HWIO", "NHWC"))
    pad = (-lo, win - 1 + lo)  # covers every phase's window incl. op's hi row
    y = jax.lax.conv_general_dilated(
        x, filt, (1, 1), (pad, pad), dimension_numbers=dn)
    b_, h, w, _ = y.shape
    y = y.reshape(b_, h, w, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b_, 2 * h, 2 * w, co)
    return y


class ConvTranspose(nn.Module):
    """torch nn.ConvTranspose2d parity.

    out_size = (in-1)*stride - 2*padding + kernel + output_padding.

    Two exact lowerings of the same stored kernel: the generic input-dilated
    conv (bit-compatible with torch for any (k, s, p, output_padding)), and
    for the model zoo's stride-2 cases (k=3,p=1,op=1 / k=4,p=1,op=0) a
    depth-to-space form — conv at input resolution with 4x output channels +
    pixel interleave — which avoids computing against the dilation zeros.
    """
    features: int
    kernel: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        kernel = self.param(
            "kernel", xavier_uniform, (k, k, x.shape[-1], self.features))
        # A/B on the full fwd+bwd (TPU v5e): dilated 125.5 ms, d2s 130.8 —
        # d2s wins forward-only but its weight-grad is worse, so dilated
        # stays the default; d2s remains selectable for inference-heavy use.
        use_d2s = (s == 2 and (k, p, op) in ((3, 1, 1), (4, 1, 0))
                   and os.environ.get("CC_TPU_TCONV", "dilated") == "d2s")
        if use_d2s:
            y = _tconv_d2s(x, kernel, k, p, op)
        else:
            pad = (k - 1 - p, k - 1 - p + op)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1), padding=(pad, pad),
                lhs_dilation=(s, s), dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias
        return y


class ConvReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.relu(Conv(self.features, self.kernel, self.stride)(x))


class ConvLeaky(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(
            Conv(self.features, self.kernel, self.stride)(x),
            negative_slope=self.slope)


class DownsampleConvBlock(nn.Module):
    """stride-2 conv + same-size conv, both ReLU (DispNetS.py:5-11)."""
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.features, self.kernel, 2)(x))
        return nn.relu(Conv(self.features, self.kernel, 1)(x))


class UpconvReLU(nn.Module):
    """ConvTranspose(k=3, s=2, p=1, op=1) + ReLU (DispNetS.py:28-32)."""
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.relu(ConvTranspose(self.features, 3, 2, 1, 1)(x))


class Upconv4ReLU(nn.Module):
    """ConvTranspose(k=4, s=2, p=1) + ReLU (MaskNet6.py:12-16)."""
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.relu(ConvTranspose(self.features, 4, 2, 1, 0)(x))


class BasicBlock(nn.Module):
    """ResNet BasicBlock, no BN in the residual path; BN only in the 1x1
    projection shortcut (DispResNet6.py:14-60)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        needs_proj = self.stride != 1 or x.shape[-1] != self.planes
        out = nn.relu(Conv(self.planes, 3, self.stride, use_bias=False)(x))
        out = Conv(self.planes, 3, 1, use_bias=False)(out)
        residual = x
        if needs_proj:
            residual = Conv(self.planes, 1, self.stride, use_bias=False,
                            pad=0)(x)
            residual = nn.BatchNorm(
                use_running_average=not training, momentum=0.9, epsilon=1e-5,
            )(residual)
        return nn.relu(out + residual)


class ResLayer(nn.Module):
    """Stack of BasicBlocks, first carries the stride (DispResNet6.py:45-60)."""
    planes: int
    blocks: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = BasicBlock(self.planes, self.stride)(x, training)
        for _ in range(1, self.blocks):
            x = BasicBlock(self.planes, 1)(x, training)
        return x


def crop_like(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Crop spatial dims of x down to ref's (DispNetS.py:35-37)."""
    assert x.shape[1] >= ref.shape[1] and x.shape[2] >= ref.shape[2]
    return x[:, : ref.shape[1], : ref.shape[2], :]


def cat(tensors: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate(tensors, axis=-1)
