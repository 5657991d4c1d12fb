"""Disparity networks D: DispNetS / DispNetS6 / DispResNet6 / DispResNetS6.

One parameterized encoder-decoder covers the whole reference family
(models/DispNetS.py, DispNetS6.py, DispResNet6.py, DispResNetS6.py):
7-level encoder (plain double-conv or ResNet BasicBlocks), transpose-conv
decoder with skip concats, sigmoid disparity heads `alpha*sig + beta` at the
finest `num_scales` levels, coarse-disp feedback concat at the 3 finest
levels. Training returns (disp1..dispN) finest-first; eval returns disp1.

Outputs are NHWC [B,h,w,1].
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cc_tpu.models.layers import (
    Conv, ConvReLU, DownsampleConvBlock, ResLayer, UpconvReLU, cat, crop_like,
)
from cc_tpu.ops.image import upsample2x_bilinear

ENC_PLANES = (32, 64, 128, 256, 512, 512, 512)
DEC_PLANES = (512, 512, 256, 128, 64, 32, 16)


class PredictDisp(nn.Module):
    alpha: float = 10.0
    beta: float = 0.01

    @nn.compact
    def __call__(self, x):
        return self.alpha * nn.sigmoid(Conv(1, 3, 1)(x)) + self.beta


class _IconvPlain(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, training=False):
        return ConvReLU(self.features, 3, 1)(x)


class _IconvRes(nn.Module):
    features: int
    blocks: int = 1

    @nn.compact
    def __call__(self, x, training=False):
        return ResLayer(self.features, self.blocks, 1)(x, training)


class DispNet(nn.Module):
    """Parameterized disparity net; see module docstring for variant map."""
    alpha: float = 10.0
    beta: float = 0.01
    num_scales: int = 6
    resnet_encoder: bool = False
    # BasicBlocks per encoder level conv2..conv7 (resnet variants only)
    enc_blocks: tuple = (2, 2, 2, 2, 2, 2)
    # BasicBlocks per decoder iconv7..iconv1 (resnet variants only)
    dec_blocks: tuple = (1, 1, 1, 1, 1, 1, 1)

    @nn.compact
    def __call__(self, x, training: bool = False):
        # --- encoder ---
        feats = []
        h = x
        for lvl, planes in enumerate(ENC_PLANES):
            if lvl == 0:
                h = DownsampleConvBlock(planes, kernel=7)(h)
            elif self.resnet_encoder:
                h = ResLayer(planes, self.enc_blocks[lvl - 1], 2)(h, training)
            else:
                kernel = 5 if lvl == 1 else 3
                h = DownsampleConvBlock(planes, kernel=kernel)(h)
            feats.append(h)

        def iconv(i, features, inp):
            if self.resnet_encoder:
                return _IconvRes(features, self.dec_blocks[i])(inp, training)
            return _IconvPlain(features)(inp)

        # --- decoder ---
        disps = {}  # level (1=finest) -> disp
        h = feats[6]
        prev_disp = None
        for i, dec_planes in enumerate(DEC_PLANES):
            level = 7 - i  # decoder level: 7 (coarsest) .. 1 (finest)
            skip = feats[level - 2] if level >= 2 else x
            up = crop_like(UpconvReLU(dec_planes)(h), skip)
            pieces = [up]
            if level >= 2:
                pieces.append(skip)
            if prev_disp is not None and level <= 3:
                disp_up = crop_like(upsample2x_bilinear(prev_disp), skip)
                pieces.append(disp_up)
            h = iconv(i, dec_planes, cat(pieces))
            if level <= max(self.num_scales, 4):
                d = PredictDisp(self.alpha, self.beta)(h)
                if level <= self.num_scales:
                    disps[level] = d
                prev_disp = d
        out = tuple(disps[lvl] for lvl in range(1, self.num_scales + 1))
        return out if training else out[0]


def DispNetS(**kw):
    """models/DispNetS.py:40-133 — plain encoder, 4 scales."""
    return DispNet(num_scales=4, resnet_encoder=False, **kw)


def DispNetS6(**kw):
    """models/DispNetS6.py — plain encoder, 6 scales."""
    return DispNet(num_scales=6, resnet_encoder=False, **kw)


def DispResNet6(**kw):
    """models/DispResNet6.py:97-194 — ResNet encoder (2 blocks), 6 scales.
    The paper-default D network."""
    return DispNet(num_scales=6, resnet_encoder=True, **kw)


def DispResNetS6(**kw):
    """models/DispResNetS6.py — deeper: 3-block encoder at conv4-conv7,
    2-block decoder at iconv7-iconv4 (diff vs DispResNet6 at lines 109-126)."""
    return DispNet(num_scales=6, resnet_encoder=True,
                   enc_blocks=(2, 2, 3, 3, 3, 3),
                   dec_blocks=(2, 2, 2, 2, 1, 1, 1), **kw)
