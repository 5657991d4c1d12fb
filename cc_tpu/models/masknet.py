"""Motion-segmentation / explainability networks M: MaskNet6 / MaskResNet6.

6-level stride-2 encoder over the channel-stacked (target + refs) input,
6-level transpose-conv decoder with pre-deconv skip concats, sigmoid mask
head per level. Training returns (mask1..mask6) finest-first at resolutions
(1, /2, /4, /8, /16, /32); eval returns mask1. Masks are [B,h,w,nref].

Parity: models/MaskNet6.py:19-123, models/MaskResNet6.py:69-160.
"""
from __future__ import annotations

import flax.linen as nn

from cc_tpu.models.layers import Conv, ConvReLU, ResLayer, Upconv4ReLU, cat


class MaskNet(nn.Module):
    nb_ref_imgs: int = 4
    output_exp: bool = True
    resnet_encoder: bool = False

    @nn.compact
    def __call__(self, tgt, refs, training: bool = False):
        assert len(refs) == self.nb_ref_imgs
        x = cat([tgt] + list(refs))

        planes = (16, 32, 64, 128, 256, 256)
        feats = []
        h = x
        for lvl, p in enumerate(planes):
            if lvl == 0:
                h = ConvReLU(p, 7, 2)(h)
            elif self.resnet_encoder:
                h = ResLayer(p, 2, 2)(h, training)
            else:
                kernel = 5 if lvl == 1 else 3
                h = ConvReLU(p, kernel, 2)(h)
            feats.append(h)

        if not self.output_exp:
            none6 = (None,) * 6
            return none6 if training else None

        up_planes = (256, 256, 128, 64, 32, 16)
        ups = []
        h = feats[5]
        for i, p in enumerate(up_planes):
            inp = h if i == 0 else cat([ups[-1], feats[5 - i]])
            ups.append(Upconv4ReLU(p)(inp))

        def head(y):
            return nn.sigmoid(Conv(self.nb_ref_imgs, 3, 1)(y))

        # ups[0] is deconv6 output (/32) ... ups[5] is deconv1 output (full)
        masks = tuple(head(u) for u in reversed(ups))  # finest-first
        return masks if training else masks[0]


def MaskNet6(**kw):
    """models/MaskNet6.py — plain conv encoder (paper-default M)."""
    return MaskNet(resnet_encoder=False, **kw)


def MaskResNet6(**kw):
    """models/MaskResNet6.py — ResNet encoder (conv1 plain, conv2-6
    2-block ResLayers)."""
    return MaskNet(resnet_encoder=True, **kw)
