"""FlowNetC6 optical flow network (2-frame, classic FlowNetC).

Parity: models/FlowNetC6.py:32-164 + models/submodules.py:5-39. Shared
3-conv stem over both frames, 21x21 dilation-2 correlation (441 channels,
LeakyReLU 0.1), conv_redir 32ch concat -> 473, deep encoder, deconv decoder
with per-level 2-ch flow heads and learned flow upsampling (ConvTranspose
k=4 s=2 p=1). full_res=True multiplies div_flow=20 and bilinearly upsamples
2x. Training returns 6 flows finest-first; eval returns the finest.
"""
from __future__ import annotations

import flax.linen as nn

from cc_tpu.models.layers import Conv, ConvTranspose, cat, uniform01
from cc_tpu.ops.correlation import correlation
from cc_tpu.ops.image import upsample2x_bilinear


class _ConvL(nn.Module):
    """submodules.conv (no-BN variant): conv + LeakyReLU(0.1)."""
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(
            Conv(self.features, self.kernel, self.stride,
                 bias_init=uniform01)(x), 0.1)


class _Deconv(nn.Module):
    """submodules.deconv: ConvTranspose(4,2,1) + LeakyReLU(0.1)."""
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(
            ConvTranspose(self.features, 4, 2, 1, 0,
                          bias_init=uniform01)(x), 0.1)


class _PredictFlow(nn.Module):
    @nn.compact
    def __call__(self, x):
        return Conv(2, 3, 1, bias_init=uniform01)(x)


class _UpFlow(nn.Module):
    @nn.compact
    def __call__(self, x):
        return ConvTranspose(2, 4, 2, 1, 0, bias_init=uniform01)(x)


class FlowNetC6(nn.Module):
    nlevels: int = 5  # unused; kept for constructor parity (FlowNetC6.py:33)
    div_flow: float = 20.0
    full_res: bool = True

    @nn.compact
    def __call__(self, x1, x2, training: bool = False):
        stem1 = _ConvL(64, 7, 2, name="conv1")
        stem2 = _ConvL(128, 5, 2, name="conv2")
        stem3 = _ConvL(256, 5, 2, name="conv3")

        a1 = stem1(x1); a2 = stem2(a1); a3 = stem3(a2)
        b1 = stem1(x2); b2 = stem2(b1); b3 = stem3(b2)

        corr = correlation(a3, b3, 21, dilation=2)
        corr = nn.leaky_relu(corr, 0.1)
        redir = _ConvL(32, 1, 1, name="conv_redir")(a3)
        x = cat([redir, corr])

        c3_1 = _ConvL(256, name="conv3_1")(x)
        c4 = _ConvL(512, name="conv4_1")(_ConvL(512, 3, 2, name="conv4")(c3_1))
        c5 = _ConvL(512, name="conv5_1")(_ConvL(512, 3, 2, name="conv5")(c4))
        c6 = _ConvL(1024, name="conv6_1")(_ConvL(1024, 3, 2, name="conv6")(c5))

        flow6 = _PredictFlow(name="predict_flow6")(c6)
        d5 = _Deconv(512, name="deconv5")(c6)
        concat5 = cat([c5, d5, _UpFlow(name="up6to5")(flow6)])

        flow5 = _PredictFlow(name="predict_flow5")(concat5)
        d4 = _Deconv(256, name="deconv4")(concat5)
        concat4 = cat([c4, d4, _UpFlow(name="up5to4")(flow5)])

        flow4 = _PredictFlow(name="predict_flow4")(concat4)
        d3 = _Deconv(128, name="deconv3")(concat4)
        concat3 = cat([c3_1, d3, _UpFlow(name="up4to3")(flow4)])

        flow3 = _PredictFlow(name="predict_flow3")(concat3)
        d2 = _Deconv(64, name="deconv2")(concat3)
        concat2 = cat([a2, d2, _UpFlow(name="up3to2")(flow3)])

        flow2 = _PredictFlow(name="predict_flow2")(concat2)
        d1 = _Deconv(32, name="deconv1")(concat2)
        concat1 = cat([a1, d1, _UpFlow(name="up2to1")(flow2)])

        flow1 = _PredictFlow(name="predict_flow1")(concat1)

        flows = [flow1, flow2, flow3, flow4, flow5, flow6]
        if self.full_res:
            flows = [self.div_flow * upsample2x_bilinear(f) for f in flows]
        return tuple(flows) if training else flows[0]
