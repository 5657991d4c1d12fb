"""Back2Future optical flow network F (3-frame, occlusion-aware).

Parity: models/back2future.py:51-321. Takes (I_0, [I_-, I_+]) where inputs
are (0.5, 0.5)-normalized images; internally re-normalizes to ImageNet
stats. Six-level feature pyramids per frame, 9x9 local correlation (the
reference's native-CUDA op — here cc_tpu.ops.correlation), channel-reordered
by static permutations, coarse-to-fine fwd/bwd decoders with feature
warping, softmax occlusion decoders.

Training returns (flows_fwd, flows_bwd, occs) as 6-level pyramids at
resolutions (1/1, 1/2, 1/4, 1/8, 1/16, 1/32) scaled by (20, 10, 5, 2.5,
1.25, 0.625) — note the reference's "*_fullres" names are misnomers: each
level's output is its `_up` tensor upsampled exactly once more
(back2future.py:255-281), so the pyramid matches the depth/mask pyramids.
Eval returns the finest (true full-res) triple. Flows NHWC [B,h,w,2].
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cc_tpu.geometry.sampling import flow_warp
from cc_tpu.models.layers import Conv, cat, uniform01
from cc_tpu.ops.correlation import b2f_channel_permutations, correlation
from cc_tpu.ops.image import upsample2x_bilinear, upsample_nearest

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _renormalize(im):
    """(0.5,0.5)-normalized -> ImageNet-normalized (back2future.py:118-132).

    Constants are cast to the input dtype: fp32 numpy constants would
    otherwise promote the whole net to fp32 under compute_dtype=bfloat16
    (jnp type promotion is silent — this cost a 2x flow-net slowdown once).
    """
    im = im * jnp.asarray(0.5, im.dtype) + jnp.asarray(0.5, im.dtype)
    return ((im - _IMAGENET_MEAN.astype(im.dtype))
            / _IMAGENET_STD.astype(im.dtype))


class FeatBlock(nn.Module):
    """stride-2 conv + conv, LeakyReLU(0.2) (back2future.py:27-33)."""
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.leaky_relu(Conv(self.features, 3, 2,
                               bias_init=uniform01)(x), 0.2)
        return nn.leaky_relu(Conv(self.features, 3, 1,
                                  bias_init=uniform01)(x), 0.2)


class DecBlock(nn.Module):
    """128-128-96-64-32 LeakyReLU(0.2) convs + linear 2-ch head
    (back2future.py:35-48)."""
    out_features: int = 2

    @nn.compact
    def __call__(self, x):
        for f in (128, 128, 96, 64, 32):
            x = nn.leaky_relu(Conv(f, 3, 1, bias_init=uniform01)(x), 0.2)
        return Conv(self.out_features, 3, 1, bias_init=uniform01)(x)


class Back2Future(nn.Module):
    nlevels: int = 6

    @nn.compact
    def __call__(self, im_tar, im_refs, training: bool = False):
        """im_tar = I_0; im_refs = [I_-, I_+]."""
        idx_fwd, idx_bwd = b2f_channel_permutations(9)
        ima = _renormalize(im_tar)       # I_0   -> stream a
        imc = _renormalize(im_refs[0])   # I_-   -> stream c
        imb = _renormalize(im_refs[1])   # I_+   -> stream b

        widths = (16, 32, 64, 96, 128, 192)

        def pyramid(x, name):
            feats = []
            for lvl, f in enumerate(widths):
                x = FeatBlock(f, name=f"conv{lvl + 1}{name}")(x)
                feats.append(x)
            return feats  # feats[k] at 1/2^(k+1) resolution

        fa = pyramid(ima, "a")
        fb = pyramid(imb, "b")
        fc = pyramid(imc, "c")

        def corr_pair(f_tgt, f_fwd, f_bwd):
            c_fwd = correlation(f_tgt, f_fwd, 9)[..., idx_fwd]
            c_bwd = correlation(f_tgt, f_bwd, 9)[..., idx_bwd]
            return cat([c_fwd, c_bwd])

        def softmax2d(x):
            return nn.softmax(x, axis=-1)

        # ---- level 6 (coarsest, 1/64) ----
        corr6 = corr_pair(fa[5], fb[5], fc[5])
        flow6_fwd = DecBlock(name="decoder_fwd6")(corr6)
        flow6_bwd = DecBlock(name="decoder_bwd6")(corr6)
        flow6_fwd_up = upsample2x_bilinear(flow6_fwd)
        flow6_bwd_up = upsample2x_bilinear(flow6_bwd)
        occ6 = softmax2d(DecBlock(name="decoder_occ6")(cat([corr6, fa[5]])))

        flows_fwd_raw = {6: (flow6_fwd, flow6_fwd_up)}
        flows_bwd_raw = {6: (flow6_bwd, flow6_bwd_up)}
        occs = {6: occ6}

        warp_scales = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}
        flow_fwd_up, flow_bwd_up = flow6_fwd_up, flow6_bwd_up
        for lvl in (5, 4, 3, 2):
            k = lvl - 1  # pyramid index
            s = warp_scales[lvl]
            fb_w = flow_warp(fb[k], s * flow_fwd_up, padding_mode="border")
            fc_w = flow_warp(fc[k], -s * flow_fwd_up, padding_mode="border")
            corr = corr_pair(fa[k], fb_w, fc_w)
            upfeat_fwd = cat([corr, fa[k], flow_fwd_up])
            upfeat_bwd = cat([corr, fa[k], flow_bwd_up])
            flow_fwd = DecBlock(name=f"decoder_fwd{lvl}")(upfeat_fwd)
            flow_bwd = DecBlock(name=f"decoder_bwd{lvl}")(upfeat_bwd)
            occs[lvl] = softmax2d(DecBlock(name=f"decoder_occ{lvl}")(upfeat_fwd))
            flow_fwd_up = upsample2x_bilinear(flow_fwd)
            flow_bwd_up = upsample2x_bilinear(flow_bwd)
            flows_fwd_raw[lvl] = (flow_fwd, flow_fwd_up)
            flows_bwd_raw[lvl] = (flow_bwd, flow_bwd_up)

        # ---- full-res outputs (back2future.py:255-271) ----
        out_scale = {2: 20.0, 3: 10.0, 4: 5.0, 5: 2.5, 6: 1.25}
        flow_fwd_full = [out_scale[l] * upsample2x_bilinear(flows_fwd_raw[l][1])
                         for l in (2, 3, 4, 5, 6)]
        flow_bwd_full = [-out_scale[l] * upsample2x_bilinear(flows_bwd_raw[l][1])
                         for l in (2, 3, 4, 5, 6)]
        occ_full = [upsample_nearest(occs[l], 4) for l in (2, 3, 4, 5, 6)]

        if not training:
            return flow_fwd_full[0], flow_bwd_full[0], occ_full[0]

        if self.nlevels == 6:
            flow_fwd_full.append(0.625 * flows_fwd_raw[6][1])
            flow_bwd_full.append(-0.625 * flows_bwd_raw[6][1])
            occ_full.append(upsample_nearest(occs[6], 2))
        return flow_fwd_full, flow_bwd_full, occ_full
