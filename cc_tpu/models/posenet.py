"""Ego-motion networks C: PoseNet6 / PoseNetB6 / PoseExpNet.

All consume the target frame + nb_ref_imgs reference frames concatenated on
channels and emit [B, nb_ref_imgs, 6] poses (tx,ty,tz,rx,ry,rz), spatially
averaged and scaled by 0.01 (PoseNetB6.py:79-81 etc.). PoseExpNet
additionally emits SfMLearner-style explainability masks.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cc_tpu.models.layers import Conv, ConvReLU, Upconv4ReLU, cat


def _stack_inputs(tgt, refs):
    return cat([tgt] + list(refs))


class PoseNetB6(nn.Module):
    """8 stride-2 convs, 1x1 pose head, global mean, x0.01.
    Parity: models/PoseNetB6.py:24-83 (the paper-default C network)."""
    nb_ref_imgs: int = 4

    @nn.compact
    def __call__(self, tgt, refs, training: bool = False):
        assert len(refs) == self.nb_ref_imgs
        x = _stack_inputs(tgt, refs)
        planes = (16, 32, 64, 128, 256, 256, 256, 256)
        kernels = (7, 5, 3, 3, 3, 3, 3, 3)
        for p, k in zip(planes, kernels):
            x = ConvReLU(p, k, 2)(x)
        pose = Conv(6 * self.nb_ref_imgs, 1, 1, pad=0)(x)
        pose = jnp.mean(pose, axis=(1, 2))
        return 0.01 * pose.reshape(pose.shape[0], self.nb_ref_imgs, 6)


class PoseNet6(nn.Module):
    """conv0 (stride-2, preserves channels) + 7 stride-2 convs + 1x1 head.
    Parity: models/PoseNet6.py:19-62."""
    nb_ref_imgs: int = 4

    @nn.compact
    def __call__(self, tgt, refs, training: bool = False):
        assert len(refs) == self.nb_ref_imgs
        x = _stack_inputs(tgt, refs)
        x = ConvReLU(3 * (1 + self.nb_ref_imgs), 3, 2)(x)
        planes = (16, 32, 64, 128, 256, 256, 256)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        for p, k in zip(planes, kernels):
            x = ConvReLU(p, k, 2)(x)
        pose = Conv(6 * self.nb_ref_imgs, 1, 1, pad=0)(x)
        pose = jnp.mean(pose, axis=(1, 2))
        return 0.01 * pose.reshape(pose.shape[0], self.nb_ref_imgs, 6)


class PoseExpNet(nn.Module):
    """SfMLearner joint pose + explainability net.
    Parity: models/PoseExpNet.py:19-94. Training returns
    ([mask1..mask4], pose); eval returns (mask1, pose). Masks [B,h,w,nref]."""
    nb_ref_imgs: int = 4
    output_exp: bool = False

    @nn.compact
    def __call__(self, tgt, refs, training: bool = False):
        assert len(refs) == self.nb_ref_imgs
        x = _stack_inputs(tgt, refs)
        planes = (16, 32, 64, 128, 256, 256, 256)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        feats = []
        h = x
        for p, k in zip(planes, kernels):
            h = ConvReLU(p, k, 2)(h)
            feats.append(h)

        pose = Conv(6 * self.nb_ref_imgs, 1, 1, pad=0)(feats[6])
        pose = jnp.mean(pose, axis=(1, 2))
        pose = 0.01 * pose.reshape(pose.shape[0], self.nb_ref_imgs, 6)

        if not self.output_exp:
            if training:
                return [None, None, None, None], pose
            return None, pose

        def crop_to(y, ref_hw):
            return y[:, : ref_hw[0], : ref_hw[1], :]

        up_planes = (256, 128, 64, 32, 16)
        up5 = crop_to(Upconv4ReLU(up_planes[0])(feats[4]),
                      feats[3].shape[1:3])
        up4 = crop_to(Upconv4ReLU(up_planes[1])(up5), feats[2].shape[1:3])
        up3 = crop_to(Upconv4ReLU(up_planes[2])(up4), feats[1].shape[1:3])
        up2 = crop_to(Upconv4ReLU(up_planes[3])(up3), feats[0].shape[1:3])
        up1 = crop_to(Upconv4ReLU(up_planes[4])(up2), x.shape[1:3])

        def head(y):
            return nn.sigmoid(Conv(self.nb_ref_imgs, 3, 1)(y))

        mask4, mask3, mask2, mask1 = head(up4), head(up3), head(up2), head(up1)
        if training:
            return [mask1, mask2, mask3, mask4], pose
        return mask1, pose
