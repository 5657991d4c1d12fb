"""Competitive-Collaboration consensus losses (the "M as moderator" machinery).

Parity: loss_functions.py:160-261 (consensus_exp_masks,
consensus_depth_flow_mask, weighted_binary_cross_entropy) and a repaired
compute_joint_mask_for_depth (the reference version crashes: 3-arg call at
train.py:479 vs 4-arg signature, plus a shape-broadcast bug at line 210).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cc_tpu.geometry import flow_warp
from cc_tpu.losses.charbonnier import mean32, robust_l1_per_pix
from cc_tpu.losses.explainability import logical_or
from cc_tpu.losses.photometric import _pool_to, _valid_pixels
from cc_tpu.losses.ssim import ssim

EPSILON = 1e-8


def consensus_exp_masks(cam_flows_fwd, cam_flows_bwd, flows_fwd, flows_bwd,
                        tgt_img, ref_img_fwd, ref_img_bwd,
                        wssim, wrig, ws=0.1, flow_warped_fwd=None):
    """Per-scale binary targets "rigid explains this pixel better" [B,h,w,1].

    Parity: loss_functions.py:160-202. Kept quirk: the per-scale weight `ws`
    is threaded through but unused by the per-scale computation.
    `flow_warped_fwd` (optional) is the per-scale flow_warp(ref_fwd, flow)
    already computed by the flow photometric loss — identical values
    (loss_functions.py:176 recomputes it; the cam warps can NOT be shared:
    their flows use full-res intrinsics at every scale, a kept quirk).
    """
    def one_scale(cam_flow_fwd, cam_flow_bwd, flow_fwd, flow_bwd, fw_pre):
        b, h, w, _ = cam_flow_fwd.shape
        tgt_s = _pool_to(tgt_img, h, w)
        ref_fwd_s = _pool_to(ref_img_fwd, h, w)
        ref_bwd_s = _pool_to(ref_img_bwd, h, w)

        cam_w_fwd = flow_warp(ref_fwd_s, cam_flow_fwd)
        cam_w_bwd = flow_warp(ref_bwd_s, cam_flow_bwd)
        flow_w_fwd = fw_pre if fw_pre is not None else \
            flow_warp(ref_fwd_s, flow_fwd)

        valid_cam = logical_or(_valid_pixels(cam_w_fwd),
                               _valid_pixels(cam_w_bwd))

        def err(warped):
            charb = jnp.mean(robust_l1_per_pix(tgt_s - warped), axis=-1,
                             keepdims=True)
            s = jnp.mean(1.0 - ssim(tgt_s, warped), axis=-1, keepdims=True)
            return (1 - wssim) * charb + wssim * s

        cam_err = jnp.minimum(err(cam_w_fwd), err(cam_w_bwd)) * valid_cam
        flow_err = err(flow_w_fwd)
        return (wrig * cam_err <= flow_err + EPSILON).astype(cam_err.dtype)

    return [one_scale(cam_flows_fwd[i], cam_flows_bwd[i],
                      flows_fwd[i], flows_bwd[i],
                      None if flow_warped_fwd is None else flow_warped_fwd[i])
            for i in range(len(cam_flows_fwd))]


def weighted_binary_cross_entropy(output, target, weights=None):
    """Parity: loss_functions.py:252-261.

    The log arguments are guarded with a maximum() barrier: EPSILON=1e-8 is
    below the fp32 ulp at 1.0, so XLA's reassociation of `1 - output + eps`
    (legal under --xla_allow_excess_precision) can produce exact 0 when
    `output` saturates to 1.0 -> log(0) = -inf -> 0 * -inf = NaN. torch
    evaluates left-to-right so the reference never hits this; for any
    output < 1 the guarded form is bit-identical to the reference's.
    """
    pos = jnp.log(jnp.maximum(output, 0.0) + EPSILON)
    neg = jnp.log(jnp.maximum(1.0 - output, 0.0) + EPSILON)
    if weights is not None:
        assert len(weights) == 2
        loss = weights[1] * (target * pos) + weights[0] * ((1 - target) * neg)
    else:
        loss = target * pos + (1 - target) * neg
    return -mean32(loss)


def consensus_depth_flow_mask(explainability_mask, census_mask_bwd,
                              census_mask_fwd, exp_masks_bwd_target,
                              exp_masks_fwd_target, THRESH, wbce):
    """Loss 5: weighted BCE between M's masks and detached consensus targets.

    Parity: loss_functions.py:221-250. `census_mask_*` are the soft rigidity
    residuals |flow_cam - flow| per scale [B,h,w,2]; explainability_mask
    entries are [B,h,w,4] (bwd2, bwd1, fwd1, fwd2 frame order).
    """
    assert len(explainability_mask) == len(census_mask_bwd)
    assert len(explainability_mask) == len(census_mask_fwd)
    loss = 0.0
    for i in range(len(explainability_mask)):
        exp_mask = explainability_mask[i]
        census_fwd = jnp.prod(
            (census_mask_fwd[i] < THRESH).astype(exp_mask.dtype),
            axis=-1, keepdims=True)
        census_bwd = jnp.prod(
            (census_mask_bwd[i] < THRESH).astype(exp_mask.dtype),
            axis=-1, keepdims=True)

        census_fwd = logical_or(census_fwd, exp_masks_fwd_target[i])
        census_bwd = logical_or(census_bwd, exp_masks_bwd_target[i])

        # Targets are constants for the moderator (reference detaches here,
        # loss_functions.py:243-244).
        census_fwd = jax.lax.stop_gradient(census_fwd)
        census_bwd = jax.lax.stop_gradient(census_bwd)

        combined = jnp.concatenate(
            [census_bwd, census_bwd, census_fwd, census_fwd], axis=-1)
        loss = loss + weighted_binary_cross_entropy(
            exp_mask, combined, [wbce, 1 - wbce])
    return loss


def compute_joint_mask_for_depth(explainability_mask, rigidity_mask_bwd,
                                 rigidity_mask_fwd, THRESH):
    """Joint (M OR census) masks for depth training, per scale [B,h,w,4].

    The reference version (loss_functions.py:204-219) is unreachable dead
    code with two bugs (caller arity, and a [B,B,h,w] broadcast at line 210).
    This is the repaired intent: census = all-flow-channels-above-THRESH
    residual, exp_joint = soft-OR of M's two middle frames > 0.5, combined
    per direction, stacked (bwd, bwd, fwd, fwd), stop-gradient.
    """
    joint_masks = []
    for i in range(len(explainability_mask)):
        exp_mask = explainability_mask[i]
        rig_fwd = jnp.prod(
            (rigidity_mask_fwd[i] > THRESH).astype(exp_mask.dtype),
            axis=-1, keepdims=True)
        rig_bwd = jnp.prod(
            (rigidity_mask_bwd[i] > THRESH).astype(exp_mask.dtype),
            axis=-1, keepdims=True)
        exp_joint = (logical_or(exp_mask[..., 1:2], exp_mask[..., 2:3])
                     > 0.5).astype(exp_mask.dtype)
        joint_fwd = logical_or(rig_fwd, exp_joint)
        joint_bwd = logical_or(rig_bwd, exp_joint)
        joint = jnp.concatenate(
            [joint_bwd, joint_bwd, joint_fwd, joint_fwd], axis=-1)
        joint_masks.append(jax.lax.stop_gradient(joint))
    return joint_masks
