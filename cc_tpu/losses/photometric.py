"""Photometric self-supervision losses (camera/rigid and flow paths), NHWC.

Parity: loss_functions.py:27-137 (photometric_flow_loss,
photometric_reconstruction_loss, depth_occlusion_masks, occlusion_masks).

Conventions: images [B,H,W,3]; flows [B,h,w,2]; depth scales [B,h,w,1];
explainability masks [B,h,w,nref]; pose [B,nref,6]; intrinsics [B,3,3].
Multi-scale inputs are Python lists (static under jit — XLA unrolls and
fuses the per-scale graphs).
"""
from __future__ import annotations

import os

import jax.numpy as jnp

# CC_TPU_SCAN_REFS=1 runs the rigid loss's per-ref loop as a lax.scan:
# ~4x smaller per-scale program (compile-time lever), measured tradeoff in
# PARITY.md. Default off: the unrolled form is the benched configuration.
_SCAN_REFS = os.environ.get("CC_TPU_SCAN_REFS", "0") == "1"

from cc_tpu.geometry import inverse_warp, flow_warp, pose2flow
from cc_tpu.geometry.camera import scale_intrinsics, scale_intrinsics_inv
from cc_tpu.losses.charbonnier import mean32, robust_l1
from cc_tpu.losses.ssim import ssim


def occlusion_masks(flow_bw: jnp.ndarray, flow_fw: jnp.ndarray):
    """Forward/backward occlusion masks [B,h,w] each.

    Reproduces the reference formula exactly (loss_functions.py:343-352),
    including its quirk that both outputs are identical:
    occ = sum_ch(flow_fw + flow_bw) > 0.08*|flow|^2 + 1.
    """
    mag_sq = jnp.sum(flow_fw ** 2, axis=-1) + jnp.sum(flow_bw ** 2, axis=-1)
    flow_diff_sum = jnp.sum(flow_fw + flow_bw, axis=-1)
    occ_thresh = 0.08 * mag_sq + 1.0
    occ = (flow_diff_sum > occ_thresh).astype(flow_fw.dtype)
    return occ, occ


def depth_occlusion_masks(depth: jnp.ndarray, pose: jnp.ndarray,
                          intrinsics: jnp.ndarray,
                          intrinsics_inv: jnp.ndarray) -> jnp.ndarray:
    """Occlusion masks [B,h,w,4] from rigid flows of the 4 ref frames.

    NOTE (kept quirk): called with FULL-RES intrinsics regardless of the
    depth scale, exactly as loss_functions.py:126,132-137 does.
    """
    d = depth[..., 0] if depth.ndim == 4 else depth
    flows_cam = [pose2flow(d, pose[:, i], intrinsics, intrinsics_inv)
                 for i in range(pose.shape[1])]
    masks1, masks2 = occlusion_masks(flows_cam[1], flows_cam[2])
    masks0, masks3 = occlusion_masks(flows_cam[0], flows_cam[3])
    return jnp.stack([masks0, masks1, masks2, masks3], axis=-1)


def _valid_pixels(warped: jnp.ndarray) -> jnp.ndarray:
    """1 - all-channels-exactly-zero, keepdims (loss_functions.py:45,100)."""
    allzero = jnp.prod((warped == 0).astype(warped.dtype), axis=-1,
                       keepdims=True)
    return 1.0 - allzero


def _oob_norm(valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(numel/sum(valid) with a divide-by-zero barrier, any-valid gate).

    valid is exactly {0,1}-valued, so sum(valid) is integer-valued:
    maximum(sum, 1) is BIT-IDENTICAL to the reference's numel()/sum()
    (loss_functions.py:45,100) whenever the reference is defined (any
    in-bounds pixel), and the gate (sum > 0) is exactly 1.0 there — so
    multiplying the per-ref photometric term by the gate changes nothing
    in any defined case. Both only matter for a warp fully out of bounds,
    where the reference itself produces inf loss and NaN gradients: the
    barrier keeps the norm finite and the gate zeroes the WHOLE per-ref
    term (the diff part is already zero via valid, but the SSIM part is
    `1 - ssim*valid` = 1 everywhere and would otherwise contribute a
    numel-scaled finite spike). Net effect: a fully-OOB ref contributes
    exactly 0 instead of collapsing training into an absorbing non-finite
    state (observed in the bf16 soak; PARITY.md "bf16 long-run
    stability").

    The sum always accumulates in fp32: under loss_dtype=bfloat16 `valid`
    is bf16 and integers above 256 are not exactly representable — the
    cast-then-sum of exact {0,1} values is exact, a bf16 sum is not."""
    s = jnp.sum(valid.astype(jnp.float32))
    return valid.size / jnp.maximum(s, 1.0), (s > 0).astype(jnp.float32)


def _pool_to(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    from cc_tpu.ops.image import adaptive_avg_pool
    return adaptive_avg_pool(img, (h, w))


def photometric_reconstruction_loss(
    tgt_img, ref_imgs, intrinsics, intrinsics_inv, depth,
    explainability_mask, pose, rotation_mode="euler", padding_mode="zeros",
    lambda_oob=0.0, qch=0.5, wssim=0.5,
):
    """Rigid-path photometric loss over all depth scales and ref frames.

    Parity: loss_functions.py:80-128. `depth` is a list of [B,h,w,1];
    `explainability_mask` a matching list of [B,h,w,nref] (or None entries).
    """
    if not isinstance(explainability_mask, (list, tuple)):
        explainability_mask = [explainability_mask]
    if not isinstance(depth, (list, tuple)):
        depth = [depth]

    def one_scale(d, exp_mask, occ_masks):
        b, h, w, _ = d.shape
        downscale = tgt_img.shape[1] / h
        tgt_s = _pool_to(tgt_img, h, w)
        refs_s = [_pool_to(r, h, w) for r in ref_imgs]
        # occlusion masks come from fp32 rigid flows; cast so the
        # elementwise chain stays in the images' dtype (loss_dtype mode)
        occ_masks = occ_masks.astype(tgt_s.dtype)
        k_s = scale_intrinsics(intrinsics, downscale)
        k_inv_s = scale_intrinsics_inv(intrinsics_inv, downscale)

        def per_ref(ref, pose_i, occ_i, exp_i):
            """One ref's photometric term (the reference's inner loop body,
            loss_functions.py:95-124)."""
            warped = inverse_warp(ref, d[..., 0], pose_i, k_s, k_inv_s,
                                  rotation_mode, padding_mode)
            valid = _valid_pixels(warped)
            diff = (tgt_s - warped) * valid
            ssim_loss = 1.0 - ssim(tgt_s, warped) * valid
            oob_norm, any_valid = _oob_norm(valid)

            occ_w = 1.0 - occ_i
            if exp_i is not None:
                diff = diff * occ_w * exp_i
                ssim_loss = ssim_loss * occ_w * exp_i
            else:
                diff = diff * occ_w
                ssim_loss = ssim_loss * occ_w

            # lambda_oob defaults to 0 (reference train.py flag default);
            # skip its whole subgraph in Python — XLA cannot fold 0.0*x
            # under float NaN semantics, so the reference's always-on term
            # would still burn a full-tensor reduction per ref per scale
            term = any_valid * (1 - wssim) * oob_norm * (
                robust_l1(diff, q=qch) + wssim * mean32(ssim_loss))
            if lambda_oob:
                term = term + lambda_oob * robust_l1(1.0 - valid, q=qch)
            return term

        if _SCAN_REFS:
            # CC_TPU_SCAN_REFS=1: run the ref loop as ONE lax.scan so the
            # per-ref subgraph is traced/compiled once instead of nref
            # times (program-size / compile-time experiment, VERDICT r3
            # #7). Identical math; see PARITY.md for the measured
            # compile/runtime tradeoff.
            import jax

            xs = (jnp.stack(refs_s, 0), jnp.moveaxis(pose, 1, 0),
                  jnp.moveaxis(occ_masks, -1, 0)[..., None],
                  None if exp_mask is None
                  else jnp.moveaxis(exp_mask, -1, 0)[..., None])

            def body(acc, x):
                ref, pose_i, occ_i, exp_i = (x if exp_mask is not None
                                             else (*x, None))
                return acc + per_ref(ref, pose_i, occ_i, exp_i), None

            loss, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32),
                xs if exp_mask is not None else xs[:3])
            return loss

        loss = 0.0
        for i in range(len(refs_s)):
            exp_i = exp_mask[..., i:i + 1] if exp_mask is not None else None
            loss = loss + per_ref(refs_s[i], pose[:, i],
                                  occ_masks[..., i:i + 1], exp_i)
        return loss

    total = 0.0
    for d, mask in zip(depth, explainability_mask):
        occ = depth_occlusion_masks(d, pose, intrinsics, intrinsics_inv)
        total = total + one_scale(d, mask, occ)
    return total


def flow_warped_refs(ref_img, flows):
    """Per-scale flow-warps of (the pooled) ref_img: [flow_warp(pool(ref),
    f) for f in flows]. Shared between photometric_flow_loss and
    consensus_exp_masks — the two losses warp the same ref with the same
    flow at every scale (loss_functions.py:46 and :176 do it redundantly;
    one gather instead of two, identical values)."""
    return [flow_warp(_pool_to(ref_img, f.shape[1], f.shape[2]), f)
            for f in flows]


def photometric_flow_loss(tgt_img, ref_imgs, flows, explainability_mask,
                          lambda_oob=0.0, qch=0.5, wssim=0.5,
                          warped_refs=None):
    """Non-rigid photometric loss. Parity: loss_functions.py:27-77.

    `flows` is [flows_bwd, flows_fwd], each a list over scales of [B,h,w,2];
    `ref_imgs` is [ref_bwd, ref_fwd]; `explainability_mask` a list over
    scales of [B,h,w,2] (or None entries). `warped_refs`, if given, is a
    matching [warped_bwd, warped_fwd] list of per-scale precomputed
    flow_warped_refs results.
    """
    if not isinstance(flows[0], (list, tuple)):
        if explainability_mask is not None:
            explainability_mask = [explainability_mask]
        flows = [[uv] for uv in flows]

    def one_scale(exp_mask, occ_masks, flows_s, warped_s):
        b, h, w, _ = flows_s[0].shape
        tgt_s = _pool_to(tgt_img, h, w)
        refs_s = [_pool_to(r, h, w) for r in ref_imgs]
        if occ_masks is not None:  # fp32 (from flows); see rigid one_scale
            occ_masks = occ_masks.astype(tgt_s.dtype)

        loss = 0.0
        for i, ref in enumerate(refs_s):
            warped = (warped_s[i] if warped_s is not None
                      else flow_warp(ref, flows_s[i]))
            valid = _valid_pixels(warped)
            diff = (tgt_s - warped) * valid
            ssim_loss = 1.0 - ssim(tgt_s, warped) * valid
            oob_norm, any_valid = _oob_norm(valid)

            if exp_mask is not None:
                diff = diff * exp_mask[..., i:i + 1]
                ssim_loss = ssim_loss * exp_mask[..., i:i + 1]
            if occ_masks is not None:
                diff = diff * (1.0 - occ_masks[..., i:i + 1])
                ssim_loss = ssim_loss * (1.0 - occ_masks[..., i:i + 1])

            # zero-weight lambda_oob skipped in Python (see the rigid loss)
            loss = loss + any_valid * (1 - wssim) * oob_norm * (
                robust_l1(diff, q=qch) + wssim * mean32(ssim_loss))
            if lambda_oob:
                loss = loss + lambda_oob * robust_l1(1.0 - valid, q=qch)
        return loss

    total = 0.0
    n_scales = len(flows[0])
    for s in range(n_scales):
        flows_s = [uv[s] for uv in flows]
        occ_bw, occ_fw = occlusion_masks(flows_s[0], flows_s[1])
        occ = jnp.stack([occ_bw, occ_fw], axis=-1)
        exp_s = explainability_mask[s] if explainability_mask is not None else None
        warped_s = ([w[s] for w in warped_refs]
                    if warped_refs is not None else None)
        total = total + one_scale(exp_s, occ, flows_s, warped_s)
    return total
