"""The fused Competitive-Collaboration train step.

The entire reference inner-loop body (train.py:445-568: 4 forwards, 5
losses, backward, Adam) becomes ONE jitted, donated function — the region
the ≥5x/chip throughput target rides on (SURVEY.md §3.1).

CC alternation: frozen nets (--fix-* flags) get (a) stop_gradient on their
outputs — the exact equivalent of requires_grad=False since no net consumes
another net's outputs, so every gradient path through a net's outputs ends
at its own params — XLA then dead-code-eliminates the whole frozen backward;
and (b) optax.multi_transform zero-updates so Adam moments stay intact.

Batch layout: {'tgt': [B,H,W,3], 'refs': [B,nref,H,W,3],
'intrinsics': [B,3,3], 'intrinsics_inv': [B,3,3]} — NHWC, (0.5,0.5) or
locally normalized images.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from cc_tpu.geometry import pose2flow
from cc_tpu.losses import (
    consensus_depth_flow_mask, consensus_exp_masks,
    compute_joint_mask_for_depth, edge_aware_smoothness_loss,
    explainability_loss, photometric_flow_loss,
    photometric_reconstruction_loss, smooth_loss, spatial_normalize,
)
from cc_tpu.losses.photometric import flow_warped_refs
from cc_tpu.parallel.mesh import batch_sharding, replicated_sharding
from cc_tpu.train.config import TrainConfig
from cc_tpu.train.state import CCModels, TrainState, apply_net, make_optimizer

sg = jax.lax.stop_gradient


def _maybe_sg(tree, frozen: bool):
    return jax.tree_util.tree_map(sg, tree) if frozen else tree


def _device_normalize(x):
    """Compact-H2D mode: train batches may arrive as uint8 (--h2d uint8;
    data/transforms.QuantizeU8) to quarter the host->device traffic; the
    global (x/255 - .5)/.5 normalization then runs HERE, on device, fused
    into the step. Same op order as transforms.Normalize so the result
    matches the host float path to within the documented 0.5/255
    quantization bound. jit traces per dtype, so float batches take the
    identity branch at trace time."""
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    return x


def forward_all(cfg: TrainConfig, mods: CCModels, params, batch_stats, batch,
                training: bool = True):
    """Run all four nets; returns (outputs dict, new_batch_stats)."""
    tgt = _device_normalize(batch["tgt"])
    refs_all = _device_normalize(batch["refs"])
    refs = [refs_all[:, i] for i in range(refs_all.shape[1])]

    dt = cfg.compute_dtype
    disparities, bs_disp = apply_net(mods.disp, params["disp"],
                                     batch_stats["disp"], tgt,
                                     training=training, compute_dtype=dt)
    pose, bs_pose = apply_net(mods.pose, params["pose"], batch_stats["pose"],
                              tgt, refs, training=training, compute_dtype=dt)
    exp_masks, bs_mask = apply_net(mods.mask, params["mask"],
                                   batch_stats["mask"], tgt, refs,
                                   training=training, compute_dtype=dt)
    if cfg.flownet == "Back2Future":
        (flow_fwd, flow_bwd, occ), bs_flow = apply_net(
            mods.flow, params["flow"], batch_stats["flow"], tgt, refs[1:3],
            training=training, compute_dtype=dt)
    else:
        flow_fwd, bs_flow = apply_net(mods.flow, params["flow"],
                                      batch_stats["flow"], tgt, refs[2],
                                      training=training, compute_dtype=dt)
        flow_bwd, _ = apply_net(mods.flow, params["flow"],
                                batch_stats["flow"], tgt, refs[1],
                                training=training, compute_dtype=dt)
        occ = None

    if training:
        disparities = list(disparities)
        exp_masks = list(exp_masks)
        flow_fwd = list(flow_fwd) if isinstance(flow_fwd, (list, tuple)) else flow_fwd
        flow_bwd = list(flow_bwd) if isinstance(flow_bwd, (list, tuple)) else flow_bwd

    outputs = dict(disparities=disparities, pose=pose, exp_masks=exp_masks,
                   flow_fwd=flow_fwd, flow_bwd=flow_bwd, occ=occ, refs=refs,
                   tgt=tgt)
    new_bs = {"disp": bs_disp, "pose": bs_pose, "mask": bs_mask,
              "flow": bs_flow}
    return outputs, new_bs


def compute_losses(cfg: TrainConfig, outputs, batch):
    """The 5 CC losses (train.py:468-509), given the nets' outputs."""
    tgt = outputs["tgt"]
    refs = outputs["refs"]
    K, K_inv = batch["intrinsics"], batch["intrinsics_inv"]

    exp_cast = outputs["exp_masks"]
    if cfg.loss_dtype == "bfloat16":
        # Image payloads and masks go bf16 at the loss boundary; all
        # coordinate-like tensors (depth, pose, flows, K) stay fp32 —
        # grid_sample/flow_warp force fp32 coordinate math regardless
        # (geometry/sampling.py) and gather the bf16 payload. Every
        # scalar loss reduces in fp32 (losses.charbonnier.mean32).
        tgt = tgt.astype(jnp.bfloat16)
        refs = [r.astype(jnp.bfloat16) for r in refs]
        exp_cast = [m.astype(jnp.bfloat16) for m in exp_cast]

    disparities = outputs["disparities"]
    if cfg.spatial_normalize:
        disparities = [spatial_normalize(d) for d in disparities]
    depth = [1.0 / d for d in disparities]
    pose = outputs["pose"]
    exp_masks = exp_cast
    flow_fwd, flow_bwd = outputs["flow_fwd"], outputs["flow_bwd"]

    # freezing == requires_grad=False (see module docstring)
    depth = _maybe_sg(depth, cfg.fix_dispnet)
    pose = _maybe_sg(pose, cfg.fix_posenet)
    exp_masks = _maybe_sg(exp_masks, cfg.fix_masknet)
    flow_fwd = _maybe_sg(flow_fwd, cfg.fix_flownet)
    flow_bwd = _maybe_sg(flow_bwd, cfg.fix_flownet)

    w1 = cfg.cam_photo_loss_weight
    w2 = cfg.mask_loss_weight
    w3 = cfg.smooth_loss_weight
    w4 = cfg.flow_photo_loss_weight
    w5 = cfg.consensus_loss_weight

    # Zero-weight losses are skipped in PYTHON, not left to XLA: the
    # compiler does not fold 0.0*x for floats (NaN semantics), so w*loss
    # with w==0 would still execute the whole loss subgraph on device.
    # Behavior is identical (the reference sums w_i*loss_i, train.py:509);
    # skipped losses report 0 in metrics.
    zero = jnp.zeros(())

    need_cam_flows = w5 > 0 or cfg.joint_mask_for_depth
    if need_cam_flows:
        flows_cam_fwd = [pose2flow(d[..., 0], pose[:, 2], K, K_inv,
                                   cfg.rotation_mode) for d in depth]
        flows_cam_bwd = [pose2flow(d[..., 0], pose[:, 1], K, K_inv,
                                   cfg.rotation_mode) for d in depth]
        rigidity_fwd = [jnp.abs(fc - f)
                        for fc, f in zip(flows_cam_fwd, flow_fwd)]
        rigidity_bwd = [jnp.abs(fc - f)
                        for fc, f in zip(flows_cam_bwd, flow_bwd)]

    if cfg.joint_mask_for_depth:
        exp_for_depth = compute_joint_mask_for_depth(
            exp_masks, rigidity_bwd, rigidity_fwd, cfg.THRESH)
    else:
        exp_for_depth = exp_masks

    if cfg.no_non_rigid_mask:
        flow_exp_mask = None
    else:
        flow_exp_mask = [1.0 - m[..., 1:3] for m in exp_masks]

    loss1 = photometric_reconstruction_loss(
        tgt, refs, K, K_inv, depth, exp_for_depth, pose,
        rotation_mode=cfg.rotation_mode, padding_mode=cfg.padding_mode,
        lambda_oob=cfg.lambda_oob, qch=cfg.qch,
        wssim=cfg.wssim) if w1 > 0 else zero

    loss2 = explainability_loss(exp_masks) if w2 > 0 else zero

    if w3 <= 0:
        loss3 = zero
    elif cfg.smoothness_type == "regular":
        loss3 = (smooth_loss(depth) + smooth_loss(flow_fwd)
                 + smooth_loss(flow_bwd) + smooth_loss(exp_masks))
    else:
        loss3 = (edge_aware_smoothness_loss(tgt, depth)
                 + edge_aware_smoothness_loss(tgt, flow_fwd)
                 + edge_aware_smoothness_loss(tgt, flow_bwd)
                 + edge_aware_smoothness_loss(tgt, exp_masks))

    # The flow photometric loss and the consensus targets warp the SAME
    # (pooled) refs with the SAME flows — compute those gathers once (the
    # warp stack is DMA-issue-bound; see PARITY.md "Performance").
    warped_refs = None
    if w4 > 0 or w5 > 0:
        warped_refs = [flow_warped_refs(refs[1], flow_bwd),
                       flow_warped_refs(refs[2], flow_fwd)]

    loss4 = photometric_flow_loss(
        tgt, refs[1:3], [flow_bwd, flow_fwd], flow_exp_mask,
        lambda_oob=cfg.lambda_oob, qch=cfg.qch,
        wssim=cfg.wssim, warped_refs=warped_refs) if w4 > 0 else zero

    if w5 > 0:
        exp_masks_target = consensus_exp_masks(
            flows_cam_fwd, flows_cam_bwd, flow_fwd, flow_bwd, tgt, refs[2],
            refs[1], wssim=cfg.wssim, wrig=cfg.wrig,
            ws=cfg.smooth_loss_weight, flow_warped_fwd=warped_refs[1])
        loss5 = consensus_depth_flow_mask(
            exp_masks, rigidity_bwd, rigidity_fwd, exp_masks_target,
            exp_masks_target, THRESH=cfg.THRESH, wbce=cfg.wbce)
    else:
        loss5 = zero

    total = w1 * loss1 + w2 * loss2 + w3 * loss3 + w4 * loss4 + w5 * loss5
    metrics = {"loss": total, "photo_cam_loss": loss1,
               "explainability_loss": loss2, "smooth_loss": loss3,
               "photo_flow_loss": loss4, "consensus_loss": loss5}
    return total, metrics


def build_train_step(cfg: TrainConfig, mods: CCModels, mesh=None,
                     donate: bool = True):
    """Returns jitted (state, batch) -> (state, metrics)."""
    optimizer = make_optimizer(cfg)

    def loss_fn(params, batch_stats, batch):
        outputs, new_bs = forward_all(cfg, mods, params, batch_stats, batch)
        total, metrics = compute_losses(cfg, outputs, batch)
        return total, (metrics, new_bs)

    def step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, batch_stats=new_bs,
                          opt_state=new_opt, step=state.step + 1), metrics

    kwargs = {}
    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        kwargs = dict(in_shardings=(repl, data),
                      out_shardings=(repl, repl))
    return jax.jit(step, donate_argnums=(0,) if donate else (), **kwargs)


def build_forward_eval(cfg: TrainConfig, mods: CCModels, mesh=None):
    """Jitted eval-mode 4-net forward: finest-scale outputs only
    (the validate_flow_with_gt forward, train.py:665-677)."""

    def fwd(params, batch_stats, batch):
        outputs, _ = forward_all(cfg, mods, params, batch_stats, batch,
                                 training=False)
        disp = outputs["disparities"]
        if cfg.spatial_normalize:
            disp = spatial_normalize(disp)
        return {
            "disp": disp, "depth": 1.0 / disp, "pose": outputs["pose"],
            "exp_mask": outputs["exp_masks"], "flow_fwd": outputs["flow_fwd"],
            "flow_bwd": outputs["flow_bwd"], "occ": outputs["occ"],
        }

    kwargs = {}
    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        kwargs = dict(in_shardings=(repl, repl, data), out_shardings=data)
    return jax.jit(fwd, **kwargs)
