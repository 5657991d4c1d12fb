"""Joint Competitive-Collaboration training CLI.

TPU-native rebuild of /root/reference/train.py: same flag surface (the ones
that are live in the reference), same alternation semantics (--fix-*), same
per-epoch validation + decisive-error checkpointing — but one jitted donated
train step over a device mesh instead of DataParallel, a threaded host
pipeline with device prefetch, and orbax checkpoints.

Usage:
  python -m cc_tpu.cli.train DATA --name EXP --dispnet DispResNet6 \
      --posenet PoseNetB6 --masknet MaskNet6 --flownet Back2Future \
      -b4 -pc 1.0 -pf 0.5 -m 0.1 -s 0.1 -c 0.3 --nlevels 6 --lr 1e-4 \
      -wssim 0.997 --smoothness-type edgeaware --fix-masknet --fix-flownet
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Competitive Collaboration training (TPU-native)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("data", metavar="DIR", help="path to formatted dataset")
    p.add_argument("--name", required=True,
                   help="experiment name; checkpoints under checkpoints/NAME")
    p.add_argument("--kitti-dir", default="kitti/kitti2015",
                   help="KITTI2015 dir for flow validation")
    p.add_argument("--DEBUG", action="store_true")
    p.add_argument("--sequence-length", type=int, default=5)
    p.add_argument("--rotation-mode", choices=["euler", "quat"],
                   default="euler")
    p.add_argument("--padding-mode", choices=["zeros", "border"],
                   default="zeros")
    p.add_argument("--with-depth-gt", action="store_true")
    p.add_argument("--with-flow-gt", action="store_true")
    p.add_argument("-j", "--workers", type=int, default=4)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--epoch-size", type=int, default=0)
    p.add_argument("-b", "--batch-size", type=int, default=4)
    p.add_argument("--lr", "--learning-rate", type=float, default=2e-4,
                   dest="lr")
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--beta", type=float, default=0.999)
    p.add_argument("--weight-decay", "--wd", type=float, default=0.0,
                   dest="weight_decay")
    p.add_argument("--clip-grad-norm", type=float, default=0.0,
                   dest="clip_grad_norm",
                   help="global-norm gradient clip; 0 = off (reference "
                        "parity). Recommended ~5.0 with --compute-dtype "
                        "bfloat16 (bounds rare bf16 gradient spikes)")
    p.add_argument("--skip-nonfinite-updates", action="store_true",
                   dest="skip_nonfinite_updates",
                   help="drop optimizer updates with non-finite gradients "
                        "(optax.apply_if_finite) — the standard mixed-"
                        "precision guard; recommended with --compute-dtype "
                        "bfloat16")
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default="float32", dest="compute_dtype",
                   help="net forward/backward dtype; bfloat16 runs the 4 "
                        "nets at MXU bf16 rate (use with --clip-grad-norm 5 "
                        "--skip-nonfinite-updates; see PARITY.md bf16 notes)")
    p.add_argument("--loss-dtype", choices=["float32", "bfloat16"],
                   default="float32", dest="loss_dtype",
                   help="loss-stack dtype; bfloat16 casts image payloads + "
                        "masks at the loss boundary (geometry and all "
                        "reductions stay fp32). Changes loss numerics "
                        "~1e-2 relative")
    p.add_argument("--matmul-precision",
                   choices=["default", "high", "highest"],
                   default="default", dest="matmul_precision",
                   help="TPU MXU precision for fp32 matmuls/convs. "
                        "'default' = single-pass bf16 operands (fastest, "
                        "the benched config); 'high' = 3-pass bf16 "
                        "(~fp32-equivalent mantissa, ~2x conv cost). The "
                        "reference trains in full fp32 CUDA; on small/"
                        "low-texture scenes the CC photometric gradients "
                        "can sit below bf16 operand rounding — the "
                        "recorded TPU alternation run needed 'high' "
                        "(ALTERNATION_TPU.json; 'default' diverged in "
                        "phase A)")
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--smoothness-type", choices=["edgeaware", "regular"],
                   default="regular")
    p.add_argument("--data-normalization", choices=["local", "global"],
                   default="global")
    p.add_argument("--nlevels", type=int, default=6)
    p.add_argument("--dispnet", default="DispResNet6",
                   choices=["DispNetS", "DispNetS6", "DispResNetS6",
                            "DispResNet6"])
    p.add_argument("--posenet", default="PoseNetB6",
                   choices=["PoseNet6", "PoseNetB6", "PoseExpNet"])
    p.add_argument("--masknet", default="MaskNet6",
                   choices=["MaskResNet6", "MaskNet6"])
    p.add_argument("--flownet", default="Back2Future",
                   choices=["Back2Future", "FlowNetC6"])
    p.add_argument("--pretrained-disp", default=None)
    p.add_argument("--pretrained-mask", default=None)
    p.add_argument("--pretrained-pose", default=None)
    p.add_argument("--pretrained-flow", default=None)
    p.add_argument("--spatial-normalize", action="store_true")
    p.add_argument("--no-non-rigid-mask", action="store_true")
    p.add_argument("--joint-mask-for-depth", action="store_true")
    p.add_argument("--fix-masknet", action="store_true")
    p.add_argument("--fix-posenet", action="store_true")
    p.add_argument("--fix-flownet", action="store_true")
    p.add_argument("--fix-dispnet", action="store_true")
    p.add_argument("--fix-posemasknet", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-summary", default="progress_log_summary.csv")
    p.add_argument("--log-full", default="progress_log_full.csv")
    p.add_argument("-qch", "--qch", type=float, default=0.5)
    p.add_argument("-wrig", "--wrig", type=float, default=1.0)
    p.add_argument("-wbce", "--wbce", type=float, default=0.5)
    p.add_argument("-wssim", "--wssim", type=float, default=0.0)
    p.add_argument("-pc", "--cam-photo-loss-weight", type=float, default=1.0)
    p.add_argument("-pf", "--flow-photo-loss-weight", type=float, default=1.0)
    p.add_argument("-m", "--mask-loss-weight", type=float, default=0.0)
    p.add_argument("-s", "--smooth-loss-weight", type=float, default=0.1)
    p.add_argument("-c", "--consensus-loss-weight", type=float, default=0.1)
    p.add_argument("--THRESH", type=float, default=0.01)
    p.add_argument("--lambda-oob", type=float, default=0.0)
    p.add_argument("--log-output", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("-f", "--training-output-freq", type=int, default=0)
    # extensions over the reference (flow-val loader hardcoded to 256x832
    # N=200 at train.py:163); defaults preserve reference behavior
    p.add_argument("--val-flow-height", type=int, default=256)
    p.add_argument("--val-flow-width", type=int, default=832)
    p.add_argument("--val-flow-N", type=int, default=200, dest="val_flow_n")
    p.add_argument("--loader", choices=["auto", "python", "native"],
                   default="auto",
                   help="data plane: native = C++ decode+augment "
                        "(cc_tpu/native, numerically matching python); "
                        "auto = native when it builds, else python")
    p.add_argument("--h2d", choices=["float32", "uint8"], default="float32",
                   help="train-batch host->device format: uint8 ships "
                        "un-normalized pixels (4x less H2D traffic; "
                        "normalization fuses into the device step). "
                        "Pixel numerics change by <=0.5/255 vs float32. "
                        "Requires --data-normalization global")
    return p


def config_from_args(args):
    from cc_tpu.train import TrainConfig
    fix_pose = args.fix_posenet or args.fix_posemasknet
    fix_mask = args.fix_masknet or args.fix_posemasknet
    return TrainConfig(
        dispnet=args.dispnet, posenet=args.posenet, masknet=args.masknet,
        flownet=args.flownet, nlevels=args.nlevels,
        sequence_length=args.sequence_length, height=args.height,
        width=args.width, batch_size=args.batch_size, lr=args.lr,
        momentum=args.momentum, beta=args.beta,
        weight_decay=args.weight_decay,
        clip_grad_norm=args.clip_grad_norm,
        skip_nonfinite_updates=args.skip_nonfinite_updates,
        cam_photo_loss_weight=args.cam_photo_loss_weight,
        mask_loss_weight=args.mask_loss_weight,
        smooth_loss_weight=args.smooth_loss_weight,
        flow_photo_loss_weight=args.flow_photo_loss_weight,
        consensus_loss_weight=args.consensus_loss_weight,
        qch=args.qch, wrig=args.wrig, wbce=args.wbce, wssim=args.wssim,
        THRESH=args.THRESH, lambda_oob=args.lambda_oob,
        rotation_mode=args.rotation_mode, padding_mode=args.padding_mode,
        smoothness_type=args.smoothness_type,
        spatial_normalize=args.spatial_normalize,
        no_non_rigid_mask=args.no_non_rigid_mask,
        joint_mask_for_depth=args.joint_mask_for_depth,
        fix_dispnet=args.fix_dispnet, fix_posenet=fix_pose,
        fix_masknet=fix_mask, fix_flownet=args.fix_flownet,
        compute_dtype=args.compute_dtype, loss_dtype=args.loss_dtype,
    )


def validate_depth(cfg, mods, state, val_loader, fwd_disp, term_logger=None):
    """Depth validation (train.py:588-636): [abs_diff, abs_rel, sq_rel,
    a1, a2, a3]."""
    from cc_tpu.losses import compute_depth_errors
    from cc_tpu.utils.logging import AverageMeter

    errors = AverageMeter(i=6)
    for i, batch in enumerate(val_loader):
        disp = fwd_disp(state.params, state.batch_stats, batch["tgt"])
        depth = 1.0 / np.asarray(disp)[..., 0]
        errors.update(compute_depth_errors(batch["depth"], depth,
                                           crop=True))
        if term_logger is not None:
            term_logger.valid_bar.update(i)
    if term_logger is not None:
        term_logger.valid_bar.finish()
    return errors.avg, ["abs_diff", "abs_rel", "sq_rel", "a1", "a2", "a3"]


def validate_flow(cfg, mods, state, val_loader, fwd_eval,
                  output_writers=None, epoch=0, term_logger=None):
    """Flow validation (train.py:638-777): 8 EPE/outlier metrics with
    predicted and GT rigidity masks; optional image logging to the
    --log-output writers (train.py:703-744)."""
    import jax.numpy as jnp
    from cc_tpu.eval.composite import composite_flow, rigidity_masks
    from cc_tpu.geometry import pose2flow
    from cc_tpu.losses import compute_all_epes
    from cc_tpu.utils.logging import AverageMeter

    names = ["epe_total", "epe_rigid", "epe_non_rigid", "outliers",
             "epe_total_with_gt_mask", "epe_rigid_with_gt_mask",
             "epe_non_rigid_with_gt_mask", "outliers_gt_mask"]
    errors = AverageMeter(i=len(names))
    for i, batch in enumerate(val_loader):
        out = fwd_eval(state.params, state.batch_stats, {
            "tgt": batch["tgt"], "refs": batch["refs"],
            "intrinsics": batch["intrinsics"],
            "intrinsics_inv": batch["intrinsics_inv"]})
        depth = np.asarray(out["depth"])[..., 0]
        flow_cam = pose2flow(jnp.asarray(depth), out["pose"][:, 2],
                             batch["intrinsics"], batch["intrinsics_inv"],
                             cfg.rotation_mode)
        _, _, combined = rigidity_masks(flow_cam, out["flow_fwd"],
                                        out["exp_mask"], cfg.THRESH)
        flow_gt = batch["flow_gt"]
        obj_map = batch["obj_map"][..., None]
        # NB: the epe partition threshold is compute_all_epes' default 0.5
        # (train.py:749, test_flow.py:145) — NOT cfg.THRESH, which only
        # feeds the census/composite masks above.
        e = compute_all_epes(flow_gt, flow_cam, out["flow_fwd"], combined)
        e += compute_all_epes(flow_gt, flow_cam, out["flow_fwd"],
                              1.0 - obj_map)
        errors.update(e)

        if output_writers and i % 10 == 0 and i // 10 < len(output_writers):
            from cc_tpu.utils.viz import (flow_to_image, image_to_display,
                                          scalar_to_rgb)
            w = output_writers[i // 10]
            total, _ = composite_flow(flow_cam, out["flow_fwd"],
                                      out["exp_mask"], cfg.THRESH)
            w.add_image("val flow Input",
                        image_to_display(np.asarray(batch["tgt"])[0]), epoch)
            w.add_image("val Total Flow Output",
                        flow_to_image(np.asarray(total)[0]) / 255.0, epoch)
            w.add_image("val Rigidity Mask Combined",
                        scalar_to_rgb(np.asarray(combined)[0, ..., 0],
                                      max_value=1, colormap="bone"), epoch)
        if term_logger is not None:
            term_logger.valid_bar.update(i)
    if term_logger is not None:
        term_logger.valid_bar.finish()
    return errors.avg, names


def _host_local_tree(tree):
    """See parallel.distributed.host_local_tree (shared with checkpoint
    writes, which face the same non-addressable-array constraint)."""
    from cc_tpu.parallel.distributed import host_local_tree
    return host_local_tree(tree)


class _NullLogger:
    """Write-sink for non-primary processes in a multi-host launch: the
    SummaryLogger / CsvLogger call surface, dropping everything."""

    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def append(self, *a, **k):
        pass


def main(argv=None):
    args = build_parser().parse_args(argv)

    # flag-combination errors before ANY side effect (recorder writes,
    # distributed init)
    if args.h2d == "uint8" and args.data_normalization == "local":
        raise ValueError("--h2d uint8 requires --data-normalization global "
                         "(local stats are a host-side joint reduction)")

    # Multi-host (pod-slice) launch: bring up the multi-process runtime
    # BEFORE any device use — jax.devices() then lists the global device
    # set and the data mesh spans all hosts. The reference wires its
    # parallel backend into the trainer at train.py:300-303; the no-op
    # single-host path leaves everything unchanged.
    from cc_tpu.parallel import distributed
    distributed.initialize()
    primary = distributed.is_primary()
    pcount = distributed.process_count()
    if pcount > 1:
        # create the cross-process communicator clique while the processes
        # are aligned (see warmup_collectives: communicator creation is the
        # one rendezvous with a short hard deadline)
        distributed.warmup_collectives()
    # each process loads only its own rows of the global batch
    batch_slice = (distributed.process_batch_slice(args.batch_size)
                   if pcount > 1 else None)

    if primary:
        with open("experiment_recorder.md", "a") as f:
            f.write("\npython3 " + " ".join(sys.argv))

    import jax
    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)
    import jax.numpy as jnp
    from cc_tpu.data import (DataLoader, SequenceFolder, ValidationSet,
                             device_prefetch, transforms)
    from cc_tpu.data.validation import ValidationFlow
    from cc_tpu.parallel.mesh import make_mesh_for_batch
    from cc_tpu.train import (build_forward_eval, build_train_step,
                              init_state, make_models)
    from cc_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from cc_tpu.train.torch_import import maybe_load_torch_weights
    from cc_tpu.utils.logging import AverageMeter, CsvLogger, SummaryLogger
    from cc_tpu.utils.term import TermLogger

    cfg = config_from_args(args)
    save_path = os.path.join("checkpoints", args.name)
    os.makedirs(save_path, exist_ok=True)
    print(f"=> will save everything to {save_path}")

    norm = args.data_normalization
    train_tf = transforms.train_transform(
        norm, with_rotation=not args.fix_flownet, emit=args.h2d)
    if args.loader != "python":
        from cc_tpu import native
        if native.lib() is not None:
            from cc_tpu.data.native_pipeline import NativeTrainPipeline
            train_tf = NativeTrainPipeline(
                norm, with_rotation=not args.fix_flownet, emit=args.h2d)
            print("=> native (C++) data plane active")
        elif args.loader == "native":
            raise RuntimeError("--loader native requested but the C++ data "
                               "plane failed to build")
    valid_tf = transforms.valid_transform(norm)
    valid_flow_tf = transforms.valid_flow_transform(
        args.val_flow_height, args.val_flow_width, norm)

    print(f"=> fetching scenes in '{args.data}'")
    train_set = SequenceFolder(args.data, seed=args.seed, train=True,
                               sequence_length=args.sequence_length,
                               transform=train_tf)
    if args.DEBUG:
        train_set.samples = train_set.samples[:32]
    print(f"{len(train_set)} samples in {len(train_set.scenes)} train scenes")

    # validation + checkpoint/log writes are primary-only in a multi-host
    # launch (train steps are collective; validation is not, so replicas
    # would only duplicate work)
    val_depth_loader = None
    if args.with_depth_gt and primary:
        val_set = ValidationSet(args.data.replace("cityscapes", "kitti"),
                                transform=valid_tf)
        val_depth_loader = DataLoader(val_set, args.batch_size,
                                      num_workers=args.workers)
    val_flow_loader = None
    if args.with_flow_gt and primary:
        val_flow_set = ValidationFlow(root=args.kitti_dir,
                                      sequence_length=args.sequence_length,
                                      transform=valid_flow_tf,
                                      N=args.val_flow_n)
        val_flow_loader = DataLoader(val_flow_set, 1,
                                     num_workers=args.workers)

    train_loader = DataLoader(train_set, args.batch_size, shuffle=True,
                              num_workers=args.workers, seed=args.seed,
                              batch_slice=batch_slice)
    epoch_size = args.epoch_size or len(train_loader)

    print("=> creating models")
    mods = make_models(cfg)
    state = init_state(cfg, jax.random.PRNGKey(args.seed))
    state = maybe_load_torch_weights(cfg, state, disp=args.pretrained_disp,
                                     pose=args.pretrained_pose,
                                     mask=args.pretrained_mask,
                                     flow=args.pretrained_flow)
    if args.resume:
        print("=> resuming from checkpoint")
        if pcount > 1 and not os.path.isdir(
                os.path.join(save_path, "checkpoint")):
            # checkpoints are written by process 0 only (below); without a
            # shared filesystem the other hosts would silently init fresh
            # params and desynchronize the replicated state
            raise FileNotFoundError(
                f"--resume in a multi-host launch: '{save_path}/checkpoint' "
                f"not visible on this process — "
                "the checkpoint directory must live on a filesystem shared "
                "by all hosts")
        state = load_checkpoint(save_path, state)

    if pcount > 1 and args.batch_size % len(jax.devices()) != 0:
        # make_mesh_for_batch would silently shrink to a device subset,
        # which in a multi-process launch strands the other hosts' chips
        raise ValueError(
            f"multi-host launch: batch size {args.batch_size} must be a "
            f"multiple of the {len(jax.devices())} global devices")
    mesh = make_mesh_for_batch(args.batch_size)
    print(f"=> mesh over {mesh.size} device(s) / {pcount} process(es); "
          f"jitting train step")
    step_fn = build_train_step(cfg, mods, mesh=mesh)
    fwd_eval = build_forward_eval(cfg, mods)

    def fwd_disp(params, batch_stats, tgt):
        from cc_tpu.train.state import apply_net
        out, _ = apply_net(mods.disp, params["disp"], batch_stats["disp"],
                           jnp.asarray(tgt), training=False)
        return out
    fwd_disp = jax.jit(fwd_disp)

    if primary:
        writer = SummaryLogger(save_path)
        output_writers = []
        if args.log_output:  # 3 extra valid/N writers (train.py:157-160)
            output_writers = [SummaryLogger(os.path.join(save_path, "valid",
                                                         str(i)))
                              for i in range(3)]
        summary_csv = CsvLogger(os.path.join(save_path, args.log_summary),
                                ["train_loss", "validation_loss"])
        full_csv = CsvLogger(
            os.path.join(save_path, args.log_full),
            ["train_loss", "photo_cam_loss", "photo_flow_loss",
             "explainability_loss", "smooth_loss"])
    else:
        writer = summary_csv = full_csv = _NullLogger()
        output_writers = []

    # 3-bar fixed-position terminal UI (reference logger.py:6-59 /
    # train.py:325-327); degrades to plain prints when stdout isn't a TTY
    valid_size = len(val_flow_loader) if val_flow_loader is not None else (
        len(val_depth_loader) if val_depth_loader is not None else 0)
    logger = TermLogger(n_epochs=args.epochs, train_size=epoch_size,
                        valid_size=valid_size)
    logger.epoch_bar.start()

    best_error = -1.0
    n_iter = 0
    for epoch in range(args.epochs):
        logger.epoch_bar.update(epoch)
        logger.reset_train_bar()
        losses = AverageMeter(precision=4)
        epoch_losses = []
        t0 = time.time()
        for i, batch in enumerate(
                device_prefetch(iter(train_loader), mesh=mesh)):
            if i >= epoch_size:
                break
            state, metrics = step_fn(state, batch)
            if (primary and args.training_output_freq > 0
                    and n_iter % args.training_output_freq == 0):
                # training image logging (train.py:521-560); in a
                # multi-host launch this primary-only block must not jit
                # over globally-sharded arrays (see _host_local_tree)
                if pcount > 1:
                    p_l = _host_local_tree(state.params)
                    bs_l = _host_local_tree(state.batch_stats)
                    b_l = _host_local_tree(batch)
                else:
                    p_l, bs_l, b_l = state.params, state.batch_stats, batch
                out = fwd_eval(p_l, bs_l, b_l)
                from cc_tpu.utils.viz import (flow_to_image,
                                              image_to_display, scalar_to_rgb)
                tgt0 = np.asarray(b_l["tgt"])[0]
                if tgt0.dtype == np.uint8:  # --h2d uint8 compact mode
                    tgt0 = transforms.dequantize_u8(tgt0)
                writer.add_image("train Input", image_to_display(tgt0),
                                 n_iter)
                writer.add_image(
                    "train Dispnet Output Normalized",
                    scalar_to_rgb(np.asarray(out["disp"])[0, ..., 0],
                                  colormap="bone"), n_iter)
                writer.add_image(
                    "train Depth Output",
                    scalar_to_rgb(np.asarray(out["depth"])[0, ..., 0],
                                  max_value=10), n_iter)
                writer.add_image(
                    "train Non Rigid Flow Output",
                    flow_to_image(np.asarray(out["flow_fwd"])[0]) / 255.0,
                    n_iter)
            # train_loss averages EVERY step (reference train.py:563-576);
            # keep the scalar on device and convert at epoch end to avoid a
            # per-step D2H sync in the hot loop.
            epoch_losses.append(metrics["loss"])
            if i > 0 and n_iter % args.print_freq == 0:
                m = {k: float(v) for k, v in metrics.items()}
                losses.update(m["loss"], args.batch_size)
                for tag in ("loss", "photo_cam_loss", "photo_flow_loss",
                            "explainability_loss", "smooth_loss",
                            "consensus_loss"):
                    writer.add_scalar(tag, m[tag], n_iter)
                full_csv.append([m["loss"], m["photo_cam_loss"],
                                 m["photo_flow_loss"],
                                 m["explainability_loss"], m["smooth_loss"]])
                rate = args.batch_size * (i + 1) / (time.time() - t0)
                logger.train_writer.write(
                    f"Train [{epoch}] it {i}/{epoch_size} "
                    f"Loss {losses} ({rate:.1f} im/s)")
            logger.train_bar.update(i + 1)
            n_iter += 1
        # one fetch for the whole epoch: per-scalar float(v) would be one
        # blocking D2H round trip PER STEP (thousands of serialized RTTs
        # on a remote-device tunnel)
        train_loss = (float(np.mean(np.asarray(
                          jax.device_get(jnp.stack(epoch_losses)))))
                      if epoch_losses else losses.avg[0])
        logger.train_writer.write(f" * Avg Loss : {train_loss:.3f}")
        logger.reset_valid_bar()

        flow_errors = depth_errors = None
        # validation is primary-only and non-collective: on a multi-host
        # launch it must consume host-local copies of the replicated state
        eval_state = state
        if pcount > 1 and (val_flow_loader is not None
                           or val_depth_loader is not None):
            eval_state = state.replace(
                params=_host_local_tree(state.params),
                batch_stats=_host_local_tree(state.batch_stats))
        if val_flow_loader is not None:
            flow_errors, flow_names = validate_flow(
                cfg, mods, eval_state, iter(val_flow_loader), fwd_eval,
                output_writers=output_writers, epoch=epoch,
                term_logger=logger)
            for e, n in zip(flow_errors, flow_names):
                writer.add_scalar(n, e, epoch)
            logger.valid_writer.write(" * Avg " + ", ".join(
                f"{n} : {e:.3f}" for n, e in zip(flow_names, flow_errors)))
        if val_depth_loader is not None:
            # depth validation iterates a different loader than flow's
            logger.reset_valid_bar(len(val_depth_loader))
            depth_errors, depth_names = validate_depth(
                cfg, mods, eval_state, iter(val_depth_loader), fwd_disp,
                term_logger=logger)
            for e, n in zip(depth_errors, depth_names):
                writer.add_scalar(n, e, epoch)
            logger.valid_writer.write("Epoch {} depth: {}".format(
                epoch, ", ".join(f"{n} {e:.3f}"
                                 for n, e in zip(depth_names, depth_errors))))

        # decisive error selection (train.py:382-389)
        decisive = train_loss
        if not cfg.fix_posenet and flow_errors:
            decisive = flow_errors[-2]
        elif not cfg.fix_dispnet and depth_errors:
            decisive = depth_errors[0]
        elif not cfg.fix_flownet and flow_errors:
            decisive = flow_errors[-1]
        elif not cfg.fix_masknet and flow_errors:
            decisive = flow_errors[3]
        if best_error < 0:
            best_error = decisive
        is_best = decisive <= best_error
        best_error = min(best_error, decisive)
        if primary:
            save_checkpoint(save_path, state, is_best=is_best)
        summary_csv.append([train_loss, decisive])
    logger.epoch_bar.finish()
    print("=> done")


if __name__ == "__main__":
    main()
