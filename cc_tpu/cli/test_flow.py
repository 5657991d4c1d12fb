"""Composite flow evaluation on KITTI2015 (parity: /root/reference/test_flow.py).

python -m cc_tpu.cli.test_flow --pretrained-disp D --pretrained-pose P \
    --pretrained-mask M --pretrained-flow F --kitti-dir /path/to/kitti2015
"""
from __future__ import annotations

import argparse

import numpy as np

parser = argparse.ArgumentParser(
    description="Composite rigid+non-rigid flow eval on KITTI2015",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("--kitti-dir", required=True)
parser.add_argument("--dispnet", default="DispResNet6")
parser.add_argument("--posenet", default="PoseNetB6")
parser.add_argument("--masknet", default="MaskNet6")
parser.add_argument("--flownet", default="Back2Future")
parser.add_argument("--THRESH", type=float, default=0.01)
parser.add_argument("--pretrained-disp", required=True)
parser.add_argument("--pretrained-pose", required=True)
parser.add_argument("--pretrained-mask", required=True)
parser.add_argument("--pretrained-flow", required=True)
parser.add_argument("--nlevels", type=int, default=6)
parser.add_argument("--dataset", default="kitti2015")
parser.add_argument("--output-dir", default=None)
# extensions over the reference (which hardcodes 256x832 / N=200 at
# test_flow.py:77,80): defaults preserve reference behavior
parser.add_argument("--img-height", type=int, default=256)
parser.add_argument("--img-width", type=int, default=832)
parser.add_argument("-N", "--n-samples", type=int, default=200,
                    dest="n_samples")


def main(argv=None):
    args = parser.parse_args(argv)
    import jax
    import jax.numpy as jnp
    from cc_tpu.cli.test_disp import load_net_params
    from cc_tpu.data import transforms
    from cc_tpu.data.validation import ValidationFlow
    from cc_tpu.eval.composite import composite_flow, rigidity_masks
    from cc_tpu.geometry import pose2flow
    from cc_tpu.losses import compute_all_epes
    from cc_tpu.utils.logging import AverageMeter

    disp_net, disp_vars = load_net_params(args.pretrained_disp, args.dispnet)
    pose_net, pose_vars = load_net_params(args.pretrained_pose, args.posenet,
                                          nb_ref_imgs=4)
    mask_net, mask_vars = load_net_params(args.pretrained_mask, args.masknet,
                                          nb_ref_imgs=4)
    flow_net, flow_vars = load_net_params(args.pretrained_flow, args.flownet,
                                          nlevels=args.nlevels)

    tf = transforms.valid_flow_transform(args.img_height, args.img_width)
    val_set = ValidationFlow(root=args.kitti_dir, sequence_length=5,
                             transform=tf, N=args.n_samples)

    @jax.jit
    def fwd(tgt, refs, k, k_inv):
        refs_l = [refs[:, i] for i in range(refs.shape[1])]
        disp = disp_net.apply(disp_vars, tgt, training=False)
        depth = 1.0 / disp
        pose = pose_net.apply(pose_vars, tgt, refs_l, training=False)
        exp_mask = mask_net.apply(mask_vars, tgt, refs_l, training=False)
        if args.flownet == "Back2Future":
            flow_fwd, _, _ = flow_net.apply(flow_vars, tgt, refs_l[1:3],
                                            training=False)
        else:
            flow_fwd = flow_net.apply(flow_vars, tgt, refs_l[2],
                                      training=False)
        flow_cam = pose2flow(depth[..., 0], pose[:, 2], k, k_inv)
        total_flow, combined = composite_flow(flow_cam, flow_fwd, exp_mask,
                                              args.THRESH)
        return disp, flow_cam, flow_fwd, total_flow, combined

    names = ["epe_total", "epe_sp", "epe_mv", "Fl", "epe_total_gt_mask",
             "epe_sp_gt_mask", "epe_mv_gt_mask", "Fl_gt_mask"]
    errors = AverageMeter(i=len(names))
    for i in range(len(val_set)):
        s = val_set[i]
        tgt = jnp.asarray(s["tgt"][None])
        refs = jnp.asarray(s["refs"][None])
        k = jnp.asarray(s["intrinsics"][None])
        k_inv = jnp.asarray(s["intrinsics_inv"][None])
        disp, flow_cam, flow_fwd, total_flow, combined = fwd(tgt, refs, k,
                                                             k_inv)
        flow_gt = s["flow_gt"][None]
        obj_map = s["obj_map"][None][..., None]
        # partition threshold stays at compute_all_epes' default 0.5
        # (test_flow.py:145); args.THRESH feeds only the census mask.
        e = compute_all_epes(flow_gt, flow_cam, flow_fwd, combined)
        e += compute_all_epes(flow_gt, flow_cam, flow_fwd, 1.0 - obj_map)
        errors.update(e)

        if args.output_dir is not None:
            import os
            for sub in ("images", "gt", "mask"):
                os.makedirs(os.path.join(args.output_dir, sub),
                            exist_ok=True)
            i3 = str(i).zfill(3)
            np.save(os.path.join(args.output_dir, "images", i3),
                    np.asarray(s["tgt"]))
            np.save(os.path.join(args.output_dir, "gt", i3),
                    np.asarray(s["obj_map"]))
            np.save(os.path.join(args.output_dir, "mask", i3),
                    np.asarray(combined)[0, ..., 0])

    print("Results")
    print("\t" + ", ".join(f"{n:>10}" for n in names))
    print("Errors\t" + ", ".join(f"{v:10.4f}" for v in errors.avg))
    return errors.avg, names


if __name__ == "__main__":
    main()
