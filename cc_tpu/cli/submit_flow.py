"""KITTI2015 benchmark flow submission (parity: /root/reference/submit_flow.py).

Writes full-resolution composite flow as 16-bit KITTI pngs + .flo files.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser(
    description="KITTI2015 flow benchmark submission",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("pretrained_path",
                    help="dir with {dispnet,posenet,masknet,flownet}"
                         "_model_best.pth.tar")
parser.add_argument("--kitti-dir", required=True)
parser.add_argument("--dispnet", default="DispResNet6")
parser.add_argument("--posenet", default="PoseNetB6")
parser.add_argument("--masknet", default="MaskNet6")
parser.add_argument("--flownet", default="Back2Future")
parser.add_argument("--THRESH", type=float, default=0.01)
parser.add_argument("--nlevels", type=int, default=6)
parser.add_argument("--output-dir", default="kitti_submission")
parser.add_argument("--DEBUG", action="store_true")
# extensions over the reference (hardcoded 256x832 / N=200)
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
    from cc_tpu.data.validation import KITTI2015Test
    from cc_tpu.eval.composite import composite_flow
    from cc_tpu.geometry import pose2flow
    from cc_tpu.ops.image import resize_bilinear
    from cc_tpu.utils.flow_io import flow_write_flo, flow_write_png

    def best(net):
        return os.path.join(args.pretrained_path,
                            f"{net}_model_best.pth.tar")

    disp_net, disp_vars = load_net_params(best("dispnet"), args.dispnet)
    pose_net, pose_vars = load_net_params(best("posenet"), args.posenet,
                                          nb_ref_imgs=4)
    mask_net, mask_vars = load_net_params(best("masknet"), args.masknet,
                                          nb_ref_imgs=4)
    flow_net, flow_vars = load_net_params(best("flownet"), args.flownet,
                                          nlevels=args.nlevels)

    tf = transforms.valid_flow_transform(args.img_height, args.img_width)
    val_set = KITTI2015Test(root=args.kitti_dir, sequence_length=5,
                            transform=tf, N=args.n_samples,
                            phase="training" if args.DEBUG else "testing")

    testing_dir = os.path.join(args.output_dir, "testing")
    testing_dir_flo = os.path.join(args.output_dir, "testing_flo")
    os.makedirs(testing_dir, exist_ok=True)
    os.makedirs(testing_dir_flo, exist_ok=True)

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
        total, _ = composite_flow(flow_cam, flow_fwd, exp_mask, args.THRESH)
        return total

    for i in range(len(val_set)):
        s = val_set[i]
        total = fwd(jnp.asarray(s["tgt"][None]), jnp.asarray(s["refs"][None]),
                    jnp.asarray(s["intrinsics"][None]),
                    jnp.asarray(s["intrinsics_inv"][None]))
        h_pred, w_pred = total.shape[1:3]
        h_gt, w_gt = s["tgt_original"].shape[:2]
        # np.array (copy): np.asarray of a jax array is read-only
        full = np.array(resize_bilinear(total, (h_gt, w_gt)))[0]
        full[..., 0] *= w_gt / w_pred
        full[..., 1] *= h_gt / h_pred
        name = str(i).zfill(6) + "_10"
        flow_write_png(os.path.join(testing_dir, name + ".png"),
                       u=full[..., 0], v=full[..., 1])
        flow_write_flo(os.path.join(testing_dir_flo, name + ".flo"), full)
    print("Done!")


if __name__ == "__main__":
    main()
