"""Motion-segmentation IoU benchmark (parity: /root/reference/test_mask.py).

Evaluates M's rigidity mask (full model / census-only / bare M) against
KITTI2015 moving-car GT (obj_map AND semantic class 26). THRESH default 0.94
applies to the NORMALIZED census (test_mask.py:38, 130-132).
"""
from __future__ import annotations

import argparse

import numpy as np

parser = argparse.ArgumentParser(
    description="Motion segmentation IoU on KITTI2015",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("--kitti-dir", required=True)
parser.add_argument("--dispnet", default="DispResNet6")
parser.add_argument("--posenet", default="PoseNetB6")
parser.add_argument("--masknet", default="MaskNet6")
parser.add_argument("--flownet", default="Back2Future")
parser.add_argument("--THRESH", type=float, default=0.94)
parser.add_argument("--pretrained-disp", required=True)
parser.add_argument("--pretrained-pose", required=True)
parser.add_argument("--pretrained-mask", required=True)
parser.add_argument("--pretrained-flow", required=True)
parser.add_argument("--nlevels", type=int, default=6)
parser.add_argument("--output-dir", default=None)
# extensions over the reference (hardcoded 256x832 / N=200)
parser.add_argument("--img-height", type=int, default=256)
parser.add_argument("--img-width", type=int, default=832)
parser.add_argument("-N", "--n-samples", type=int, default=200,
                    dest="n_samples")


def mask_error(mot_gt, seg_gt, pred):
    """[tp0, fp0, fn0, tp1, fp1, fn1] for bg/fg classes; moving-car GT =
    obj_map AND semantic==26, others ignored (test_mask.py:224-262)."""
    import cv2
    max_label = 2
    tp, fp, fn = np.zeros(max_label), np.zeros(max_label), np.zeros(max_label)

    mot_gt = np.array(mot_gt)
    mot_gt[mot_gt != 0] = 1
    mov_car_gt = mot_gt.copy()
    mov_car_gt[seg_gt != 26] = 255
    mot_gt = mov_car_gt

    pred = cv2.resize(np.asarray(pred, np.float32),
                      (mot_gt.shape[1], mot_gt.shape[0]),
                      interpolation=cv2.INTER_NEAREST)
    if pred.ndim == 2:
        pred = np.stack([pred, 1.0 - pred])
    pred = pred.argmax(axis=0)

    for class_id in range(max_label):
        class_gt = np.equal(mot_gt, class_id)
        class_result = np.equal(pred, class_id)
        class_result[np.equal(mot_gt, 255)] = 0
        tp[class_id] += np.count_nonzero(class_gt & class_result)
        fp[class_id] += np.count_nonzero(class_result & ~class_gt)
        fn[class_id] += np.count_nonzero(~class_result & class_gt)
    return [tp[0], fp[0], fn[0], tp[1], fp[1], fn[1]]


def _iou(sums):
    bg = sums[0] / (sums[0] + sums[1] + sums[2])
    fg = sums[3] / (sums[3] + sums[4] + sums[5])
    return (bg + fg) / 2, bg, fg


def main(argv=None):
    args = parser.parse_args(argv)
    import jax
    import jax.numpy as jnp
    from cc_tpu.cli.test_disp import load_net_params
    from cc_tpu.data import transforms
    from cc_tpu.data.validation import ValidationMask
    from cc_tpu.geometry import pose2flow
    from cc_tpu.utils.logging import AverageMeter

    disp_net, disp_vars = load_net_params(args.pretrained_disp, args.dispnet)
    pose_net, pose_vars = load_net_params(args.pretrained_pose, args.posenet,
                                          nb_ref_imgs=4)
    mask_net, mask_vars = load_net_params(args.pretrained_mask, args.masknet,
                                          nb_ref_imgs=4)
    flow_net, flow_vars = load_net_params(args.pretrained_flow, args.flownet,
                                          nlevels=args.nlevels)

    tf = transforms.valid_flow_transform(args.img_height, args.img_width)
    val_set = ValidationMask(root=args.kitti_dir, sequence_length=5,
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

        rigidity = (1.0 - (1.0 - exp_mask[..., 1:2])
                    * (1.0 - exp_mask[..., 2:3]) > 0.5).astype(jnp.float32)
        census_soft = jnp.sqrt(
            jnp.sum((flow_cam - flow_fwd) ** 2, axis=-1, keepdims=True))
        census_soft = 1.0 - census_soft / census_soft.max()
        census = (census_soft > args.THRESH).astype(jnp.float32)
        combined = 1.0 - (1.0 - rigidity) * (1.0 - census)
        return combined, census, rigidity

    errors = AverageMeter(i=6)
    errors_census = AverageMeter(i=6)
    errors_bare = AverageMeter(i=6)
    for i in range(len(val_set)):
        s = val_set[i]
        combined, census, bare = fwd(
            jnp.asarray(s["tgt"][None]), jnp.asarray(s["refs"][None]),
            jnp.asarray(s["intrinsics"][None]),
            jnp.asarray(s["intrinsics_inv"][None]))
        gt_mask = np.asarray(s["obj_map"])
        semantic = np.asarray(s["semantic_map"])
        errors.update(mask_error(gt_mask, semantic,
                                 np.asarray(combined)[0, ..., 0]))
        errors_census.update(mask_error(gt_mask, semantic,
                                        np.asarray(census)[0, ..., 0]))
        errors_bare.update(mask_error(gt_mask, semantic,
                                      np.asarray(bare)[0, ..., 0]))

    results = {}
    for title, e in (("Full Model", errors), ("Census only", errors_census),
                     ("Bare", errors_bare)):
        avg, bg, fg = _iou(e.sum)
        results[title] = (avg, bg, fg)
        print(f"Results {title}")
        print("\t {:>10}, {:>10}, {:>10}".format("iou", "bg_iou", "fg_iou"))
        print(f"Errors \t {avg:10.4f}, {bg:10.4f} {fg:10.4f}")
    return results


if __name__ == "__main__":
    main()
