"""Depth benchmark CLI (Eigen split) — parity with /root/reference/test_disp.py.

python -m cc_tpu.cli.test_disp --pretrained-dispnet D.pth.tar \
    [--pretrained-posenet P.pth.tar] --dataset-dir KITTI_raw \
    --dataset-list kitti_eval/test_files_eigen.txt

Accepts either reference torch checkpoints (.pth.tar) or cc_tpu orbax dirs.
"""
from __future__ import annotations

import argparse

import numpy as np

parser = argparse.ArgumentParser(
    description="DispNet testing with corresponding ground truth",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("--dispnet", default="DispResNet6")
parser.add_argument("--posenet", default="PoseExpNet")
parser.add_argument("--pretrained-dispnet", required=True)
parser.add_argument("--pretrained-posenet", default=None)
parser.add_argument("--img-height", default=256, type=int)
parser.add_argument("--img-width", default=832, type=int)
parser.add_argument("--no-resize", action="store_true")
parser.add_argument("--spatial-normalize", action="store_true")
parser.add_argument("--min-depth", default=1e-3, type=float)
parser.add_argument("--max-depth", default=80, type=float)
parser.add_argument("--dataset-dir", default=".")
parser.add_argument("--dataset-list", default=None)
parser.add_argument("--output-dir", default=None)
parser.add_argument("--gt-type", default="KITTI", choices=["KITTI"])
parser.add_argument("--seq-length", default=3, type=int,
                    help="snippet length when using a posenet")


def compute_errors_eigen(gt, pred):
    """abs_rel, sq_rel, rms, log_rms, a1, a2, a3 (test_disp.py:171-187)."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()
    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean((gt - pred) ** 2 / gt)
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def load_net_params(path: str, arch: str, **kw):
    """torch .pth.tar or orbax dir -> (flax module, variables dict)."""
    import cc_tpu.models as models
    from cc_tpu.train.torch_import import load_torch_checkpoint
    net = models.build(arch, **kw)
    params, batch_stats = load_torch_checkpoint(path, arch)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return net, variables


def main(argv=None):
    args = parser.parse_args(argv)
    import cv2
    import jax
    import jax.numpy as jnp
    from cc_tpu.eval.kitti_depth import KittiEigenFramework
    from cc_tpu.losses import spatial_normalize

    disp_net, disp_vars = load_net_params(args.pretrained_dispnet,
                                          args.dispnet)

    seq_length = 0
    if args.pretrained_posenet:
        seq_length = args.seq_length
        pose_net, pose_vars = load_net_params(
            args.pretrained_posenet, args.posenet,
            nb_ref_imgs=seq_length - 1, output_exp=False)

    if args.dataset_list:
        list_path = args.dataset_list
        if list_path in ("eigen", "stillbox"):
            # packaged benchmark protocol lists (the reference ships these
            # as kitti_eval/test_files_eigen.txt and
            # stillbox_eval/test_files_90.txt)
            import cc_tpu.data as _data
            import os as _os
            name = {"eigen": "test_files_eigen.txt",
                    "stillbox": "test_files_90.txt"}[list_path]
            list_path = _os.path.join(_os.path.dirname(_data.__file__),
                                      "lists", name)
        with open(list_path) as f:
            test_files = f.read().splitlines()
    else:
        import glob
        import os
        test_files = [os.path.relpath(p, args.dataset_dir) for ext in
                      ("png", "jpg", "bmp") for p in
                      glob.glob(os.path.join(args.dataset_dir, f"*.{ext}"))]

    framework = KittiEigenFramework(args.dataset_dir, test_files, seq_length,
                                    args.min_depth, args.max_depth)
    print(f"{len(framework)} files to test")

    @jax.jit
    def fwd_disp(x):
        d = disp_net.apply(disp_vars, x, training=False)
        if args.spatial_normalize:
            d = spatial_normalize(d)
        return d

    if args.pretrained_posenet:
        @jax.jit
        def fwd_pose(tgt, refs):
            out = pose_net.apply(pose_vars, tgt,
                                 [refs[:, i] for i in range(refs.shape[1])],
                                 training=False)
            return out[1] if isinstance(out, tuple) else out

    def prep(im):
        if not args.no_resize and im.shape[:2] != (args.img_height,
                                                   args.img_width):
            im = cv2.resize(im, (args.img_width, args.img_height))
        return ((im / 255.0 - 0.5) / 0.5).astype(np.float32)[None]

    errors = np.zeros((2, 7, len(framework)), np.float32)
    predictions = None
    for j in range(len(framework)):
        sample = framework[j]
        tgt = prep(sample["tgt"])
        pred_disp = np.asarray(fwd_disp(jnp.asarray(tgt)))[0, ..., 0]
        gt_depth = sample["gt_depth"]

        pred_depth = 1.0 / pred_disp
        zoom_y = gt_depth.shape[0] / pred_depth.shape[0]
        zoom_x = gt_depth.shape[1] / pred_depth.shape[1]
        pred_zoomed = cv2.resize(pred_depth,
                                 (gt_depth.shape[1], gt_depth.shape[0]),
                                 interpolation=cv2.INTER_LINEAR)
        pred_zoomed = np.clip(pred_zoomed, args.min_depth, args.max_depth)
        if args.output_dir is not None:
            if predictions is None:
                import os
                predictions = np.zeros((len(framework), *pred_disp.shape))
                os.makedirs(args.output_dir, exist_ok=True)
            predictions[j] = 1.0 / pred_disp
        if sample["mask"] is not None:
            pred_masked = pred_zoomed[sample["mask"]]
            gt_masked = gt_depth[sample["mask"]]
        else:
            pred_masked, gt_masked = pred_zoomed, gt_depth

        if seq_length > 0:
            refs = np.stack([prep(r)[0] for r in sample["ref"]])[None]
            poses = np.asarray(fwd_pose(jnp.asarray(tgt),
                                        jnp.asarray(refs)))
            displacements = np.linalg.norm(poses[0, :, :3], axis=1)
            scale_factors = [s1 / s2 for s1, s2 in
                             zip(sample["displacements"], displacements)
                             if s1 > 0]
            scale = np.mean(scale_factors) if scale_factors else 0
            errors[0, :, j] = compute_errors_eigen(gt_masked,
                                                   pred_masked * scale)

        scale = np.median(gt_masked) / np.median(pred_masked)
        errors[1, :, j] = compute_errors_eigen(gt_masked,
                                               pred_masked * scale)

    mean_errors = errors.mean(2)
    names = ["abs_rel", "sq_rel", "rms", "log_rms", "a1", "a2", "a3"]
    fmt_h = ", ".join(f"{n:>10}" for n in names)
    if args.pretrained_posenet:
        print("Results with scale factor determined by PoseNet:")
        print(fmt_h)
        print(", ".join(f"{v:10.4f}" for v in mean_errors[0]))
    print("Results with scale factor determined by GT/prediction ratio "
          "(like the original paper):")
    print(fmt_h)
    print(", ".join(f"{v:10.4f}" for v in mean_errors[1]))
    if args.output_dir is not None:
        import os
        np.save(os.path.join(args.output_dir, "predictions.npy"),
                predictions)
    return mean_errors


if __name__ == "__main__":
    main()
