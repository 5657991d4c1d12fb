"""KITTI odometry pose benchmark (parity: /root/reference/test_pose.py).

python -m cc_tpu.cli.test_pose P.pth.tar --dataset-dir /kitti/odometry \
    --sequences 09 --posenet PoseNetB6
"""
from __future__ import annotations

import argparse

import numpy as np

parser = argparse.ArgumentParser(
    description="PoseNet testing on KITTI Odometry (5-frame ATE/RE)",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("pretrained_posenet")
parser.add_argument("--posenet", default="PoseNetB6")
parser.add_argument("--img-height", default=256, type=int)
parser.add_argument("--img-width", default=832, type=int)
parser.add_argument("--no-resize", action="store_true")
parser.add_argument("--dataset-dir", default=".")
parser.add_argument("--sequences", default=["09"], nargs="*")
parser.add_argument("--output-dir", default=None)
parser.add_argument("--rotation-mode", default="euler",
                    choices=["euler", "quat"])
parser.add_argument("--seq-length", default=5, type=int)


def main(argv=None):
    args = parser.parse_args(argv)
    import cv2
    import jax
    import jax.numpy as jnp
    from cc_tpu.cli.test_disp import load_net_params
    from cc_tpu.eval.kitti_pose import (KittiOdomFramework,
                                        compute_pose_error,
                                        snippet_poses_from_prediction)

    seq_length = args.seq_length
    kw = {"nb_ref_imgs": seq_length - 1}
    if args.posenet == "PoseExpNet":
        kw["output_exp"] = False
    pose_net, pose_vars = load_net_params(args.pretrained_posenet,
                                          args.posenet, **kw)

    framework = KittiOdomFramework(args.dataset_dir, args.sequences,
                                   seq_length)
    print(f"{len(framework)} snippets to test")

    @jax.jit
    def fwd(tgt, refs):
        out = pose_net.apply(pose_vars, tgt,
                             [refs[:, i] for i in range(refs.shape[1])],
                             training=False)
        return out[1] if isinstance(out, tuple) else out

    def prep(im):
        if not args.no_resize and im.shape[:2] != (args.img_height,
                                                   args.img_width):
            im = cv2.resize(im, (args.img_width, args.img_height))
        return ((im / 255.0 - 0.5) / 0.5).astype(np.float32)

    # error/prediction arrays sized len(framework) == total IMAGE count and
    # zero-filled, exactly like the reference (test_pose.py:43,49,96): only
    # the leading snippet rows get written, and mean/std run over the
    # zero-padded full array — the published numbers inherit that quirk.
    errors = np.zeros((len(framework), 2), np.float32)
    predictions = (np.zeros((len(framework), args.seq_length, 3, 4))
                   if args.output_dir else None)
    for j, sample in enumerate(framework):
        imgs = [prep(im) for im in sample["imgs"]]
        mid = len(imgs) // 2
        tgt = jnp.asarray(imgs[mid][None])
        refs = jnp.asarray(
            np.stack(imgs[:mid] + imgs[mid + 1:])[None])
        poses = np.asarray(fwd(tgt, refs))[0]
        final = snippet_poses_from_prediction(poses, args.rotation_mode)
        if predictions is not None:
            predictions[j] = final
        errors[j] = compute_pose_error(sample["poses"], final)
    print("\nResults")
    print("\t {:>10}, {:>10}".format("ATE", "RE"))
    print("mean \t {:10.4f}, {:10.4f}".format(*errors.mean(0)))
    print("std \t {:10.4f}, {:10.4f}".format(*errors.std(0)))
    if args.output_dir:
        import os
        os.makedirs(args.output_dir, exist_ok=True)
        np.save(os.path.join(args.output_dir, "predictions.npy"),
                predictions)
    return errors.mean(0)


if __name__ == "__main__":
    main()
