"""Folder -> disparity/depth images (parity: /root/reference/run_inference.py).

Kept quirk: normalization is (x/255 - 0.5)/0.2, unlike training's /0.5
(run_inference.py:62 — documented deviation in the reference itself).
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

parser = argparse.ArgumentParser(
    description="DispNet inference on a folder of images",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("--output-disp", action="store_true")
parser.add_argument("--output-depth", action="store_true")
parser.add_argument("--pretrained", required=True)
parser.add_argument("--dispnet", default="DispNetS")
parser.add_argument("--img-height", default=128, type=int)
parser.add_argument("--img-width", default=416, type=int)
parser.add_argument("--no-resize", action="store_true")
parser.add_argument("--dataset-list", default=None)
parser.add_argument("--dataset-dir", default=".")
parser.add_argument("--output-dir", default="output")
parser.add_argument("--img-exts", default=["png", "jpg", "bmp"], nargs="*")


def main(argv=None):
    args = parser.parse_args(argv)
    if not (args.output_disp or args.output_depth):
        print("You must at least output one value !")
        return

    import cv2
    import jax
    import jax.numpy as jnp
    from cc_tpu.cli.test_disp import load_net_params
    from cc_tpu.utils.viz import image_to_display, scalar_to_rgb

    disp_net, disp_vars = load_net_params(args.pretrained, args.dispnet)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.dataset_list:
        with open(args.dataset_list) as f:
            test_files = [os.path.join(args.dataset_dir, p)
                          for p in f.read().splitlines()]
    else:
        test_files = sum(
            (sorted(glob.glob(os.path.join(args.dataset_dir, f"*.{e}")))
             for e in args.img_exts), [])
    print(f"{len(test_files)} files to test")

    fwd = jax.jit(lambda x: disp_net.apply(disp_vars, x, training=False))

    for path in test_files:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        if not args.no_resize and img.shape[:2] != (args.img_height,
                                                    args.img_width):
            img = cv2.resize(img, (args.img_width, args.img_height))
        x = ((img.astype(np.float32) / 255 - 0.5) / 0.2)[None]
        disp = np.asarray(fwd(jnp.asarray(x)))[0, ..., 0]

        base = os.path.splitext(os.path.basename(path))
        if args.output_disp:
            viz = (255 * scalar_to_rgb(disp, colormap="bone")).astype(np.uint8)
            cv2.imwrite(os.path.join(
                args.output_dir, f"{base[0]}_disp{base[1]}"),
                cv2.cvtColor(viz, cv2.COLOR_RGB2BGR))
        if args.output_depth:
            depth = 1.0 / disp
            viz = (255 * scalar_to_rgb(depth, max_value=10,
                                       colormap="rainbow")).astype(np.uint8)
            cv2.imwrite(os.path.join(
                args.output_dir, f"{base[0]}_depth{base[1]}"),
                cv2.cvtColor(viz, cv2.COLOR_RGB2BGR))


if __name__ == "__main__":
    main()
