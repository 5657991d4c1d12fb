"""Offline dataset preparation CLI
(parity: /root/reference/data/prepare_train_data.py).

python -m cc_tpu.cli.prepare_train_data RAW_DIR --dataset-format kitti \
    --dump-root DUMP --width 832 --height 256 --num-threads 4 [--with-gt]
    [--static-frames cc_tpu/data/lists/static_frames.txt]
"""
from __future__ import annotations

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("dataset_dir", metavar="DIR")
parser.add_argument("--dataset-format", required=True,
                    choices=["kitti", "cityscapes"])
parser.add_argument("--static-frames", default=None)
parser.add_argument("--with-gt", action="store_true")
parser.add_argument("--dump-root", required=True)
parser.add_argument("--height", type=int, default=128)
parser.add_argument("--width", type=int, default=416)
parser.add_argument("--num-threads", type=int, default=4)


def main(argv=None):
    args = parser.parse_args(argv)
    import os
    from joblib import Parallel, delayed
    from cc_tpu.data.etl import (CityscapesLoader, KittiRawLoader,
                                 dump_scene, write_split)

    os.makedirs(args.dump_root, exist_ok=True)
    if args.dataset_format == "kitti":
        loader = KittiRawLoader(args.dataset_dir,
                                static_frames_file=args.static_frames,
                                img_height=args.height,
                                img_width=args.width, get_gt=args.with_gt)
    else:
        loader = CityscapesLoader(args.dataset_dir, img_height=args.height,
                                  img_width=args.width)

    print(f"Retrieving frames from {len(loader.scenes)} scenes")
    Parallel(n_jobs=args.num_threads)(
        delayed(dump_scene)(loader, scene, args.dump_root)
        for scene in loader.scenes)
    print("Generating train/val lists")
    write_split(args.dump_root)


if __name__ == "__main__":
    main()
