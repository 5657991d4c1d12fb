"""Host data-pipeline throughput: native (C++) vs Python decode+augment.

Builds a synthetic KITTI-format scene tree (JPEGs + cam.txt), then times
SequenceFolder.__getitem__ end-to-end (decode, rotation/flip/scale-crop
augmentation, normalize, collate) through both pipelines on this host.
The TPU step consumes ~19 frames/s/chip (r2); the host pipeline must
comfortably exceed that per core to keep real-data training device-bound.

Usage: python scripts/bench_dataplane.py [n_samples]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tree(root, scenes=3, frames=10, hw=(370, 1224)):
    import cv2
    r = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    names = []
    for s in range(scenes):
        d = os.path.join(root, f"scene_{s:02d}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "cam.txt"), "w") as f:
            f.write("721.5,0.,609.5,0.,721.5,172.8,0.,0.,1.")
        base = cv2.GaussianBlur(
            (r.rand(hw[0], hw[1], 3) * 255).astype(np.uint8), (21, 21), 8)
        for i in range(frames):
            img = np.roll(base, i * 7, axis=1)
            cv2.imwrite(os.path.join(d, f"{i:07d}.jpg"), img)
        names.append(os.path.basename(d))
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(names))
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write(names[-1])


def bench(loader_kind: str, root: str, n: int) -> float:
    from cc_tpu.data.sequence_folders import SequenceFolder

    if loader_kind == "native":
        from cc_tpu import native
        if native.lib() is None:
            print("native plane unavailable; skipping")
            return float("nan")
        from cc_tpu.data.native_pipeline import NativeTrainPipeline
        tf = NativeTrainPipeline("global", with_rotation=True)
    else:
        from cc_tpu.data import transforms
        tf = transforms.train_transform("global", with_rotation=True)
    ds = SequenceFolder(root, seed=0, train=True, sequence_length=3,
                        transform=tf)
    # warm one sample (JIT-free, but first native call builds the .so)
    ds[0]
    t0 = time.perf_counter()
    for i in range(n):
        sample = ds[i % len(ds)]
    dt = time.perf_counter() - t0
    rate = n / dt
    print(f"{loader_kind:8s}: {rate:7.1f} samples/s "
          f"({1e3 * dt / n:.1f} ms/sample, 1 core)")
    return rate


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    root = "/tmp/dp_bench_data"
    if not os.path.isdir(root):
        make_tree(root)
    r_py = bench("python", root, n)
    r_nat = bench("native", root, n)
    if np.isfinite(r_nat):
        print(f"native/python speedup: {r_nat / r_py:.2f}x")


if __name__ == "__main__":
    main()
