"""Golden end-to-end tests for the remaining eval/inference CLIs (the ones
test_cli_golden.py does not cover): test_pose, test_sintel_pose,
test_back2future, test_make3d, evaluate_flow, run_inference, and the
mnist train->eval round trip. Every test fabricates the CLI's on-disk
dataset format and drives main(argv) to finite metrics / output files.

Reference CLIs matched: test_pose.py:31-122, test_sintel_pose.py:36-125,
test_back2future.py:28-77, test_make3d.py:37-194, evaluate_flow.py:20-53,
run_inference.py:29-73, mnist.py:130-463 / mnist_eval.py:66-178.
"""
from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from tests.ref_compat import reference_available
# helpers only — the session fixtures (ckpt_dir, kitti2015_dir,
# odometry_dir, sintel_dir, ...) register via conftest
from tests.cli_fixtures import H, W, _write_png  # noqa: F401

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference/torch unavailable")


@pytest.fixture(scope="session")
def make3d_dir(tmp_path_factory):
    """Make3D: Test134/*.jpg (2272-row crops hardcoded upstream) +
    Gridlaserdata/*.mat with Position3DGrid [55,:,4]. The loader pops
    sample 61 (corrupted in the real dataset), so 62+ files are needed."""
    root = tmp_path_factory.mktemp("make3d")
    rng = np.random.default_rng(5)
    os.makedirs(str(root / "Test134"), exist_ok=True)
    os.makedirs(str(root / "Gridlaserdata"), exist_ok=True)
    from scipy.io import savemat
    n = 62
    for i in range(n):
        img = rng.integers(0, 255, (2272, 96, 3), dtype=np.uint8)
        _write_png(root / "Test134" / f"img-{i:03d}.jpg", img)
        grid = np.zeros((55, 30, 4), np.float64)
        grid[:, :, 3] = rng.uniform(2.0, 60.0, (55, 30))
        savemat(root / "Gridlaserdata" / f"depth-{i:03d}.mat",
                {"Position3DGrid": grid})
    return root


def test_pose_cli_golden(ckpt_dir, odometry_dir, tmp_path):
    from cc_tpu.cli.test_pose import main
    out = tmp_path / "pose_out"
    ate_re = main([
        str(ckpt_dir / "posenet_model_best.pth.tar"),
        "--posenet", "PoseNetB6", "--dataset-dir", str(odometry_dir),
        "--sequences", "09", "--img-height", str(H), "--img-width", str(W),
        "--output-dir", str(out),
    ])
    assert len(ate_re) == 2 and np.all(np.isfinite(ate_re)), ate_re
    pred = np.load(out / "predictions.npy")
    assert pred.shape[1:] == (5, 3, 4) and np.isfinite(pred).all()


def test_sintel_pose_cli_golden(ckpt_dir, sintel_dir):
    from cc_tpu.cli.test_sintel_pose import main
    errors = main([
        str(ckpt_dir / "posenet_model_best.pth.tar"),
        "--posenet", "PoseNetB6", "--dataset-dir", str(sintel_dir),
        "--sequences", "alley_1",
        "--img-height", str(H), "--img-width", str(W),
    ])
    errors = np.asarray(errors)
    assert np.all(np.isfinite(errors)), errors


def test_back2future_cli_golden(ckpt_dir, kitti2015_dir):
    from cc_tpu.cli.test_back2future import main
    avg = np.asarray(main([
        "--kitti-dir", str(kitti2015_dir),
        "--pretrained-flow", str(ckpt_dir / "flownet_model_best.pth.tar"),
        "-N", "2",
    ]))
    assert np.all(np.isfinite(avg)), avg
    assert avg[0] > 0  # untrained net vs random GT: nonzero EPE


def test_make3d_cli_golden(ckpt_dir, make3d_dir):
    from cc_tpu.cli.test_make3d import main
    errors = np.asarray(main([
        "--pretrained-dispnet", str(ckpt_dir / "dispnet_model_best.pth.tar"),
        "--dataset-dir", str(make3d_dir),
        "--img-height", str(H), "--img-width", str(W),
    ]))
    assert np.all(np.isfinite(errors)), errors
    # a1..a3 are ratios in [0, 1]
    assert np.all(errors[..., 4:] >= 0) and np.all(errors[..., 4:] <= 1)


def test_evaluate_flow_cli_golden(tmp_path):
    from cc_tpu.cli.evaluate_flow import main
    from cc_tpu.utils.flow_io import flow_write_png
    rng = np.random.default_rng(6)
    gt_dir, out_dir = tmp_path / "gt", tmp_path / "pred"
    os.makedirs(str(gt_dir)), os.makedirs(str(out_dir))
    for i in range(2):
        name = str(i).zfill(6) + "_10.png"
        u = rng.uniform(-8, 8, (H, W))
        v = rng.uniform(-4, 4, (H, W))
        flow_write_png(str(gt_dir / name), u, v)
        flow_write_png(str(out_dir / name), u + 0.5, v - 0.25)
    epe, fl = main(["--gt-dir", str(gt_dir), "--output-dir", str(out_dir),
                    "-N", "2"])
    # known offset: EPE = sqrt(0.5^2 + 0.25^2), quantized to 1/64 px
    assert abs(epe - np.hypot(0.5, 0.25)) < 0.05, epe
    assert 0.0 <= fl <= 1.0


def test_run_inference_cli_golden(ckpt_dir, tmp_path):
    import sys
    import torch
    from cc_tpu.cli.run_inference import main
    ref_models = __import__("tests.test_cli_golden",
                            fromlist=["_ref_models"])._ref_models()
    torch.manual_seed(1)
    disp_ckpt = tmp_path / "dispnets.pth.tar"
    torch.save({"epoch": 0,
                "state_dict": ref_models.DispNetS().state_dict()},
               disp_ckpt)
    rng = np.random.default_rng(7)
    img_dir = tmp_path / "imgs"
    for i in range(2):
        _write_png(img_dir / f"{i:07d}.jpg",
                   rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    out = tmp_path / "out"
    main(["--pretrained", str(disp_ckpt), "--dataset-dir", str(img_dir),
          "--output-dir", str(out), "--output-disp", "--output-depth",
          "--img-height", str(H), "--img-width", str(W)])
    files = sorted(os.listdir(out))
    assert any("disp" in f for f in files) and any("depth" in f
                                                   for f in files)


@pytest.fixture(scope="session")
def mnist_data_dir(tmp_path_factory):
    """Raw-idx MNIST + .mat SVHN with enough samples for a tiny run."""
    from scipy.io import savemat
    root = tmp_path_factory.mktemp("mnist_data")
    rng = np.random.default_rng(8)

    def write_idx(split, n):
        d = root / "mnist"
        os.makedirs(str(d), exist_ok=True)
        imgs = rng.integers(0, 255, (n, 28, 28), dtype=np.uint8)
        labels = rng.integers(0, 10, n, dtype=np.uint8)
        with open(d / f"{split}-images-idx3-ubyte", "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, 28, 28))
            f.write(imgs.tobytes())
        with open(d / f"{split}-labels-idx1-ubyte", "wb") as f:
            f.write(struct.pack(">II", 2049, n))
            f.write(labels.tobytes())

    write_idx("train", 96)
    write_idx("t10k", 32)
    for split, n in (("train", 96), ("test", 32)):
        x = rng.integers(0, 255, (32, 32, 3, n), dtype=np.uint8)
        y = rng.integers(1, 11, (n, 1), dtype=np.uint8)
        os.makedirs(str(root / "svhn"), exist_ok=True)
        savemat(root / "svhn" / f"{split}_32x32.mat", {"X": x, "y": y})
    return root


def test_mnist_train_then_eval_golden(mnist_data_dir, tmp_path, monkeypatch):
    """CC-mnist demo round trip: train 1 epoch -> orbax checkpoint ->
    mnist_eval scores it (moderator-gated Alice/Bob accuracy)."""
    monkeypatch.chdir(tmp_path)
    from cc_tpu.cli.mnist import main as train_main
    from cc_tpu.cli.mnist_eval import main as eval_main
    train_main([str(mnist_data_dir), "--name", "mnist_golden",
                "--epochs", "1", "-b", "16", "--print-freq", "2"])
    ckpt = tmp_path / "checkpoints" / "mnist_golden" / "mnist_best"
    assert ckpt.exists()
    errors = np.asarray(eval_main([str(mnist_data_dir), "--checkpoint",
                                   str(ckpt), "-b", "16"]), np.float64)
    # (total, alice, bob) error rates
    assert errors.shape == (3,) and np.all(np.isfinite(errors))
    assert np.all(errors >= 0.0) and np.all(errors <= 1.0)


@pytest.fixture(scope="session")
def kitti_raw_tree(tmp_path_factory):
    """KITTI raw tree for the ETL: 1 date / 2 drives x 2 cams, oxts speed
    above the 2 m/s filter, velodyne + calib for --with-gt."""
    root = tmp_path_factory.mktemp("kitti_raw_etl")
    rng = np.random.default_rng(9)
    date = "2011_09_26"
    ih, iw = 64, 128
    fx = fy = 50.0
    cx, cy = iw / 2.0, ih / 2.0
    os.makedirs(str(root / date), exist_ok=True)
    with open(root / date / "calib_cam_to_cam.txt", "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        for cid in ("02", "03"):
            f.write(f"P_rect_{cid}: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n")
    r_vc = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    with open(root / date / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: " + " ".join(map(str, r_vc.ravel())) + "\n")
        f.write("T: 0 0 0\n")

    us, vs = np.meshgrid(np.arange(6, iw - 6, 3), np.arange(20, ih - 2, 2))
    us, vs = us.ravel().astype(np.float64), vs.ravel().astype(np.float64)
    for drive in ("0001", "0005"):
        d = root / date / f"{date}_drive_{drive}_sync"
        for i in range(6):
            for cid in ("02", "03"):
                _write_png(d / f"image_{cid}" / "data" / f"{i:010d}.png",
                           rng.integers(0, 255, (ih, iw, 3), dtype=np.uint8))
            os.makedirs(str(d / "oxts" / "data"), exist_ok=True)
            row = [0.0] * 30
            row[8:11] = [5.0, 0.1, 0.0]
            with open(d / "oxts" / "data" / f"{i:010d}.txt", "w") as f:
                f.write(" ".join(map(str, row)) + "\n")
            z = rng.uniform(5.0, 30.0, us.shape)
            cam = np.stack([(us - cx) * z / fx, (vs - cy) * z / fy, z], 1)
            velo = cam @ r_vc
            pts = np.concatenate([velo, np.ones((len(velo), 1))], 1)
            vd = d / "velodyne_points" / "data"
            os.makedirs(str(vd), exist_ok=True)
            pts.astype(np.float32).tofile(str(vd / f"{i:010d}.bin"))
    return root


def test_prepare_train_data_cli_golden(kitti_raw_tree, tmp_path):
    """ETL end-to-end: raw tree -> dumped scenes (jpg + cam.txt + depth
    npy) -> split files; train scenes have GT stripped, val keep it."""
    from cc_tpu.cli.prepare_train_data import main
    import glob as g
    dump = tmp_path / "dump"
    main([str(kitti_raw_tree), "--dataset-format", "kitti",
          "--dump-root", str(dump), "--height", "64", "--width", "128",
          "--with-gt", "--num-threads", "1"])
    scenes = sorted(os.path.basename(p) for p in g.glob(str(dump / "*"))
                    if os.path.isdir(p))
    # 2 drives x 2 cams
    assert scenes == ["2011_09_26_drive_0001_sync_02",
                      "2011_09_26_drive_0001_sync_03",
                      "2011_09_26_drive_0005_sync_02",
                      "2011_09_26_drive_0005_sync_03"], scenes
    train = (dump / "train.txt").read_text().split()
    val = (dump / "val.txt").read_text().split()
    assert sorted(train + val) == scenes and train
    for s in scenes:
        jpgs = g.glob(str(dump / s / "*.jpg"))
        assert len(jpgs) == 6, (s, jpgs)
        cam = (dump / s / "cam.txt").read_text()
        assert cam.startswith("50.0")
        npys = g.glob(str(dump / s / "*.npy"))
        if s in train:
            assert not npys  # strip_train_gt
        else:
            assert len(npys) == 6
            depth = np.load(npys[0])
            assert depth.shape == (64, 128)
            assert (depth > 0).sum() > 50  # projected velodyne points land


def test_prepare_train_data_cityscapes_golden(tmp_path):
    """Cityscapes ETL path: leftImg8bit_sequence frames grouped into
    connected sequences, 2x subsample, bottom-25% crop, camera-json
    intrinsics rescaled."""
    import json
    import glob as g
    from cc_tpu.cli.prepare_train_data import main

    rng = np.random.default_rng(10)
    root = tmp_path / "cs"
    city_dir = root / "leftImg8bit_sequence" / "train" / "aachen"
    for frame in range(8):
        _write_png(city_dir / f"aachen_000042_{frame:06d}_leftImg8bit.png",
                   rng.integers(0, 255, (96, 192, 3), dtype=np.uint8))
    cam_dir = root / "camera" / "train" / "aachen"
    os.makedirs(str(cam_dir), exist_ok=True)
    with open(cam_dir / "aachen_000042_000000_camera.json", "w") as f:
        json.dump({"intrinsic": {"fx": 120.0, "fy": 120.0,
                                 "u0": 96.0, "v0": 48.0}}, f)

    dump = tmp_path / "dump_cs"
    main([str(root), "--dataset-format", "cityscapes",
          "--dump-root", str(dump), "--height", "64", "--width", "128",
          "--num-threads", "1"])
    scenes = sorted(os.path.basename(p) for p in g.glob(str(dump / "*"))
                    if os.path.isdir(p))
    assert scenes == ["aachen_00"], scenes
    jpgs = sorted(g.glob(str(dump / "aachen_00" / "*.jpg")))
    assert len(jpgs) == 4  # 8 frames, 2x subsample
    import cv2
    img = cv2.imread(jpgs[0])
    assert img.shape == (64, 128, 3)
    cam = (dump / "aachen_00" / "cam.txt").read_text()
    fx = float(cam.split(",")[0])
    # fx rescaled by 128/192
    assert abs(fx - 120.0 * 128 / 192) < 1e-3, fx
    assert (dump / "train.txt").exists() and (dump / "val.txt").exists()
