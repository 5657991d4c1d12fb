"""Golden end-to-end tests: each eval CLI driven through main(argv) on a
fabricated on-disk dataset tree, with fresh-init reference torch checkpoints.

This is the layer VERDICT r01 flagged as compile-level-only: here every CLI
actually reads images/GT from disk, runs the jitted forwards, and must
produce finite metrics / valid output files. Formats fabricated:

- KITTI2015 scene-flow tree (multiview pngs, 16-bit flow_occ pngs via
  utils/flow_io, calib_cam_to_cam txt, obj_map, semantic labels)
  -> cli/test_flow, cli/test_mask, cli/submit_flow, cli/train --with-flow-gt
- KITTI raw Eigen tree (pngs + velodyne .bin + calib + oxts)
  -> cli/test_disp (GT depth projected on the fly, parity:
     kitti_eval/depth_evaluation_utils.py:148-191)
- SequenceFolder scene dump (jpgs + cam.txt + train.txt/val.txt)
  -> cli/train end-to-end (1 epoch, tiny shapes)

Reference CLIs matched: test_flow.py:51-188, test_disp.py:36-155,
test_mask.py:50-262, submit_flow.py:46-177, train.py:638-777.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference/torch unavailable")

# helpers only — the session fixtures themselves register via conftest
from tests.cli_fixtures import (  # noqa: F401
    H, W, _rand_rgb, _ref_models, _write_png)


@pytest.fixture(scope="session")
def scenes_dir(tmp_path_factory):
    """SequenceFolder-format training dump (ETL output format)."""
    root = tmp_path_factory.mktemp("scenes")
    rng = np.random.default_rng(2)
    k = np.array([[50.0, 0.0, W / 2], [0.0, 50.0, H / 2], [0.0, 0.0, 1.0]])
    for scene in ("scene_a", "scene_b"):
        sd = root / scene
        os.makedirs(str(sd), exist_ok=True)
        with open(sd / "cam.txt", "w") as f:
            f.write("\n".join(",".join(map(str, row)) for row in k))
        for i in range(6):
            _write_png(sd / f"{i:07d}.jpg", _rand_rgb(rng))
        # depth GT for the val split (ValidationSet format)
        np.save(sd / f"{0:07d}.npy",
                rng.uniform(2, 40, (H, W)).astype(np.float32))
        for i in range(1, 6):
            np.save(sd / f"{i:07d}.npy",
                    rng.uniform(2, 40, (H, W)).astype(np.float32))
    with open(root / "train.txt", "w") as f:
        f.write("scene_a\n")
    with open(root / "val.txt", "w") as f:
        f.write("scene_b\n")
    return root


# ------------------------------------------------------------------- tests

def test_disp_cli_golden(ckpt_dir, eigen_dir, tmp_path):
    from cc_tpu.cli.test_disp import main
    out = tmp_path / "disp_out"
    errors = main([
        "--pretrained-dispnet", str(ckpt_dir / "dispnet_model_best.pth.tar"),
        "--pretrained-posenet",
        str(ckpt_dir / "poseexpnet_model_best.pth.tar"),
        "--posenet", "PoseExpNet", "--seq-length", "3",
        "--img-height", str(H), "--img-width", str(W),
        "--dataset-dir", str(eigen_dir),
        "--dataset-list", str(eigen_dir / "test_files.txt"),
        "--output-dir", str(out),
    ])
    assert errors.shape == (2, 7)
    assert np.all(np.isfinite(errors)), errors
    # abs_rel of an untrained net is bad but bounded; a1..a3 in [0,1]
    assert np.all(errors[:, 4:] >= 0) and np.all(errors[:, 4:] <= 1)
    pred = np.load(out / "predictions.npy")
    assert pred.shape == (1, H, W) and np.isfinite(pred).all()


def test_flow_cli_golden(ckpt_dir, kitti2015_dir, tmp_path):
    from cc_tpu.cli.test_flow import main
    out = tmp_path / "flow_out"
    avg, names = main([
        "--kitti-dir", str(kitti2015_dir),
        "--pretrained-disp", str(ckpt_dir / "dispnet_model_best.pth.tar"),
        "--pretrained-pose", str(ckpt_dir / "posenet_model_best.pth.tar"),
        "--pretrained-mask", str(ckpt_dir / "masknet_model_best.pth.tar"),
        "--pretrained-flow", str(ckpt_dir / "flownet_model_best.pth.tar"),
        "--img-height", str(H), "--img-width", str(W), "-N", "2",
        "--output-dir", str(out),
    ])
    assert len(avg) == 8 and len(names) == 8
    assert np.all(np.isfinite(avg)), dict(zip(names, avg))
    assert avg[0] > 0  # random nets can't have zero EPE vs random GT
    assert (out / "mask" / "000").with_suffix(".npy").exists()


def test_mask_cli_golden(ckpt_dir, kitti2015_dir, capsys):
    from cc_tpu.cli.test_mask import main
    main([
        "--kitti-dir", str(kitti2015_dir),
        "--pretrained-disp", str(ckpt_dir / "dispnet_model_best.pth.tar"),
        "--pretrained-pose", str(ckpt_dir / "posenet_model_best.pth.tar"),
        "--pretrained-mask", str(ckpt_dir / "masknet_model_best.pth.tar"),
        "--pretrained-flow", str(ckpt_dir / "flownet_model_best.pth.tar"),
        "--img-height", str(H), "--img-width", str(W), "-N", "2",
    ])
    txt = capsys.readouterr().out
    assert "Results Full Model" in txt and "Results Census only" in txt
    # every printed IoU must be a finite number in [0, 1]
    for line in txt.splitlines():
        if line.startswith("Errors"):
            vals = [float(tok) for tok in
                    line.replace("Errors", "").replace(",", " ").split()]
            assert all(np.isfinite(v) and 0 <= v <= 1 for v in vals), line


def test_submit_flow_cli_golden(ckpt_dir, kitti2015_dir, tmp_path):
    from cc_tpu.cli.submit_flow import main
    from cc_tpu.utils.flow_io import flow_read_flo, flow_read_png
    out = tmp_path / "submission"
    main([
        str(ckpt_dir), "--kitti-dir", str(kitti2015_dir),
        "--img-height", str(H), "--img-width", str(W), "-N", "2",
        "--output-dir", str(out),
    ])
    u, v, valid = flow_read_png(str(out / "testing" / "000000_10.png"))
    assert u.shape == (H, W) and np.isfinite(u).all() and np.isfinite(v).all()
    flo = flow_read_flo(str(out / "testing_flo" / "000000_10.flo"))
    assert flo.shape == (H, W, 2) and np.isfinite(flo).all()
    # png codec quantizes to 1/64 px: the two dumps must agree to that
    np.testing.assert_allclose(u, flo[..., 0], atol=1 / 64)


def test_train_cli_with_flow_gt_golden(ckpt_dir, kitti2015_dir, scenes_dir,
                                       tmp_path, monkeypatch):
    """One real epoch of the train CLI end-to-end: SequenceFolder data from
    disk, flow+depth validation from disk, checkpoint written."""
    monkeypatch.chdir(tmp_path)
    from cc_tpu.cli.train import main
    main([
        str(scenes_dir), "--name", "e2e_golden",
        "--epochs", "1", "--epoch-size", "2", "-b", "1", "-j", "0",
        "--height", str(H), "--width", str(W),
        "--sequence-length", "5", "--print-freq", "1",
        "--with-flow-gt", "--kitti-dir", str(kitti2015_dir),
        "--val-flow-height", str(H), "--val-flow-width", str(W),
        "--val-flow-N", "2",
        "--with-depth-gt",
        # edgeaware (the README default): 2nd-order "regular" smoothness
        # needs >=3px per axis but the 6th pyramid level at 64x128 is 2x4
        # (mean of an empty slice -> nan, same as the reference there)
        "--smoothness-type", "edgeaware", "-wssim", "0.3",
        "-m", "0.1", "-c", "0.3",
    ])
    save = tmp_path / "checkpoints" / "e2e_golden"
    assert save.exists()
    summary = (save / "progress_log_summary.csv").read_text().strip()
    lines = summary.splitlines()
    assert len(lines) >= 2  # header + 1 epoch
    train_loss, decisive = map(float, lines[1].split("\t")[:2])
    assert np.isfinite(train_loss) and np.isfinite(decisive)
