"""Metric parity: cc_tpu eval CLIs vs the REFERENCE's own eval CLIs, run
in-process on CPU, on identical fabricated datasets and identical
(fresh-init reference torch) checkpoints.

This is the BASELINE.md north star made executable: "abs-rel (depth) and
EPE (flow) within 1e-3 of the reference". The golden tests
(test_cli_golden*.py) prove each CLI runs end-to-end; these tests prove the
NUMBERS match the reference implementation (test_disp.py:140-152,
test_flow.py:145-188) to tolerance.

The reference side runs through tests/ref_cli_oracle.py (era-dependency
shims, CPU patches, stdout capture).
"""
from __future__ import annotations

import numpy as np
import pytest

from tests.ref_compat import reference_available
# session fixtures reused from the golden tests (fabricated KITTI trees +
# fresh-init reference checkpoints)
from tests.test_cli_golden import (  # noqa: F401
    H, W, ckpt_dir, eigen_dir, _rand_rgb, _ref_models, _write_png)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference/torch unavailable")

TOL = dict(rtol=1e-3, atol=1e-3)

# the reference's test_flow.py hardcodes the 256x832 flow-eval resolution
# (test_flow.py:77); images fabricated AT that size keep its imresize-based
# Scale an identity, so the oracle exercises model+metric numerics, not
# resampling-library differences.
FH, FW = 256, 832


@pytest.fixture(scope="session")
def kitti2015_832_dir(tmp_path_factory):
    """KITTI2015 scene-flow tree at the reference's native 256x832 eval
    resolution (2 training samples, 5 multiview frames each)."""
    from cc_tpu.utils.flow_io import flow_write_png

    root = tmp_path_factory.mktemp("kitti2015_832")
    rng = np.random.default_rng(7)
    for idx in range(2):
        i6 = str(idx).zfill(6)
        mv = root / "data_scene_flow_multiview" / "training" / "image_2"
        for frame in range(8, 13):
            img = _rand_rgb(rng, FH, FW)
            img[0, 0] = 0    # pin min/max so the reference's float-input
            img[0, 1] = 255  # imresize (toimage bytescale) is an identity
            _write_png(mv / f"{i6}_{str(frame).zfill(2)}.png", img)
        calib = root / "data_scene_flow_calib" / "training" \
            / "calib_cam_to_cam" / f"{i6}.txt"
        import os
        os.makedirs(os.path.dirname(str(calib)), exist_ok=True)
        k = [250.0, 0.0, FW / 2, 0.0,
             0.0, 250.0, FH / 2, 0.0,
             0.0, 0.0, 1.0, 0.0]
        with open(calib, "w") as f:
            f.write("P_rect_02: " + " ".join(map(str, k)) + "\n")
        u = rng.uniform(-10, 10, (FH, FW))
        v = rng.uniform(-5, 5, (FH, FW))
        fo = root / "data_scene_flow" / "training" / "flow_occ"
        os.makedirs(str(fo), exist_ok=True)
        flow_write_png(str(fo / f"{i6}_10.png"), u, v)
        obj = np.zeros((FH, FW), np.uint8)
        obj[FH // 2:, FW // 2:] = 1
        _write_png(root / "data_scene_flow" / "training" / "obj_map"
                   / f"{i6}_10.png", obj)
        sem = np.full((FH, FW), 7, np.uint8)
        sem[FH // 2:, :] = 26
        _write_png(root / "semantic_labels" / "training" / "semantic"
                   / f"{i6}_10.png", sem)
    return root


def test_disp_metric_parity(ckpt_dir, eigen_dir):
    """Same DispResNet6+PoseExpNet ckpt, same Eigen tree: all 2x7 depth
    metrics must match the reference's test_disp.py."""
    from cc_tpu.cli.test_disp import main as my_main
    from tests.ref_cli_oracle import parse_metric_rows, run_reference_cli

    common = [
        "--pretrained-dispnet", str(ckpt_dir / "dispnet_model_best.pth.tar"),
        "--pretrained-posenet",
        str(ckpt_dir / "poseexpnet_model_best.pth.tar"),
        "--img-height", str(H), "--img-width", str(W),
        "--dataset-dir", str(eigen_dir),
        "--dataset-list", str(eigen_dir / "test_files.txt"),
    ]
    mine = my_main(common + ["--posenet", "PoseExpNet", "--seq-length", "3"])
    out = run_reference_cli("test_disp", common)
    rows = parse_metric_rows(out, 7)
    assert len(rows) == 2, out
    # row order in both: [posenet-scaled, median-scaled]
    np.testing.assert_allclose(mine[0], rows[0], **TOL)
    np.testing.assert_allclose(mine[1], rows[1], **TOL)


def test_flow_metric_parity(ckpt_dir, kitti2015_832_dir):
    """Same 4-net checkpoints, same KITTI2015 tree at 256x832: all 8
    composite-flow EPE/Fl metrics must match the reference's test_flow.py
    (the full 4-net rigidity/census/composite pipeline)."""
    from cc_tpu.cli.test_flow import main as my_main
    from tests.ref_cli_oracle import parse_metric_rows, run_reference_cli

    ckpts = [
        "--pretrained-disp", str(ckpt_dir / "dispnet_model_best.pth.tar"),
        "--pretrained-pose", str(ckpt_dir / "posenet_model_best.pth.tar"),
        "--pretrained-mask", str(ckpt_dir / "masknet_model_best.pth.tar"),
        "--pretrained-flow", str(ckpt_dir / "flownet_model_best.pth.tar"),
    ]
    mine, names = my_main(ckpts + ["--kitti-dir", str(kitti2015_832_dir),
                                   "-N", "2"])
    out = run_reference_cli(
        "test_flow", ckpts + ["--kitti-dir", str(kitti2015_832_dir)],
        n_samples=2)
    rows = parse_metric_rows(out, 8)
    assert len(rows) == 1, out
    np.testing.assert_allclose(np.asarray(mine), rows[0], **TOL)
