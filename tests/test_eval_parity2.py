"""Metric/artifact parity for the LAST three reference CLIs without an
oracle pair (VERDICT r3 missing #5): test_make3d, run_inference,
mnist_eval. Same pattern as tests/test_eval_parity.py — the reference's
own CLI runs in-process on CPU (tests/ref_cli_oracle.py shims) on the same
fabricated data and the same weights as the cc_tpu CLI, and the outputs
must match. With these, all 11 runnable reference CLIs are oracle-paired
(test_flownetc is broken in the reference itself).
"""
from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from tests.ref_compat import reference_available
from tests.cli_fixtures import ckpt_dir  # noqa: F401  (session fixture)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference/torch unavailable")


# ---------------------------------------------------------------- make3d

@pytest.fixture(scope="session")
def make3d_dir(tmp_path_factory):
    """Fabricated Make3D tree: Test134/*.jpg at the dataset's native 2272
    image rows (the reference center-crops rows 710:1562 with hardcoded
    constants, test_make3d.py:50-63) + Gridlaserdata/*.mat with
    Position3DGrid[..., 3] depth on the 55-row laser grid. 62 samples so
    the protocol's corrupted-file pop(61) (test_make3d.py:46-47) has its
    index to remove.

    Content choices that keep the oracle about protocol+model, not codec
    noise: R=G=B pixels (no chroma subsampling in the JPEG), Gaussian-smooth
    texture (negligible DCT ringing), and an 8x8 black + white patch inside
    the cropped rows so the decoded crop spans exactly [0, 255] — the
    reference's float-input imresize (scipy bytescale) is then an identity
    requantization."""
    import cv2
    from scipy.io import savemat

    root = tmp_path_factory.mktemp("make3d")
    rng = np.random.default_rng(21)
    ih, iw = 2272, 96
    os.makedirs(str(root / "Test134"))
    os.makedirs(str(root / "Gridlaserdata"))
    for i in range(62):
        g = cv2.GaussianBlur(
            rng.integers(30, 220, (ih, iw), np.uint8), (31, 31), 9)
        g[800:808, 40:48] = 0
        g[900:908, 40:48] = 255
        img = np.repeat(g[..., None], 3, axis=2)
        cv2.imwrite(str(root / "Test134" / f"img-{i:03d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        depth = rng.uniform(2.0, 60.0, (55, 40)).astype(np.float64)
        depth[0, 0] = 0.0          # below min_depth -> masked
        depth[-1, -1] = 75.0       # above max_depth -> masked
        grid = np.zeros((55, 40, 4))
        grid[..., 3] = depth
        savemat(str(root / "Gridlaserdata" / f"depth_sph-{i:03d}.mat"),
                {"Position3DGrid": grid})
    return root


def test_make3d_metric_parity(ckpt_dir, make3d_dir):  # noqa: F811
    """Same DispResNet6 checkpoint, same Make3D tree: the 7 depth metrics
    (abs_rel..a3, make3d's log10 variant) must match the reference's
    test_make3d.py. The input resize runs PIL-bilinear there vs cv2 here
    and the pred->laser-grid zoom runs scipy spline vs cv2 — legitimately
    different resampling kernels, so (as in test_disp's through-resize
    oracle) the assertion pins relative metric agreement at 2%, not 1e-3;
    protocol structure (2272-row crop, mask, median scaling, the popped
    corrupted sample) and metric formulas are what this oracle checks."""
    from cc_tpu.cli.test_make3d import main as my_main
    from tests.ref_cli_oracle import parse_metric_rows, run_reference_cli

    args = ["--pretrained-dispnet",
            str(ckpt_dir / "dispnet_model_best.pth.tar"),
            "--dataset-dir", str(make3d_dir),
            "--img-height", "64", "--img-width", "64"]
    mine = np.asarray(my_main(args))
    out = run_reference_cli("test_make3d", args)
    rows = parse_metric_rows(out, 7)
    assert len(rows) == 1, out
    worst = float(np.max(np.abs(mine - rows[0])
                         / (np.abs(rows[0]) + 1e-6)))
    print(f"\nmake3d parity: worst relative metric delta {worst:.4f}")
    np.testing.assert_allclose(mine, rows[0], rtol=2e-2, atol=2e-2)


# ----------------------------------------------------------- run_inference

def test_run_inference_artifact_parity(tmp_path):
    """Same DispNetS checkpoint, same input pngs at the exact inference
    size (no resize branch -> no resampling-library delta): the written
    _disp/_depth colormap images must match the reference's
    run_inference.py pixel-for-pixel up to colormap-LUT rounding at fp32
    forward-noise edges (<=2 uint8 counts on <1% of pixels)."""
    import cv2
    import torch

    from cc_tpu.cli.run_inference import main as my_main
    from tests.cli_fixtures import _ref_models, _write_png
    from tests.ref_cli_oracle import run_reference_cli

    h, w = 64, 128
    ref_models = _ref_models()
    torch.manual_seed(3)
    ckpt = tmp_path / "dispnets.pth.tar"
    torch.save({"epoch": 0, "state_dict": ref_models.DispNetS().state_dict()},
               str(ckpt))

    rng = np.random.default_rng(5)
    img_dir = tmp_path / "imgs"
    for i in range(2):
        _write_png(img_dir / f"{i:07d}.png",
                   rng.integers(0, 255, (h, w, 3), dtype=np.uint8))

    my_out, ref_out = tmp_path / "mine", tmp_path / "ref"
    common = ["--pretrained", str(ckpt), "--dataset-dir", str(img_dir),
              "--output-disp", "--output-depth",
              "--img-height", str(h), "--img-width", str(w)]
    my_main(common + ["--output-dir", str(my_out)])
    run_reference_cli("run_inference", common + ["--output-dir",
                                                 str(ref_out)])

    names = sorted(os.listdir(str(ref_out)))
    assert names == sorted(os.listdir(str(my_out)))
    assert len(names) == 4  # 2 inputs x {disp, depth}
    for name in names:
        a = cv2.imread(str(my_out / name))
        b = cv2.imread(str(ref_out / name))
        assert a is not None and b is not None and a.shape == b.shape
        diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
        assert diff.max() <= 2, (name, diff.max())
        assert (diff > 0).mean() < 0.01, (name, (diff > 0).mean())


# -------------------------------------------------------------- mnist_eval

def _torch_lenet_to_flax(sd):
    """Reference-LeNet torch state_dict -> cc_tpu flax LeNet params.
    Convs go OIHW->HWIO; fc1's input flatten order differs (torch flattens
    NCHW c*25+h*5+w, flax NHWC h*200+w*40+c) so its weight matrix is
    permuted through a [o,c,h,w]->[h,w,c,o] reshape."""
    def t(x):
        return np.asarray(x.detach().cpu().numpy())

    fc1 = t(sd["fc1.weight"]).reshape(40, 40, 5, 5)  # [out, c, h, w]
    return {
        "Conv_0": {"kernel": t(sd["conv1.weight"]).transpose(2, 3, 1, 0),
                   "bias": t(sd["conv1.bias"])},
        "Conv_1": {"kernel": t(sd["conv2.weight"]).transpose(2, 3, 1, 0),
                   "bias": t(sd["conv2.bias"])},
        "Dense_0": {"kernel": fc1.transpose(2, 3, 1, 0).reshape(1000, 40),
                    "bias": t(sd["fc1.bias"])},
        "Dense_1": {"kernel": t(sd["fc2.weight"]).T,
                    "bias": t(sd["fc2.bias"])},
    }


@pytest.fixture(scope="session")
def mnist_oracle_data(tmp_path_factory):
    """Raw-idx MNIST + .mat SVHN test splits (the torchvision-layout files
    both the cc_tpu loaders and the oracle's torchvision shim read)."""
    from scipy.io import savemat

    root = tmp_path_factory.mktemp("mnist_oracle")
    rng = np.random.default_rng(13)
    d = root / "mnist"
    os.makedirs(str(d))
    n = 64
    imgs = rng.integers(0, 255, (n, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, n, dtype=np.uint8)
    with open(d / "t10k-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28))
        f.write(imgs.tobytes())
    with open(d / "t10k-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">II", 2049, n))
        f.write(labels.tobytes())
    os.makedirs(str(root / "svhn"))
    x = rng.integers(0, 255, (32, 32, 3, n), dtype=np.uint8)
    y = rng.integers(1, 11, (n, 1), dtype=np.uint8)
    savemat(str(root / "svhn" / "test_32x32.mat"), {"X": x, "y": y})
    return root


def test_mnist_eval_metric_parity(mnist_oracle_data, tmp_path):
    """Same Alice/Bob/Moderator weights, same MNIST+SVHN test files: the
    moderator-gated total / alice / bob error rates on the MNIST, SVHN and
    concatenated splits must match the reference's mnist_eval.py exactly
    (accuracies are argmax counts over identical logit computations; the
    error quantum at N=64 is 1/64, far above fp32 forward noise)."""
    import importlib

    import jax
    import orbax.checkpoint as ocp
    import torch

    from cc_tpu.cli.mnist_eval import main as my_main
    from cc_tpu.mnist import MnistConfig, init_mnist_state
    from tests.ref_cli_oracle import (install_shims, parse_metric_rows,
                                      run_reference_cli)

    # fabricate the three torch nets with the reference CLI's own LeNet
    install_shims()
    ref_mod = importlib.import_module("mnist_eval")
    torch.manual_seed(11)
    nets = {"alice": ref_mod.LeNet(), "bob": ref_mod.LeNet(),
            "mod": ref_mod.LeNet(nout=1)}
    paths = {}
    for name, net in nets.items():
        paths[name] = str(tmp_path / f"{name}.pth.tar")
        torch.save({"state_dict": net.state_dict()}, paths[name])

    # same weights into the cc_tpu orbax checkpoint format
    state = init_mnist_state(MnistConfig(), jax.random.PRNGKey(0))
    state = state.replace(params={
        name: _torch_lenet_to_flax(net.state_dict())
        for name, net in nets.items()})
    ck = str(tmp_path / "mnist_ck")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ck, jax.device_get(state))
    ckptr.wait_until_finished()

    mine = {}
    for split in ("mnist", "svhn", "both"):
        errs = np.asarray(my_main([str(mnist_oracle_data),
                                   "--checkpoint", ck, "-b", "16",
                                   "--dataset", split]), np.float64)
        mine[split] = 100.0 * errs  # reference prints 100*error

    out = run_reference_cli("mnist_eval", [
        str(mnist_oracle_data),
        "--pretrained-alice", paths["alice"],
        "--pretrained-bob", paths["bob"],
        "--pretrained-mod", paths["mod"],
        "-b", "16", "-j", "0"])
    rows = parse_metric_rows(out, 3)  # [mnist, svhn, total] x (tot, a, b)
    assert len(rows) == 3, out
    np.testing.assert_allclose(mine["mnist"], rows[0], atol=1e-3)
    np.testing.assert_allclose(mine["svhn"], rows[1], atol=1e-3)
    np.testing.assert_allclose(mine["both"], rows[2], atol=1e-3)
