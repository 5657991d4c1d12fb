"""C++ data-plane parity: the native decode+augment pipeline must produce
the SAME samples as the pure-Python transform chain for the same
(seed, epoch, index) — identical cv2 ops with identically drawn parameters.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np
import pytest

from cc_tpu import native

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="C++ data plane unavailable")

H, W = 96, 160


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("scenes")
    rng = np.random.default_rng(0)
    k = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    for scene in ("s0",):
        d = root / scene
        os.makedirs(str(d), exist_ok=True)
        with open(d / "cam.txt", "w") as f:
            f.write("\n".join(",".join(map(str, r)) for r in k))
        for i in range(7):
            img = cv2.GaussianBlur(
                rng.integers(0, 255, (H, W, 3), np.uint8), (7, 7), 2)
            cv2.imwrite(str(d / f"{i:07d}.jpg"), img)
    with open(root / "train.txt", "w") as f:
        f.write("s0\n")
    with open(root / "val.txt", "w") as f:
        f.write("s0\n")
    return root


@pytest.mark.parametrize("normalize", ["global", "local"])
@pytest.mark.parametrize("with_rotation", [True, False])
def test_train_pipeline_parity(scene_dir, normalize, with_rotation):
    from cc_tpu.data.native_pipeline import NativeTrainPipeline
    from cc_tpu.data.sequence_folders import SequenceFolder

    pipe = NativeTrainPipeline(normalize, with_rotation=with_rotation)
    ds_native = SequenceFolder(str(scene_dir), seed=7, train=True,
                               sequence_length=5, transform=pipe)
    ds_python = SequenceFolder(str(scene_dir), seed=7, train=True,
                               sequence_length=5, transform=pipe.fallback)
    assert len(ds_native) == len(ds_python) > 0
    for epoch in (0, 1):
        ds_native.set_epoch(epoch)
        ds_python.set_epoch(epoch)
        for idx in range(min(3, len(ds_native))):
            a = ds_native[idx]
            b = ds_python[idx]
            # decode/flip/downscale-resize are bit-identical; the rotation
            # warp and non-integer upscale differ at interpolation-precision
            # level between the Python cv2 5.x wheel and system OpenCV 4.6
            # (see dataplane.cpp); local norm adds fp32-vs-double stat noise
            tol = 2e-4 if (with_rotation or normalize == "local") else 5e-5
            np.testing.assert_allclose(a["tgt"], b["tgt"], atol=tol)
            np.testing.assert_allclose(a["refs"], b["refs"], atol=tol)
            np.testing.assert_allclose(a["intrinsics"], b["intrinsics"],
                                       rtol=1e-6)


def test_valid_pipeline_parity(scene_dir):
    from cc_tpu.data.native_pipeline import NativeValidPipeline, \
        process_sample
    from cc_tpu.data import transforms
    from cc_tpu.data.sequence_folders import load_image

    path = str(scene_dir / "s0" / "0000002.jpg")
    k = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32)
    pipe = NativeValidPipeline(64, 128)
    aug, k_n = pipe.draw(None, H, W, k)
    out = process_sample(native.lib(), [path], aug, 64, 128)

    imgs, k_p = transforms.valid_flow_transform(64, 128)(
        [load_image(path)], np.copy(k))
    np.testing.assert_allclose(out[0], imgs[0], atol=0)
    np.testing.assert_allclose(k_n, k_p, rtol=1e-6)


def test_missing_file_raises(scene_dir):
    from cc_tpu.data.native_pipeline import NativeValidPipeline, \
        process_sample
    pipe = NativeValidPipeline(0, 0)
    aug, _ = pipe.draw(None, H, W, None)
    with pytest.raises(FileNotFoundError):
        process_sample(native.lib(), [str(scene_dir / "nope.jpg")], aug,
                       H, W)


def test_pool_matches_sync(scene_dir):
    """The C++ worker pool produces the same buffers as direct calls."""
    from cc_tpu.data.native_pipeline import NativeValidPipeline, \
        process_sample
    lib = native.lib()
    pipe = NativeValidPipeline(64, 128)
    aug, _ = pipe.draw(None, H, W, None)
    paths = [str(scene_dir / "s0" / f"{i:07d}.jpg") for i in range(7)]

    pool = lib.dp_pool_create(3)
    outs, tickets = [], []
    try:
        for p in paths:
            blob = p.encode() + b"\0"
            out = np.empty((1, 64, 128, 3), np.float32)
            t = lib.dp_pool_submit(
                pool, blob, len(blob), 1, ctypes.byref(aug),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            outs.append(out)
            tickets.append(t)
        for t in tickets:
            assert lib.dp_pool_wait(pool, t) == 0
    finally:
        lib.dp_pool_destroy(pool)

    for p, out in zip(paths, outs):
        ref = process_sample(lib, [p], aug, 64, 128)
        np.testing.assert_array_equal(out, ref)


def test_native_rejects_mismatched_dimensions(tmp_path):
    """A ref frame with different dims must fail cleanly (ValueError), not
    read out of bounds or throw a C++ exception across the ctypes
    boundary (dataplane.cpp dimension check + extern-C try/catch)."""
    import cv2
    import numpy as np
    import pytest
    from cc_tpu import native
    from cc_tpu.data.native_pipeline import NativeTrainPipeline

    if native.lib() is None:
        pytest.skip("native plane unavailable")
    a, b = str(tmp_path / "a.jpg"), str(tmp_path / "b.jpg")
    cv2.imwrite(a, np.zeros((32, 48, 3), np.uint8))
    cv2.imwrite(b, np.zeros((16, 48, 3), np.uint8))
    tf = NativeTrainPipeline("global", with_rotation=True)
    with pytest.raises(ValueError, match="different dimensions"):
        tf.process([a, b], np.random.default_rng(0), 32, 48, np.eye(3))
    out = tf.process([a, a], np.random.default_rng(0), 32, 48, np.eye(3))
    assert out is not None and out[0].shape == (2, 32, 48, 3)


def test_native_rejects_stale_dim_cache(tmp_path):
    """If the caller's (in_h, in_w) expectation doesn't match the decoded
    target image — a stale per-scene dim cache — the native plane must
    refuse BEFORE any aug math or output write (ADVICE r2 medium: the
    no-resize valid path previously trusted the Python-side allocation)."""
    import cv2
    from cc_tpu.data.native_pipeline import NativeTrainPipeline, \
        NativeValidPipeline

    a = str(tmp_path / "a.jpg")
    cv2.imwrite(a, np.zeros((32, 48, 3), np.uint8))
    # train path: wrong expected dims -> ValueError naming the invariant
    tf = NativeTrainPipeline("global", with_rotation=False)
    with pytest.raises(ValueError, match="uniform per scene"):
        tf.process([a], np.random.default_rng(0), 64, 48, np.eye(3))
    # no-resize valid path: out buffer is sized from the expectation; the
    # mismatch must be rejected, never silently written past
    vf = NativeValidPipeline(0, 0)
    with pytest.raises(ValueError, match="uniform per scene"):
        vf.process([a], np.random.default_rng(0), 64, 96, None)
