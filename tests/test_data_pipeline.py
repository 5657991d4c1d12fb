"""Data pipeline tests: joint transforms (intrinsics consistency), threaded
loader, flow I/O codecs, dataset formats."""
import os

import numpy as np
import pytest

from cc_tpu.data import transforms
from cc_tpu.data.loader import DataLoader, collate
from cc_tpu.utils.flow_io import (flow_read_flo, flow_read_png,
                                  flow_write_flo, flow_write_png)


def rng(seed=0):
    return np.random.default_rng(seed)


def make_images(n=3, h=32, w=48, seed=0):
    r = np.random.RandomState(seed)
    imgs = [(r.rand(h, w, 3) * 255).astype(np.float32) for _ in range(n)]
    # asymmetric principal point so a flip visibly changes cx
    k = np.array([[w * 1.1, 0, w / 2 + 3], [0, h * 1.1, h / 2 + 2],
                  [0, 0, 1]], np.float32)
    return imgs, k


class TestTransforms:
    def test_flip_updates_cx(self):
        imgs, k = make_images()
        # force the flip branch by trying seeds until one flips
        t = transforms.RandomHorizontalFlip()
        for seed in range(20):
            out, k2 = t(imgs, k, rng(seed))
            if not np.allclose(k2, k):
                assert k2[0, 2] == imgs[0].shape[1] - k[0, 2]
                np.testing.assert_allclose(out[0][:, ::-1], imgs[0])
                return
        pytest.fail("flip never triggered")

    def test_scale_crop_shapes_and_intrinsics(self):
        imgs, k = make_images()
        t = transforms.RandomScaleCrop()
        out, k2 = t(imgs, k, rng(3))
        for im in out:
            assert im.shape == imgs[0].shape
        assert k2[0, 0] >= k[0, 0] and k2[1, 1] >= k[1, 1]

    def test_scale_deterministic(self):
        imgs, k = make_images()
        t = transforms.Scale(16, 24)
        out, k2 = t(imgs, k)
        assert out[0].shape == (16, 24, 3)
        np.testing.assert_allclose(k2[0, 0], k[0, 0] * 24 / 48, rtol=1e-6)
        np.testing.assert_allclose(k2[1, 1], k[1, 1] * 16 / 32, rtol=1e-6)

    def test_normalize(self):
        imgs, k = make_images()
        pipe = transforms.Compose([transforms.ToFloat(),
                                   transforms.Normalize()])
        out, _ = pipe(imgs, k, rng(0))
        assert out[0].min() >= -1.0 - 1e-6 and out[0].max() <= 1.0 + 1e-6

    def test_normalize_locally(self):
        imgs, k = make_images()
        pipe = transforms.Compose([transforms.ToFloat(),
                                   transforms.NormalizeLocally()])
        out, _ = pipe(imgs, k, rng(0))
        stack = np.stack(out)
        np.testing.assert_allclose(
            stack.reshape(-1, 3).mean(0), 0.0, atol=1e-5)

    def test_train_transform_full_pipeline(self):
        imgs, k = make_images()
        pipe = transforms.train_transform()
        out, k2 = pipe(imgs, k, rng(1))
        assert out[0].shape == imgs[0].shape
        assert np.isfinite(k2).all()


class TestLoader:
    class FakeDataset:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return {"x": np.full((4, 4), i, np.float32),
                    "y": np.int32(i)}

    def test_batching_drop_last(self):
        loader = DataLoader(self.FakeDataset(), batch_size=4,
                            num_workers=2)
        batches = list(loader)
        assert len(batches) == 5
        assert batches[0]["x"].shape == (4, 4, 4)

    def test_shuffle_deterministic_per_seed(self):
        loader = DataLoader(self.FakeDataset(), batch_size=4, shuffle=True,
                            num_workers=2, seed=7)
        ys1 = np.concatenate([b["y"] for b in loader])
        loader2 = DataLoader(self.FakeDataset(), batch_size=4, shuffle=True,
                             num_workers=2, seed=7)
        ys2 = np.concatenate([b["y"] for b in loader2])
        np.testing.assert_array_equal(ys1, ys2)
        assert not np.all(ys1 == np.arange(20))

    def test_collate(self):
        out = collate([{"a": np.zeros(3)}, {"a": np.ones(3)}])
        assert out["a"].shape == (2, 3)


class TestFlowIO:
    def test_png_roundtrip(self, tmp_path):
        r = np.random.RandomState(0)
        u = np.round(r.uniform(-50, 50, (20, 30)) * 64) / 64
        v = np.round(r.uniform(-50, 50, (20, 30)) * 64) / 64
        valid = (r.rand(20, 30) > 0.5).astype(np.uint16)
        p = str(tmp_path / "flow.png")
        flow_write_png(p, u, v, valid)
        u2, v2, valid2 = flow_read_png(p)
        np.testing.assert_allclose(u, u2, atol=1 / 64)
        np.testing.assert_allclose(v, v2, atol=1 / 64)
        np.testing.assert_array_equal(valid, valid2)

    def test_flo_roundtrip(self, tmp_path):
        r = np.random.RandomState(1)
        flow = r.randn(16, 24, 2).astype(np.float32)
        p = str(tmp_path / "flow.flo")
        flow_write_flo(p, flow)
        np.testing.assert_allclose(flow_read_flo(p), flow, atol=0)


class TestSequenceFolder:
    def test_crawl_and_load(self, tmp_path):
        import cv2
        root = str(tmp_path)
        for scene in ("scene_a", "scene_b"):
            d = os.path.join(root, scene)
            os.makedirs(d)
            with open(os.path.join(d, "cam.txt"), "w") as f:
                f.write("100.,0.,24.,0.,100.,16.,0.,0.,1.")
            for i in range(6):
                img = (np.random.RandomState(i).rand(32, 48, 3) * 255
                       ).astype(np.uint8)
                cv2.imwrite(os.path.join(d, f"{i:07d}.jpg"), img)
        with open(os.path.join(root, "train.txt"), "w") as f:
            f.write("scene_a\nscene_b\n")

        from cc_tpu.data import SequenceFolder
        ds = SequenceFolder(root, seed=0, train=True, sequence_length=5,
                            transform=transforms.valid_transform())
        assert len(ds) == 4  # 2 scenes x (6 - 4) targets
        s = ds[0]
        assert s["tgt"].shape == (32, 48, 3)
        assert s["refs"].shape == (4, 32, 48, 3)
        np.testing.assert_allclose(
            s["intrinsics"] @ s["intrinsics_inv"], np.eye(3), atol=1e-5)
