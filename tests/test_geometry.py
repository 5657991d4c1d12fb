"""Geometry core tests: self-contained invariants + parity vs the reference."""
import numpy as np
import pytest
import jax.numpy as jnp

from cc_tpu.geometry import (
    euler2mat, quat2mat, pose_vec2mat, pixel2cam, grid_sample, flow_warp,
    inverse_warp, pose2flow, flow2oob,
)
from tests.ref_compat import (
    reference_available, load_reference, to_torch_nchw, from_torch_nchw,
)

RTOL, ATOL = 1e-5, 1e-5


def rng(seed=0):
    return np.random.RandomState(seed)


class TestRotations:
    def test_euler2mat_is_rotation(self):
        angles = jnp.asarray(rng().uniform(-0.3, 0.3, (8, 3)).astype(np.float32))
        R = np.asarray(euler2mat(angles))
        eye = np.eye(3)[None].repeat(8, 0)
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)

    def test_euler2mat_zero_is_identity(self):
        R = np.asarray(euler2mat(jnp.zeros((2, 3))))
        np.testing.assert_allclose(R, np.eye(3)[None].repeat(2, 0), atol=1e-7)

    def test_euler2mat_single_axis(self):
        # rz-only must equal the textbook Rz (with the reference's sign layout).
        a = 0.25
        R = np.asarray(euler2mat(jnp.asarray([[0.0, 0.0, a]])))[0]
        exp = np.array([[np.cos(a), -np.sin(a), 0],
                        [np.sin(a), np.cos(a), 0],
                        [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, exp, atol=1e-6)

    def test_quat2mat_is_rotation(self):
        q = jnp.asarray(rng(1).uniform(-0.2, 0.2, (8, 3)).astype(np.float32))
        R = np.asarray(quat2mat(q))
        eye = np.eye(3)[None].repeat(8, 0)
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)

    def test_pose_vec2mat_layout(self):
        vec = jnp.asarray(rng(2).uniform(-0.1, 0.1, (4, 6)).astype(np.float32))
        T = np.asarray(pose_vec2mat(vec))
        assert T.shape == (4, 3, 4)
        np.testing.assert_allclose(T[:, :, 3], np.asarray(vec)[:, :3], atol=1e-7)


class TestGridSample:
    def test_identity_warp(self):
        img = jnp.asarray(rng(3).rand(2, 8, 12, 3).astype(np.float32))
        flow = jnp.zeros((2, 8, 12, 2))
        out = np.asarray(flow_warp(img, flow))
        np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)

    def test_integer_shift(self):
        img = jnp.asarray(rng(4).rand(1, 6, 10, 2).astype(np.float32))
        flow = jnp.ones((1, 6, 10, 2)) * jnp.asarray([1.0, 0.0])
        out = np.asarray(flow_warp(img, flow))
        np.testing.assert_allclose(out[0, :, :-1], np.asarray(img)[0, :, 1:],
                                   atol=1e-6)

    def test_zeros_padding_oob(self):
        img = jnp.ones((1, 6, 6, 3))
        flow = jnp.full((1, 6, 6, 2), 100.0)
        out = np.asarray(flow_warp(img, flow, padding_mode="zeros"))
        np.testing.assert_allclose(out, 0.0, atol=0)

    def test_border_padding_oob(self):
        img = jnp.asarray(rng(5).rand(1, 6, 6, 3).astype(np.float32))
        flow = jnp.full((1, 6, 6, 2), 100.0)
        out = np.asarray(flow_warp(img, flow, padding_mode="border"))
        corner = np.broadcast_to(np.asarray(img)[0, -1, -1], out.shape)
        np.testing.assert_allclose(out, corner, atol=1e-6)

    @pytest.mark.parametrize("padding", ["zeros", "border"])
    def test_img4_flat_mode_bit_identical(self, padding, monkeypatch):
        """CC_TPU_IMG4=flat (gather operand/output kept flat, weights
        flattened instead of taps) must be bit-identical to the default
        packed form — same taps, same fp32 accumulation order."""
        import jax

        from cc_tpu.geometry import sampling

        r = rng(11)
        img = jnp.asarray(r.rand(2, 9, 13, 3).astype(np.float32))
        grid = jnp.asarray(
            r.uniform(-1.3, 1.3, (2, 7, 10, 2)).astype(np.float32))

        def run():
            out = np.asarray(grid_sample(img, grid, padding_mode=padding))
            g = np.asarray(jax.grad(
                lambda i: grid_sample(i, grid, padding_mode=padding).sum()
            )(img))
            return out, g

        monkeypatch.setattr(sampling, "_IMG4_FLAT", False)
        out_p, g_p = run()
        monkeypatch.setattr(sampling, "_IMG4_FLAT", True)
        out_f, g_f = run()
        np.testing.assert_array_equal(out_f, out_p)
        np.testing.assert_array_equal(g_f, g_p)

    @pytest.mark.skipif(not reference_available(), reason="no reference")
    @pytest.mark.parametrize("padding", ["zeros", "border"])
    def test_parity_grid_sample(self, padding):
        import torch
        r = rng(6)
        img = r.rand(2, 9, 13, 3).astype(np.float32)
        grid = r.uniform(-1.3, 1.3, (2, 9, 13, 2)).astype(np.float32)
        ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                      padding_mode=padding))
        load_reference()
        theirs = torch.nn.functional.grid_sample(
            to_torch_nchw(img), torch.from_numpy(grid),
            padding_mode=padding, align_corners=True)
        np.testing.assert_allclose(ours, from_torch_nchw(theirs),
                                   rtol=RTOL, atol=ATOL)


@pytest.mark.skipif(not reference_available(), reason="no reference")
class TestReferenceParity:
    def setup_method(self):
        self.ref_iw, _, _ = load_reference()

    def _random_scene(self, b=2, h=16, w=24, seed=7):
        r = rng(seed)
        img = r.rand(b, h, w, 3).astype(np.float32)
        depth = (r.rand(b, h, w).astype(np.float32) * 5 + 1)
        pose = (r.uniform(-0.05, 0.05, (b, 6))).astype(np.float32)
        K = np.array([[w * 1.2, 0, w / 2], [0, h * 1.2, h / 2], [0, 0, 1]],
                     dtype=np.float32)[None].repeat(b, 0)
        K_inv = np.linalg.inv(K)
        return img, depth, pose, K, K_inv

    def test_pose_vec2mat_parity(self):
        import torch
        vec = rng(8).uniform(-0.5, 0.5, (4, 6)).astype(np.float32)
        ours = np.asarray(pose_vec2mat(jnp.asarray(vec)))
        theirs = self.ref_iw.pose_vec2mat(torch.from_numpy(vec)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)
        ours_q = np.asarray(pose_vec2mat(jnp.asarray(vec), "quat"))
        theirs_q = self.ref_iw.pose_vec2mat(torch.from_numpy(vec), "quat").numpy()
        np.testing.assert_allclose(ours_q, theirs_q, rtol=RTOL, atol=ATOL)

    @pytest.mark.parametrize("padding", ["zeros", "border"])
    def test_inverse_warp_parity(self, padding):
        import torch
        img, depth, pose, K, K_inv = self._random_scene()
        ours = np.asarray(inverse_warp(
            jnp.asarray(img), jnp.asarray(depth), jnp.asarray(pose),
            jnp.asarray(K), jnp.asarray(K_inv), padding_mode=padding))
        theirs = self.ref_iw.inverse_warp(
            to_torch_nchw(img), torch.from_numpy(depth),
            torch.from_numpy(pose), torch.from_numpy(K),
            torch.from_numpy(K_inv), padding_mode=padding)
        np.testing.assert_allclose(ours, from_torch_nchw(theirs),
                                   rtol=1e-4, atol=1e-4)

    def test_pose2flow_parity(self):
        import torch
        _, depth, pose, K, K_inv = self._random_scene(seed=9)
        ours = np.asarray(pose2flow(
            jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K),
            jnp.asarray(K_inv)))
        theirs = self.ref_iw.pose2flow(
            torch.from_numpy(depth), torch.from_numpy(pose),
            torch.from_numpy(K), torch.from_numpy(K_inv))
        np.testing.assert_allclose(ours, from_torch_nchw(theirs),
                                   rtol=1e-4, atol=1e-4)

    def test_flow_warp_parity(self):
        import torch
        r = rng(10)
        img = r.rand(2, 16, 24, 3).astype(np.float32)
        flow = r.uniform(-3, 3, (2, 16, 24, 2)).astype(np.float32)
        ours = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
        theirs = self.ref_iw.flow_warp(to_torch_nchw(img), to_torch_nchw(flow))
        np.testing.assert_allclose(ours, from_torch_nchw(theirs),
                                   rtol=1e-4, atol=1e-4)

    def test_flow2oob_parity(self):
        import torch
        flow = rng(11).uniform(-20, 20, (2, 16, 24, 2)).astype(np.float32)
        ours = np.asarray(flow2oob(jnp.asarray(flow)))
        theirs = self.ref_iw.flow2oob(to_torch_nchw(flow)).numpy()
        np.testing.assert_array_equal(ours, theirs)


class TestWarpIdentities:
    def test_inverse_warp_equals_pose2flow_flow_warp(self):
        """The reference's own DEBUG consistency probe (train.py:732-740)."""
        r = rng(12)
        b, h, w = 2, 32, 48
        img = jnp.asarray(r.rand(b, h, w, 3).astype(np.float32))
        depth = jnp.asarray((r.rand(b, h, w) * 5 + 2).astype(np.float32))
        pose = jnp.asarray(r.uniform(-0.02, 0.02, (b, 6)).astype(np.float32))
        K = np.array([[w, 0, w / 2], [0, h, h / 2], [0, 0, 1]],
                     dtype=np.float32)[None].repeat(b, 0)
        K_inv = np.linalg.inv(K)
        warped_direct = inverse_warp(img, depth, pose, jnp.asarray(K),
                                     jnp.asarray(K_inv), padding_mode="border")
        flow = pose2flow(depth, pose, jnp.asarray(K), jnp.asarray(K_inv))
        warped_via_flow = flow_warp(img, flow, padding_mode="border")
        np.testing.assert_allclose(np.asarray(warped_direct),
                                   np.asarray(warped_via_flow),
                                   rtol=1e-3, atol=1e-3)

    def test_zero_pose_identity(self):
        r = rng(13)
        b, h, w = 1, 16, 20
        img = jnp.asarray(r.rand(b, h, w, 3).astype(np.float32))
        depth = jnp.ones((b, h, w)) * 3.0
        pose = jnp.zeros((b, 6))
        K = np.array([[w, 0, w / 2], [0, h, h / 2], [0, 0, 1]],
                     dtype=np.float32)[None]
        out = inverse_warp(img, depth, pose, jnp.asarray(K),
                           jnp.asarray(np.linalg.inv(K)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   rtol=1e-4, atol=1e-4)

    def test_pixel2cam_roundtrip(self):
        r = rng(14)
        b, h, w = 2, 8, 10
        depth = jnp.asarray((r.rand(b, h, w) * 4 + 1).astype(np.float32))
        K = np.array([[w, 0, w / 2], [0, h, h / 2], [0, 0, 1]],
                     dtype=np.float32)[None].repeat(b, 0)
        cam = pixel2cam(depth, jnp.asarray(np.linalg.inv(K)))
        # Reproject: K @ cam / z == pixel grid.
        proj = np.einsum("bij,bhwj->bhwi", K, np.asarray(cam))
        px = proj[..., 0] / proj[..., 2]
        py = proj[..., 1] / proj[..., 2]
        gx, gy = np.meshgrid(np.arange(w), np.arange(h))
        np.testing.assert_allclose(px, gx[None].repeat(b, 0), atol=1e-4)
        np.testing.assert_allclose(py, gy[None].repeat(b, 0), atol=1e-4)
