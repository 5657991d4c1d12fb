"""Resampling-op parity: adaptive pool / bilinear resize / nearest upsample."""
import numpy as np
import pytest
import jax.numpy as jnp

from cc_tpu.ops.image import (
    adaptive_avg_pool, resize_bilinear, upsample2x_bilinear, upsample_nearest,
)
from tests.ref_compat import reference_available, to_torch_nchw, from_torch_nchw

torch = pytest.importorskip("torch") if reference_available() else None


def rng(seed=0):
    return np.random.RandomState(seed)


def test_adaptive_pool_divisible_is_box_mean():
    x = rng().rand(2, 8, 12, 3).astype(np.float32)
    out = np.asarray(adaptive_avg_pool(jnp.asarray(x), (4, 6)))
    exp = x.reshape(2, 4, 2, 6, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(out, exp, rtol=1e-6, atol=1e-6)


def test_nearest_upsample():
    x = rng(1).rand(1, 3, 4, 2).astype(np.float32)
    out = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    assert out.shape == (1, 6, 8, 2)
    np.testing.assert_allclose(out[0, ::2, ::2], x[0], atol=0)
    np.testing.assert_allclose(out[0, 1::2, 1::2], x[0], atol=0)


@pytest.mark.skipif(not reference_available(), reason="no torch")
class TestTorchParity:
    @pytest.mark.parametrize("in_hw,out_hw", [
        ((16, 24), (8, 12)), ((16, 24), (4, 6)),
        ((15, 23), (4, 6)),  # non-divisible
        ((7, 11), (3, 5)),
    ])
    def test_adaptive_avg_pool(self, in_hw, out_hw):
        import torch.nn.functional as F
        x = rng(2).rand(2, *in_hw, 3).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_hw))
        theirs = F.adaptive_avg_pool2d(to_torch_nchw(x), out_hw)
        np.testing.assert_allclose(ours, from_torch_nchw(theirs),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("align_corners", [False, True])
    @pytest.mark.parametrize("in_hw,out_hw", [
        ((8, 12), (16, 24)), ((8, 12), (32, 48)),
        ((5, 7), (13, 19)), ((16, 24), (8, 12)),
    ])
    def test_bilinear_resize(self, align_corners, in_hw, out_hw):
        import torch.nn.functional as F
        x = rng(3).rand(2, *in_hw, 3).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw,
                                          align_corners=align_corners))
        theirs = F.interpolate(to_torch_nchw(x), size=out_hw, mode="bilinear",
                               align_corners=align_corners)
        np.testing.assert_allclose(ours, from_torch_nchw(theirs),
                                   rtol=1e-5, atol=1e-6)

    def test_upsample2x(self):
        import torch.nn.functional as F
        x = rng(4).rand(1, 6, 9, 2).astype(np.float32)
        ours = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
        theirs = F.interpolate(to_torch_nchw(x), scale_factor=2,
                               mode="bilinear", align_corners=False)
        np.testing.assert_allclose(ours, from_torch_nchw(theirs),
                                   rtol=1e-5, atol=1e-6)
