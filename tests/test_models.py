"""Model zoo tests: output contracts, shapes, and parameter-count parity
with the torch reference (same layer geometry => same param count)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cc_tpu import models
from tests.ref_compat import reference_available

# H, W must be divisible by 64: MaskNet6/Back2Future decoders (like the
# reference's, which has no decoder crops) require exact 2x doublings
# through 6 levels. 832x256 satisfies this (832 = 64*13).
B, H, W = 1, 128, 128
KEY = jax.random.PRNGKey(0)


def rand_img(seed=0, h=H, w=W):
    return jnp.asarray(
        np.random.RandomState(seed).rand(B, h, w, 3).astype(np.float32) * 2 - 1)


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


class TestDispNets:
    @pytest.mark.parametrize("name,n_scales", [
        ("DispNetS", 4), ("DispNetS6", 6), ("DispResNet6", 6),
        ("DispResNetS6", 6),
    ])
    def test_contract(self, name, n_scales):
        net = models.build(name)
        x = rand_img()
        variables = net.init(KEY, x, training=True)
        out = net.apply(variables, x, training=True,
                        mutable=["batch_stats"])[0]
        assert len(out) == n_scales
        for i, d in enumerate(out):
            assert d.shape == (B, H // 2 ** i, W // 2 ** i, 1)
            dn = np.asarray(d)
            assert dn.min() > 0.01 - 1e-6 and dn.max() < 10.011
        # eval mode returns the finest scale only
        single = net.apply(variables, x, training=False,
                           mutable=["batch_stats"])[0]
        assert single.shape == (B, H, W, 1)


class TestPoseNets:
    @pytest.mark.parametrize("name", ["PoseNetB6", "PoseNet6"])
    def test_pose_contract(self, name):
        net = models.build(name, nb_ref_imgs=4)
        tgt = rand_img()
        refs = [rand_img(i + 1) for i in range(4)]
        variables = net.init(KEY, tgt, refs)
        pose = net.apply(variables, tgt, refs)
        assert pose.shape == (B, 4, 6)
        assert np.abs(np.asarray(pose)).max() < 1.0  # 0.01-scaled

    def test_poseexp_contract(self):
        net = models.build("PoseExpNet", nb_ref_imgs=4, output_exp=True)
        tgt = rand_img()
        refs = [rand_img(i + 1) for i in range(4)]
        variables = net.init(KEY, tgt, refs, training=True)
        masks, pose = net.apply(variables, tgt, refs, training=True)
        assert pose.shape == (B, 4, 6)
        assert len(masks) == 4
        # mask1 is full-res (PoseExpNet.py:79: upconv1 cropped to input size)
        for i, m in enumerate(masks):
            assert m.shape == (B, H // 2 ** i, W // 2 ** i, 4)


class TestMaskNets:
    @pytest.mark.parametrize("name", ["MaskNet6", "MaskResNet6"])
    def test_contract(self, name):
        net = models.build(name, nb_ref_imgs=4)
        tgt = rand_img()
        refs = [rand_img(i + 1) for i in range(4)]
        variables = net.init(KEY, tgt, refs, training=True)
        masks = net.apply(variables, tgt, refs, training=True,
                          mutable=["batch_stats"])[0]
        assert len(masks) == 6
        for i, m in enumerate(masks):
            assert m.shape == (B, H // 2 ** i, W // 2 ** i, 4)
            mn = np.asarray(m)
            assert mn.min() >= 0 and mn.max() <= 1


class TestFlowNets:
    def test_back2future_contract(self):
        net = models.build("Back2Future", nlevels=6)
        tgt = rand_img()
        refs = [rand_img(1), rand_img(2)]
        variables = net.init(KEY, tgt, refs, training=True)
        ff, fb, occ = net.apply(variables, tgt, refs, training=True)
        assert len(ff) == 6 and len(fb) == 6 and len(occ) == 6
        # Training pyramid is 1/1 .. 1/32 (back2future.py:255-281: each
        # level's *_fullres is its _up tensor upsampled exactly once more).
        for i, f in enumerate(ff):
            assert f.shape == (B, H // 2 ** i, W // 2 ** i, 2)
            assert fb[i].shape == f.shape
            assert occ[i].shape == f.shape
        np.testing.assert_array_less(np.asarray(occ[0]), 1.0 + 1e-6)
        # eval
        f1, b1, o1 = net.apply(variables, tgt, refs, training=False)
        assert f1.shape == (B, H, W, 2)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(ff[0]),
                                   atol=1e-5)

    def test_flownetc_contract(self):
        net = models.build("FlowNetC6")
        x1, x2 = rand_img(), rand_img(1)
        variables = net.init(KEY, x1, x2, training=True)
        flows = net.apply(variables, x1, x2, training=True)
        assert len(flows) == 6
        assert flows[0].shape == (B, H, W, 2)
        assert flows[5].shape == (B, H // 32, W // 32, 2)


@pytest.mark.skipif(not reference_available(), reason="no reference")
class TestParamCountParity:
    """Same layer geometry as the reference => identical parameter counts."""

    def _ref_count(self, name, **kw):
        import sys
        from tests.ref_compat import _install_correlation_shim
        _install_correlation_shim()  # reference models/__init__ imports the
        # native spatial_correlation_sampler package unconditionally
        sys.path.insert(0, "/root/reference")
        import models as ref_models
        net = getattr(ref_models, name)(**kw)
        return sum(p.numel() for p in net.parameters())

    def _ours_count(self, name, disp=False, **kw):
        net = models.build(name, **kw)
        if disp:
            variables = net.init(KEY, rand_img(), training=True)
        elif name == "FlowNetC6":
            variables = net.init(KEY, rand_img(), rand_img(1), training=True)
        elif name == "Back2Future":
            variables = net.init(KEY, rand_img(), [rand_img(1), rand_img(2)],
                                 training=True)
        else:
            variables = net.init(KEY, rand_img(),
                                 [rand_img(i + 1) for i in range(4)],
                                 training=True)
        return n_params(variables["params"])

    @pytest.mark.parametrize("name", [
        "DispNetS", "DispNetS6", "DispResNet6", "DispResNetS6"])
    def test_disp_counts(self, name):
        assert self._ours_count(name, disp=True) == self._ref_count(name)

    @pytest.mark.parametrize("name", ["PoseNetB6", "PoseNet6", "MaskNet6",
                                      "MaskResNet6"])
    def test_stacked_input_counts(self, name):
        assert (self._ours_count(name, nb_ref_imgs=4)
                == self._ref_count(name, nb_ref_imgs=4))

    def test_poseexp_counts(self):
        assert (self._ours_count("PoseExpNet", nb_ref_imgs=4, output_exp=True)
                == self._ref_count("PoseExpNet", nb_ref_imgs=4,
                                   output_exp=True))

    def test_flownetc_counts(self):
        # FlowNetC6.py:16 documents 'Parameter count, 39,175,298'
        assert self._ours_count("FlowNetC6") == self._ref_count("FlowNetC6")
