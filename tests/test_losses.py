"""Loss-library tests: invariants + numerical parity vs the reference."""
import numpy as np
import pytest
import jax.numpy as jnp

from cc_tpu.losses import (
    robust_l1, robust_l1_per_pix, spatial_normalize, ssim,
    photometric_reconstruction_loss, photometric_flow_loss, occlusion_masks,
    explainability_loss, gaussian_explainability_loss,
    consensus_exp_masks, consensus_depth_flow_mask,
    weighted_binary_cross_entropy, smooth_loss, edge_aware_smoothness_loss,
    compute_epe, compute_all_epes, compute_depth_errors,
)
from tests.ref_compat import (
    reference_available, load_reference, to_torch_nchw, from_torch_nchw,
)


def rng(seed=0):
    return np.random.RandomState(seed)


def make_scene(seed=0, b=2, h=16, w=24, n_ref=4, scales=(1, 2)):
    r = rng(seed)
    tgt = r.rand(b, h, w, 3).astype(np.float32) * 2 - 1
    refs = [r.rand(b, h, w, 3).astype(np.float32) * 2 - 1 for _ in range(n_ref)]
    K = np.array([[w * 1.2, 0, w / 2], [0, h * 1.2, h / 2], [0, 0, 1]],
                 dtype=np.float32)[None].repeat(b, 0)
    K_inv = np.linalg.inv(K).astype(np.float32)
    pose = r.uniform(-0.03, 0.03, (b, n_ref, 6)).astype(np.float32)
    depths = [(r.rand(b, h // s, w // s, 1) * 4 + 1).astype(np.float32)
              for s in scales]
    exp_masks = [np.clip(r.rand(b, h // s, w // s, n_ref), 1e-3, 1 - 1e-3
                         ).astype(np.float32) for s in scales]
    flows_fwd = [(r.randn(b, h // s, w // s, 2) * 2).astype(np.float32)
                 for s in scales]
    flows_bwd = [(r.randn(b, h // s, w // s, 2) * 2).astype(np.float32)
                 for s in scales]
    return tgt, refs, K, K_inv, pose, depths, exp_masks, flows_fwd, flows_bwd


class TestBasics:
    def test_robust_l1(self):
        x = jnp.asarray(rng().randn(4, 5).astype(np.float32))
        v = float(robust_l1(x))
        exp = np.mean((np.asarray(x) ** 2 + 1e-2) ** 0.5)
        assert abs(v - exp) < 1e-6

    def test_spatial_normalize(self):
        d = jnp.asarray(rng(1).rand(2, 4, 6, 1).astype(np.float32) + 0.5)
        out = np.asarray(spatial_normalize(d))
        np.testing.assert_allclose(out.mean(axis=(1, 2, 3)), 1.0, rtol=1e-5)

    def test_ssim_self_is_one(self):
        img = jnp.asarray(rng(2).rand(1, 20, 20, 3).astype(np.float32))
        s = np.asarray(ssim(img, img))
        assert s.min() > 0.99

    def test_occlusion_masks_both_equal(self):
        r = rng(3)
        fw = jnp.asarray(r.randn(2, 8, 10, 2).astype(np.float32) * 3)
        bw = jnp.asarray(r.randn(2, 8, 10, 2).astype(np.float32) * 3)
        occ_bw, occ_fw = occlusion_masks(bw, fw)
        np.testing.assert_array_equal(np.asarray(occ_bw), np.asarray(occ_fw))

    def test_wbce_range(self):
        r = rng(4)
        o = jnp.asarray(np.clip(r.rand(2, 4, 4, 4), 0.01, 0.99).astype(np.float32))
        t = jnp.asarray((r.rand(2, 4, 4, 4) > 0.5).astype(np.float32))
        v = float(weighted_binary_cross_entropy(o, t, [0.5, 0.5]))
        assert v > 0


@pytest.mark.skipif(not reference_available(), reason="no reference")
class TestLossParity:
    def setup_method(self):
        _, self.ref_lf, self.ref_ssim = load_reference()

    def test_ssim_parity(self):
        r = rng(5)
        a = r.rand(2, 20, 26, 3).astype(np.float32)
        b = r.rand(2, 20, 26, 3).astype(np.float32)
        ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = self.ref_ssim.ssim(to_torch_nchw(a), to_torch_nchw(b))
        np.testing.assert_allclose(ours, from_torch_nchw(theirs),
                                   rtol=1e-4, atol=1e-5)

    def test_occlusion_masks_parity(self):
        r = rng(6)
        fw = r.randn(2, 8, 10, 2).astype(np.float32) * 3
        bw = r.randn(2, 8, 10, 2).astype(np.float32) * 3
        ours_bw, ours_fw = occlusion_masks(jnp.asarray(bw), jnp.asarray(fw))
        t_bw, t_fw = self.ref_lf.occlusion_masks(to_torch_nchw(bw),
                                                 to_torch_nchw(fw))
        np.testing.assert_allclose(np.asarray(ours_bw), t_bw.numpy(), atol=0)
        np.testing.assert_allclose(np.asarray(ours_fw), t_fw.numpy(), atol=0)

    def test_explainability_loss_parity(self):
        masks = [np.clip(rng(7).rand(2, 8, 10, 4), 1e-4, 1 - 1e-4
                         ).astype(np.float32) for _ in range(2)]
        ours = float(explainability_loss([jnp.asarray(m) for m in masks]))
        theirs = float(self.ref_lf.explainability_loss(
            [to_torch_nchw(m) for m in masks]))
        assert abs(ours - theirs) < 1e-5

    def test_smooth_loss_parity(self):
        preds = [rng(8).rand(2, 8 // s, 12 // s, 1).astype(np.float32)
                 for s in (1, 2)]
        ours = float(smooth_loss([jnp.asarray(p) for p in preds]))
        theirs = float(self.ref_lf.smooth_loss([to_torch_nchw(p)
                                                for p in preds]))
        assert abs(ours - theirs) < 1e-5

    def test_edge_aware_smoothness_parity(self):
        r = rng(9)
        img = r.rand(2, 16, 24, 3).astype(np.float32)
        preds = [r.rand(2, 16 // s, 24 // s, 1).astype(np.float32)
                 for s in (1, 2, 4)]
        ours = float(edge_aware_smoothness_loss(
            jnp.asarray(img), [jnp.asarray(p) for p in preds]))
        theirs = float(self.ref_lf.edge_aware_smoothness_loss(
            to_torch_nchw(img), [to_torch_nchw(p) for p in preds]))
        assert abs(ours - theirs) < 1e-5

    def test_photometric_reconstruction_parity(self):
        import torch
        tgt, refs, K, K_inv, pose, depths, exp_masks, _, _ = make_scene(10)
        ours = float(photometric_reconstruction_loss(
            jnp.asarray(tgt), [jnp.asarray(x) for x in refs],
            jnp.asarray(K), jnp.asarray(K_inv),
            [jnp.asarray(d) for d in depths],
            [jnp.asarray(m) for m in exp_masks],
            jnp.asarray(pose), lambda_oob=0.1, qch=0.5, wssim=0.3))
        theirs = float(self.ref_lf.photometric_reconstruction_loss(
            to_torch_nchw(tgt), [to_torch_nchw(x) for x in refs],
            torch.from_numpy(K), torch.from_numpy(K_inv),
            [to_torch_nchw(d) for d in depths],
            [to_torch_nchw(m) for m in exp_masks],
            torch.from_numpy(pose), lambda_oob=0.1, qch=0.5, wssim=0.3))
        assert abs(ours - theirs) / abs(theirs) < 1e-4

    def test_photometric_flow_loss_parity(self):
        tgt, refs, _, _, _, _, exp_masks, flows_fwd, flows_bwd = make_scene(11)
        exp2 = [m[..., 1:3] for m in exp_masks]
        ours = float(photometric_flow_loss(
            jnp.asarray(tgt), [jnp.asarray(refs[1]), jnp.asarray(refs[2])],
            [[jnp.asarray(f) for f in flows_bwd],
             [jnp.asarray(f) for f in flows_fwd]],
            [jnp.asarray(m) for m in exp2],
            lambda_oob=0.1, qch=0.5, wssim=0.3))
        theirs = float(self.ref_lf.photometric_flow_loss(
            to_torch_nchw(tgt), [to_torch_nchw(refs[1]), to_torch_nchw(refs[2])],
            [[to_torch_nchw(f) for f in flows_bwd],
             [to_torch_nchw(f) for f in flows_fwd]],
            [to_torch_nchw(m) for m in exp2],
            lambda_oob=0.1, qch=0.5, wssim=0.3))
        assert abs(ours - theirs) / abs(theirs) < 1e-4

    def test_consensus_exp_masks_parity(self):
        tgt, refs, _, _, _, _, _, flows_fwd, flows_bwd = make_scene(12)
        r = rng(13)
        cam_fwd = [(r.randn(*f.shape) * 2).astype(np.float32) for f in flows_fwd]
        cam_bwd = [(r.randn(*f.shape) * 2).astype(np.float32) for f in flows_bwd]
        ours = consensus_exp_masks(
            [jnp.asarray(f) for f in cam_fwd], [jnp.asarray(f) for f in cam_bwd],
            [jnp.asarray(f) for f in flows_fwd], [jnp.asarray(f) for f in flows_bwd],
            jnp.asarray(tgt), jnp.asarray(refs[2]), jnp.asarray(refs[1]),
            wssim=0.3, wrig=1.2)
        theirs = self.ref_lf.consensus_exp_masks(
            [to_torch_nchw(f) for f in cam_fwd], [to_torch_nchw(f) for f in cam_bwd],
            [to_torch_nchw(f) for f in flows_fwd], [to_torch_nchw(f) for f in flows_bwd],
            to_torch_nchw(tgt), to_torch_nchw(refs[2]), to_torch_nchw(refs[1]),
            wssim=0.3, wrig=1.2)
        for o, t in zip(ours, theirs):
            # binary targets: require near-exact agreement
            agree = (np.asarray(o) == from_torch_nchw(t)).mean()
            assert agree > 0.99

    def test_consensus_depth_flow_mask_parity(self):
        r = rng(14)
        scales = (1, 2)
        b, h, w = 2, 16, 24
        exp = [np.clip(r.rand(b, h // s, w // s, 4), 1e-3, 1 - 1e-3
                       ).astype(np.float32) for s in scales]
        cen_b = [np.abs(r.randn(b, h // s, w // s, 2)).astype(np.float32) * 0.02
                 for s in scales]
        cen_f = [np.abs(r.randn(b, h // s, w // s, 2)).astype(np.float32) * 0.02
                 for s in scales]
        tgt_b = [(r.rand(b, h // s, w // s, 1) > 0.5).astype(np.float32)
                 for s in scales]
        tgt_f = [(r.rand(b, h // s, w // s, 1) > 0.5).astype(np.float32)
                 for s in scales]
        ours = float(consensus_depth_flow_mask(
            [jnp.asarray(x) for x in exp],
            [jnp.asarray(x) for x in cen_b], [jnp.asarray(x) for x in cen_f],
            [jnp.asarray(x) for x in tgt_b], [jnp.asarray(x) for x in tgt_f],
            THRESH=0.01, wbce=0.4))
        theirs = float(self.ref_lf.consensus_depth_flow_mask(
            [to_torch_nchw(x) for x in exp],
            [to_torch_nchw(x) for x in cen_b], [to_torch_nchw(x) for x in cen_f],
            [to_torch_nchw(x) for x in tgt_b], [to_torch_nchw(x) for x in tgt_f],
            THRESH=0.01, wbce=0.4))
        assert abs(ours - theirs) / abs(theirs) < 1e-4

    def test_compute_depth_errors_parity(self):
        import torch
        r = rng(15)
        gt = (r.rand(2, 32, 48) * 60).astype(np.float32)
        gt[gt < 2] = 0  # some invalid
        pred = (r.rand(2, 32, 48) * 50 + 0.5).astype(np.float32)
        ours = compute_depth_errors(gt, pred)
        theirs = [float(x) for x in self.ref_lf.compute_errors(
            torch.from_numpy(gt), torch.from_numpy(pred))]
        np.testing.assert_allclose(ours, theirs, rtol=1e-4)

    def test_compute_epe_parity(self):
        import torch
        r = rng(16)
        gt = r.randn(1, 20, 30, 3).astype(np.float32)
        gt[..., 2] = (r.rand(1, 20, 30) > 0.3)
        pred = r.randn(1, 10, 15, 2).astype(np.float32)
        ours = compute_epe(gt, pred)
        theirs = self.ref_lf.compute_epe(to_torch_nchw(gt), to_torch_nchw(pred))
        assert abs(ours - theirs) < 1e-4

    def test_compute_all_epes_parity(self):
        import torch
        r = rng(17)
        gt = r.randn(1, 20, 30, 3).astype(np.float32)
        gt[..., 2] = (r.rand(1, 20, 30) > 0.3)
        rigid = r.randn(1, 20, 30, 2).astype(np.float32)
        nonrigid = r.randn(1, 20, 30, 2).astype(np.float32)
        mask = r.rand(1, 20, 30, 1).astype(np.float32)
        ours = compute_all_epes(gt, rigid, nonrigid, mask)
        theirs = self.ref_lf.compute_all_epes(
            to_torch_nchw(gt), to_torch_nchw(rigid), to_torch_nchw(nonrigid),
            to_torch_nchw(mask))
        np.testing.assert_allclose(ours, [float(t) for t in theirs], rtol=1e-3,
                                   atol=1e-5)


class TestScanRefsEquivalence:
    """CC_TPU_SCAN_REFS=1 (losses/photometric.py): the lax.scan form of the
    rigid loss's per-ref loop must match the unrolled form — values AND
    gradients (it exists purely as a program-size/compile-time knob)."""

    def test_scan_matches_unrolled_with_and_without_exp(self):
        import jax
        import cc_tpu.losses.photometric as P
        tgt, refs, K, K_inv, pose, depths, exp_masks, _, _ = make_scene(21)
        args = (jnp.asarray(tgt), [jnp.asarray(r) for r in refs],
                jnp.asarray(K), jnp.asarray(K_inv))
        saved = P._SCAN_REFS
        try:
            for masks in ([jnp.asarray(m) for m in exp_masks],
                          [None] * len(depths)):
                def f(d0):
                    ds = [d0] + [jnp.asarray(d) for d in depths[1:]]
                    return photometric_reconstruction_loss(
                        args[0], args[1], args[2], args[3], ds, masks,
                        jnp.asarray(pose), wssim=0.3, lambda_oob=0.1)
                P._SCAN_REFS = False
                v0, g0 = jax.value_and_grad(f)(jnp.asarray(depths[0]))
                P._SCAN_REFS = True
                v1, g1 = jax.value_and_grad(f)(jnp.asarray(depths[0]))
                np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
                np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                           rtol=1e-4, atol=1e-7)
        finally:
            P._SCAN_REFS = saved
