"""Synthetic-scene ground-truth tests (SURVEY §4c / VERDICT r01 item 5).

A known scene — fronto-parallel textured plane at depth Z0, camera
translating along x — gives an analytically exact correspondence between
target and reference frames (uniform integer-pixel flow, so bilinear
resampling is exact). At the GT depth/pose:

- inverse_warp reconstructs the target exactly on the in-bounds region,
- the photometric losses sit at their Charbonnier floor ((0+eps)^q, NOT 0)
  and BELOW any perturbed depth/pose,
- their gradient w.r.t. depth and pose vanishes.

This catches sign/convention bugs (axis order, intrinsics scaling, flow
direction) that noise-based trainability tests cannot. It is the
reference's --DEBUG consistency probe (train.py:732-740) promoted to a
test with a real analytic scene, using the reference's 5-frame snippet
layout (4 refs at x-shifts -2d,-d,+d,+2d).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cc_tpu.geometry import flow_warp, inverse_warp, pose2flow
from cc_tpu.losses import (photometric_flow_loss,
                           photometric_reconstruction_loss)

H, W = 64, 96
FX = FY = 20.0
Z0 = 10.0
DELTA = 2.0  # integer pixel shift -> bilinear resampling is exact
SHIFTS = (-2.0, -1.0, 1.0, 2.0)  # in units of DELTA (refs -2,-1,+1,+2)


def _texture(xs, ys):
    """Smooth analytic RGB texture, bounded away from 0 (the zeros-padding
    validity trick tests warped == 0 exactly)."""
    x = xs / 4.0
    y = ys / 3.0
    r = 0.55 + 0.3 * np.sin(x) * np.cos(y)
    g = 0.55 + 0.3 * np.cos(1.3 * x + 0.7) * np.sin(0.8 * y)
    b = 0.55 + 0.3 * np.sin(0.6 * x + 1.1 * y)
    return np.stack([r, g, b], axis=-1).astype(np.float32)


@pytest.fixture(scope="module")
def scene():
    k = np.array([[FX, 0, W / 2.0], [0, FY, H / 2.0], [0, 0, 1]], np.float32)
    k_inv = np.linalg.inv(k).astype(np.float32)
    depth = jnp.full((1, H, W), Z0, jnp.float32)

    # pose sign convention probed at runtime: find the tx giving flow +DELTA
    tx1 = DELTA * Z0 / FX
    probe = pose2flow(depth, jnp.asarray([[tx1, 0, 0, 0, 0, 0]], jnp.float32),
                      jnp.asarray(k[None]), jnp.asarray(k_inv[None]))
    probe = np.asarray(probe)
    assert np.allclose(np.abs(probe[0, ..., 0]), DELTA, atol=1e-4), (
        "uniform-flow sanity: fronto-parallel plane + x-translation must "
        "give constant horizontal flow")
    assert np.allclose(probe[0, ..., 1], 0.0, atol=1e-4)
    sign = float(np.sign(np.mean(probe[0, ..., 0])))

    ys, xs = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    tgt = _texture(xs, ys)
    # warped_ref_i(p) samples ref_i at p + s_i*DELTA*sign; exactness needs
    # ref_i(q) = texture(q - s_i*DELTA*sign)
    refs = [_texture(xs - s * DELTA * sign, ys) for s in SHIFTS]
    poses = np.zeros((1, len(SHIFTS), 6), np.float32)
    for i, s in enumerate(SHIFTS):
        poses[0, i, 0] = s * tx1
    flows = [probe * s for s in SHIFTS]
    return {
        "tgt": jnp.asarray(tgt[None]),
        "refs": [jnp.asarray(r[None]) for r in refs],
        "depth": depth,
        "poses": jnp.asarray(poses),
        "k": jnp.asarray(k[None]),
        "k_inv": jnp.asarray(k_inv[None]),
        "flows": [jnp.asarray(f) for f in flows],
        "sign": sign,
    }


def _inb(margin):
    # +1: the exact-boundary source column can round to just outside the
    # [-1,1] normalized range in fp32 and be zero-masked
    d = int(np.ceil(margin)) + 1
    return (slice(None), slice(d, W - d))


def test_inverse_warp_exact_at_gt(scene):
    for i in range(4):
        warped = inverse_warp(scene["refs"][i], scene["depth"],
                              scene["poses"][:, i], scene["k"],
                              scene["k_inv"])
        warped = np.asarray(warped)[0]
        tgt = np.asarray(scene["tgt"])[0]
        m = _inb(abs(SHIFTS[i]) * DELTA)
        np.testing.assert_allclose(warped[m], tgt[m], atol=1e-5,
                                   err_msg=f"ref {i}")
    # out-of-bounds column of the farthest warp comes out exactly 0
    # (zeros-padding contract, inverse_warp.py:72-76)
    i_far = 3 if scene["sign"] > 0 else 0
    warped = np.asarray(inverse_warp(
        scene["refs"][i_far], scene["depth"], scene["poses"][:, i_far],
        scene["k"], scene["k_inv"]))[0]
    col = W - 1 if scene["sign"] > 0 else 0
    assert np.all(warped[:, col] == 0.0)


def test_flow_warp_exact_at_gt(scene):
    for i in (1, 2):
        warped = np.asarray(flow_warp(scene["refs"][i], scene["flows"][i]))[0]
        tgt = np.asarray(scene["tgt"])[0]
        m = _inb(DELTA)
        np.testing.assert_allclose(warped[m], tgt[m], atol=1e-5)


def _photo_cam_loss(scene, depth, poses, wssim=0.5):
    return photometric_reconstruction_loss(
        scene["tgt"], scene["refs"], scene["k"], scene["k_inv"],
        [depth[..., None]], [None], poses, wssim=wssim)


def test_photometric_minimum_at_gt(scene):
    """GT beats every perturbation; the residual term vanishes (the loss
    equals the Charbonnier floor (eps)^q=0.1 per ref, up to oob_norm)."""
    gt = float(_photo_cam_loss(scene, scene["depth"], scene["poses"]))
    floor = 4 * 0.5 * (1e-2 ** 0.5)  # nref * (1-wssim) * (0^2+eps)^q
    # the only excess over the floor is the SSIM boundary band (the 13-px
    # window overlaps the zero-masked out-of-bounds region near the edges)
    assert floor < gt < floor * 1.5, (gt, floor)

    # NB tz must be large enough that the photometric residual beats the
    # ~0.05 the GT pays in SSIM boundary band (zooming in removes the band,
    # and Charbonnier with eps=1e-2 is flat near 0 — a real property of the
    # reference loss on small images; at 832x256 the band is negligible)
    d_pose = [
        ("pose+tx", [0.3, 0, 0, 0, 0, 0]),
        ("pose+tz", [0, 0, 2.0, 0, 0, 0]),
        ("pose+ry", [0, 0, 0, 0, 0.02, 0]),
    ]
    for name, dp in d_pose:
        bad = float(_photo_cam_loss(
            scene, scene["depth"],
            scene["poses"] + jnp.asarray(dp)[None, None]))
        assert gt < bad - 1e-4, (name, gt, bad)
    for name, scale in (("depth*1.2", 1.2), ("depth*0.8", 0.8)):
        bad = float(_photo_cam_loss(scene, scene["depth"] * scale,
                                    scene["poses"]))
        assert gt < bad - 1e-4, (name, gt, bad)


def test_photometric_gradient_vanishes_at_gt(scene):
    def loss_fn(depth, poses):
        return _photo_cam_loss(scene, depth, poses)

    grad = jax.grad(loss_fn, argnums=(0, 1))
    g_depth, g_pose = grad(scene["depth"], scene["poses"])
    # comparators: wrong depth for the depth gradient (at zero pose the
    # flow — hence the loss — is depth-independent, so pose*0 is degenerate
    # for depth); zero pose for the pose gradient
    gp_depth, _ = grad(scene["depth"] * 0.5, scene["poses"])
    _, gp_pose = grad(scene["depth"], scene["poses"] * 0.0)
    # Charbonnier d/dx (x^2+eps)^q = 0 at x=0; SSIM is maximal at equal
    # images -> both gradient paths vanish at the GT scene parameters up to
    # the SSIM boundary-band effect, orders of magnitude below the gradient
    # at a wrong configuration (measured ~245x for depth, ~105x for pose).
    assert (float(jnp.mean(jnp.abs(g_depth)))
            < 2e-2 * float(jnp.mean(jnp.abs(gp_depth))))
    assert (float(jnp.mean(jnp.abs(g_pose)))
            < 5e-2 * float(jnp.mean(jnp.abs(gp_pose))))


def test_flow_photometric_minimum_at_gt(scene):
    def floss(fbwd, ffwd):
        return float(photometric_flow_loss(
            scene["tgt"], [scene["refs"][1], scene["refs"][2]],
            [[fbwd], [ffwd]], None, wssim=0.5))

    gt = floss(scene["flows"][1], scene["flows"][2])
    half = floss(scene["flows"][1] * 0.5, scene["flows"][2] * 0.5)
    zero = floss(scene["flows"][1] * 0.0, scene["flows"][2] * 0.0)
    assert gt < half - 1e-4 and gt < zero - 1e-4, (gt, half, zero)


def test_debug_probe_identity(scene):
    """The reference --DEBUG probe (train.py:732-740):
    inverse_warp(ref, d, p) == flow_warp(ref, pose2flow(d, p))."""
    for i in range(4):
        a = inverse_warp(scene["refs"][i], scene["depth"],
                         scene["poses"][:, i], scene["k"], scene["k_inv"])
        b = flow_warp(scene["refs"][i],
                      pose2flow(scene["depth"], scene["poses"][:, i],
                                scene["k"], scene["k_inv"]))
        # compare inside the in-bounds region: at the exact image border the
        # two paths can round the normalized coordinate to opposite sides of
        # [-1,1] in fp32 and disagree on the zero mask (reference probe
        # train.py:732-740 likewise compares mean error, not exactness)
        m = _inb(abs(SHIFTS[i]) * DELTA)
        np.testing.assert_allclose(np.asarray(a)[0][m], np.asarray(b)[0][m],
                                   atol=1e-5)
