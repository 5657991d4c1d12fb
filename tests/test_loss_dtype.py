"""loss_dtype=bfloat16: the loss stack's bf16 mode tracks fp32 closely.

The option casts image payloads + explainability masks to bf16 at the loss
boundary (train/step.compute_losses) while geometry and all large
reductions stay fp32 (losses.charbonnier.mean32). These tests pin the
contract: every loss term is finite, within a few percent of the fp32
value, gradients for every net are finite, and fp32 mode is bit-identical
to what it was (the mean32/fp32-sum guards are identity for fp32 inputs).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cc_tpu.train import TrainConfig, make_models, init_state
from cc_tpu.train.step import compute_losses, forward_all

from test_train_step import synth_batch, tiny_config


@pytest.fixture(scope="module")
def both_metrics():
    """Loss metrics for identical params/batch under fp32 and bf16 loss
    stacks (all 5 weights on so every loss path is exercised)."""
    out = {}
    for ld in ("float32", "bfloat16"):
        cfg = tiny_config(wssim=0.3, mask_loss_weight=0.1,
                          consensus_loss_weight=0.3,
                          flow_photo_loss_weight=0.5,
                          smooth_loss_weight=0.1, loss_dtype=ld)
        mods = make_models(cfg)
        state = init_state(cfg, jax.random.PRNGKey(0))
        batch = synth_batch(cfg)

        def loss_fn(params):
            outputs, _ = forward_all(cfg, mods, params, state.batch_stats,
                                     batch)
            total, metrics = compute_losses(cfg, outputs, batch)
            return total, metrics

        (total, metrics), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(state.params)
        out[ld] = (jax.device_get(metrics), jax.device_get(grads))
    return out


class TestLossDtypeBf16:
    def test_metrics_finite_and_fp32_dtype(self, both_metrics):
        metrics, _ = both_metrics["bfloat16"]
        for k, v in metrics.items():
            assert np.asarray(v).dtype == np.float32, k  # fp32 reductions
            assert np.isfinite(v), (k, v)

    def test_close_to_fp32(self, both_metrics):
        m32, _ = both_metrics["float32"]
        m16, _ = both_metrics["bfloat16"]
        for k in m32:
            a, b = float(m32[k]), float(m16[k])
            # bf16 has ~3 decimal digits; elementwise chains in bf16 with
            # fp32 reductions land well within a few percent on these
            # smooth synthetic scenes
            assert abs(a - b) <= 0.05 * abs(a) + 1e-3, (k, a, b)

    def test_grads_finite_all_nets(self, both_metrics):
        _, grads = both_metrics["bfloat16"]
        for net, tree in grads.items():
            leaves = jax.tree_util.tree_leaves(tree)
            assert leaves, net
            for leaf in leaves:
                assert np.isfinite(np.asarray(leaf)).all(), net

    def test_bf16_grads_track_fp32(self, both_metrics):
        """Direction check: per-net gradient cosine similarity vs fp32."""
        _, g32 = both_metrics["float32"]
        _, g16 = both_metrics["bfloat16"]
        for net in g32:
            a = np.concatenate([np.asarray(x).ravel() for x in
                                jax.tree_util.tree_leaves(g32[net])])
            b = np.concatenate([np.asarray(x).ravel() for x in
                                jax.tree_util.tree_leaves(g16[net])])
            denom = np.linalg.norm(a) * np.linalg.norm(b)
            assert denom > 0, net
            cos = float(np.dot(a, b) / denom)
            assert cos > 0.99, (net, cos)


def test_fp32_reduction_guards_are_identity():
    """mean32 and the fp32 _oob_norm sum are exact no-ops for fp32 inputs."""
    from cc_tpu.losses.charbonnier import mean32
    from cc_tpu.losses.photometric import _oob_norm

    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(7, 33, 65, 3).astype(np.float32))
    assert jnp.mean(x).dtype == mean32(x).dtype == jnp.float32
    assert float(jnp.mean(x)) == float(mean32(x))

    valid = (x[..., :1] > 0.5).astype(jnp.float32)
    norm, gate = _oob_norm(valid)
    s = np.float32(float(jnp.sum(valid)))  # fp32 division, like the op
    assert float(norm) == float(np.float32(valid.size) / s)
    assert float(gate) == 1.0
