"""Full CC train step under compute_dtype=bfloat16 on CPU (the guarded
recipe a user actually trains with: --compute-dtype bfloat16
--clip-grad-norm 5 --skip-nonfinite-updates).

Until round 5 the bf16 STEP was only ever executed on the TPU (bench/
soak); CI covered the bf16 pieces (loss dtype, layer lowerings, optimizer
guards) but never the composed jitted step — this pins the plumbing:
master params stay fp32, the step runs and trains finitely, and the
dtype-conditional tap cap (models/layers.py TAP_MAX_C_BF16) is active
inside the traced program.
"""
import numpy as np
import jax
import jax.numpy as jnp

from cc_tpu.train import TrainConfig, make_models, init_state, \
    build_train_step

from test_train_step import synth_batch, tiny_config


def _bf16_cfg():
    return tiny_config(compute_dtype="bfloat16", clip_grad_norm=5.0,
                       skip_nonfinite_updates=True)


def test_guarded_bf16_step_trains():
    cfg = _bf16_cfg()
    mods = make_models(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    # master params are fp32 regardless of compute dtype
    assert all(a.dtype == jnp.float32
               for a in jax.tree_util.tree_leaves(state.params))
    step = build_train_step(cfg, mods, donate=False)
    batch = synth_batch(cfg)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.step) == 4
    # params updated and still fp32 (the update path never de-promotes)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(a.dtype == jnp.float32 for a in leaves)
    assert losses[-1] < losses[0] * 1.5  # trains, doesn't blow up


def test_bf16_step_uses_wide_tap_cap():
    """The 128-channel 3x3 convs must lower to tap matmuls in the bf16
    step's traced program (TAP_MAX_C_BF16=128) while the fp32 program
    keeps the conv primitive for them (TAP_MAX_C=64)."""
    def conv_ops(dtype):
        cfg = tiny_config(compute_dtype=dtype)
        mods = make_models(cfg)
        state = init_state(cfg, jax.random.PRNGKey(0))
        batch = synth_batch(cfg)
        from cc_tpu.train.step import forward_all

        def fwd(params, bs, batch):
            out, _ = forward_all(cfg, mods, params, bs, batch)
            return out["disparities"][0]
        jaxpr = jax.make_jaxpr(fwd)(state.params, state.batch_stats, batch)
        return str(jaxpr.jaxpr).count("conv_general_dilated")
    n_fp32 = conv_ops("float32")
    n_bf16 = conv_ops("bfloat16")
    # bf16 lowers strictly more convs to dots (the 65..128-channel 3x3s)
    assert n_bf16 < n_fp32, (n_bf16, n_fp32)
