"""Optimizer guard rails: --clip-grad-norm and --skip-nonfinite-updates
(train/state.py make_optimizer). The bf16 soak showed (a) rare non-finite
gradients poison params in one step, and (b) global-norm clipping ALONE
makes it worse (nan norm scales every net's update to nan) — the
apply_if_finite guard must drop such updates while keeping Adam moments,
and must compose with per-net freezing's opt-state surgery."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cc_tpu.train.config import TrainConfig
from cc_tpu.train.state import make_optimizer

NETS_PARAMS = {
    "disp": {"k": jnp.ones((3,))}, "pose": {"k": jnp.ones((3,))},
    "mask": {"k": jnp.ones((3,))}, "flow": {"k": jnp.ones((3,))},
}


def _grads(val):
    return jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, val), NETS_PARAMS)


def test_nonfinite_grads_are_skipped():
    cfg = TrainConfig(skip_nonfinite_updates=True, lr=0.1)
    opt = make_optimizer(cfg)
    state = opt.init(NETS_PARAMS)

    updates, state = opt.update(_grads(jnp.nan), state, NETS_PARAMS)
    new = optax.apply_updates(NETS_PARAMS, updates)
    for leaf in jax.tree_util.tree_leaves(new):
        np.testing.assert_array_equal(np.asarray(leaf), 1.0)  # unchanged

    updates, state = opt.update(_grads(1.0), state, NETS_PARAMS)
    new = optax.apply_updates(NETS_PARAMS, updates)
    assert all(np.all(np.isfinite(np.asarray(x)))
               and not np.allclose(np.asarray(x), 1.0)
               for x in jax.tree_util.tree_leaves(new))


def test_clip_without_guard_poisons_everything():
    """Documents WHY the guard matters: nan global norm nukes all nets."""
    cfg = TrainConfig(clip_grad_norm=5.0, lr=0.1)
    opt = make_optimizer(cfg)
    state = opt.init(NETS_PARAMS)
    g = _grads(1.0)
    g["flow"]["k"] = jnp.array([jnp.nan, 1.0, 1.0])
    updates, _ = opt.update(g, state, NETS_PARAMS)
    assert not np.any(np.isfinite(np.asarray(updates["disp"]["k"])))


def test_guard_composes_with_freezing():
    cfg = TrainConfig(skip_nonfinite_updates=True, clip_grad_norm=5.0,
                      fix_dispnet=True, lr=0.1)
    opt = make_optimizer(cfg)
    state = opt.init(NETS_PARAMS)

    # finite step: frozen net's update is zero, others move
    updates, state2 = opt.update(_grads(1.0), state, NETS_PARAMS)
    np.testing.assert_array_equal(np.asarray(updates["disp"]["k"]), 0.0)
    assert not np.allclose(np.asarray(updates["flow"]["k"]), 0.0)

    # nan step: everything skipped, state structure intact for resume
    updates, state3 = opt.update(_grads(jnp.nan), state2, NETS_PARAMS)
    for leaf in jax.tree_util.tree_leaves(updates):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    assert jax.tree_util.tree_structure(state3) == \
        jax.tree_util.tree_structure(state2)
