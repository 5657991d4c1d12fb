"""Checkpoint/resume round-trip (orbax composite pytree + best promotion)."""
import os

import numpy as np
import pytest
import jax

from cc_tpu.train import TrainConfig, init_state
from cc_tpu.train.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def state():
    cfg = TrainConfig(height=128, width=128, batch_size=2, wssim=0.3,
                      mask_loss_weight=0.1, lr=1e-4)
    return init_state(cfg, jax.random.PRNGKey(0))


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_save_load_roundtrip(tmp_path, state):
    d = str(tmp_path / "exp")
    save_checkpoint(d, state, is_best=True)
    assert os.path.isdir(os.path.join(d, "checkpoint"))
    assert os.path.isdir(os.path.join(d, "best"))

    import jax.numpy as jnp
    perturbed = state.replace(step=state.step + 7)
    restored = load_checkpoint(d, perturbed)
    assert tree_equal(restored.params, state.params)
    assert int(restored.step) == int(state.step)
    assert tree_equal(restored.opt_state, state.opt_state)


def test_best_promotion_only_when_best(tmp_path, state):
    d = str(tmp_path / "exp2")
    save_checkpoint(d, state, is_best=False)
    assert os.path.isdir(os.path.join(d, "checkpoint"))
    assert not os.path.exists(os.path.join(d, "best"))
    save_checkpoint(d, state.replace(step=state.step + 1), is_best=True)
    assert os.path.isdir(os.path.join(d, "best"))
