"""Pallas correlation kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import cc_tpu.ops.correlation_pallas as cp
from cc_tpu.ops.correlation import correlation_xla


@pytest.fixture(autouse=True)
def interpret_mode():
    old = cp.INTERPRET
    cp.INTERPRET = True
    yield
    cp.INTERPRET = old


def rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


@pytest.mark.parametrize("patch,dilation", [(3, 1), (9, 1), (5, 2)])
def test_forward_matches_xla(patch, dilation):
    f1 = rand((2, 8, 12, 4), 0)
    f2 = rand((2, 8, 12, 4), 1)
    out_p = cp.correlation_pallas(f1, f2, patch, dilation)
    out_x = correlation_xla(f1, f2, patch, dilation)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-6)


def test_gradients_match_xla():
    f1 = rand((1, 8, 8, 4), 2)
    f2 = rand((1, 8, 8, 4), 3)

    def loss(fn):
        return lambda a, b: jnp.sum(jnp.sin(fn(a, b, 3, 1)))

    gp = jax.grad(loss(cp.correlation_pallas), argnums=(0, 1))(f1, f2)
    gx = jax.grad(loss(correlation_xla), argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               atol=1e-5)


def test_row_tiling_choices():
    # multi-row-tile path (grid > 1 in the row dimension)
    th = cp._pick_row_tile(64, 208, 32, 9, 1)
    assert 64 % th == 0
    big = cp._pick_row_tile(32, 104, 256, 21, 2)
    assert 32 % big == 0
