"""Both ConvTranspose lowerings (input-dilated vs depth-to-space) must be
exact reimplementations of the same linear map (models/layers.py). The
torch forward-parity tests exercise the default (d2s) lowering against
nn.ConvTranspose2d; this checks the two lowerings against each other on
the model zoo's two (k, p, op) cases including odd spatial sizes."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cc_tpu.models.layers import ConvTranspose

CASES = [(3, 1, 1, 13, 17, 5, 7), (4, 1, 0, 13, 17, 5, 7),
         (3, 1, 1, 8, 8, 16, 16), (4, 1, 0, 32, 52, 8, 12)]


@pytest.mark.parametrize("k,p,op,H,W,ci,co", CASES)
def test_d2s_matches_dilated(k, p, op, H, W, ci, co, monkeypatch):
    r = np.random.RandomState(k * 100 + H)
    x = jnp.asarray(r.rand(2, H, W, ci).astype(np.float32) - 0.5)
    m = ConvTranspose(co, k, 2, p, op)
    v = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CC_TPU_TCONV", "d2s")
    y1 = m.apply(v, x)
    monkeypatch.setenv("CC_TPU_TCONV", "dilated")
    y0 = m.apply(v, x)
    assert y0.shape == y1.shape
    scale = max(1.0, float(jnp.abs(y0).max()))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5 * scale)
