"""_DotConv lowering: path selection + numeric equivalence vs nn.Conv.

The 1x1->pixel-matmul and 3x3->tap-matmul lowerings (models/layers.py
_DotConv) are implicitly pinned by the torch forward-parity tests in fp32;
this file tests the lowering DIRECTLY, including the round-5
dtype-conditional channel cap (fp32 cap 64, bf16 cap 128 — both
measured-in-step, see docs/performance.md).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cc_tpu.models.layers import _DotConv


def _pair(cls, ci, co, k, s, dtype):
    pad = ((k - 1) // 2, (k - 1) // 2)
    kw = dict(features=co, kernel_size=(k, k), strides=(s, s),
              padding=(pad, pad), dtype=dtype)
    return cls(**kw), nn.Conv(**kw)


def _run(ci, co, k, s, dtype, h=16, w=24):
    dot_m, ref_m = _pair(_DotConv, ci, co, k, s, dtype)
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, h, w, ci).astype(np.float32))
    params = dot_m.init(jax.random.PRNGKey(1), x)
    # same param names/shapes by contract -> reuse verbatim in nn.Conv
    y_dot = dot_m.apply(params, x.astype(dtype))
    y_ref = ref_m.apply(params, x.astype(dtype))
    return np.asarray(y_dot, np.float32), np.asarray(y_ref, np.float32)


def _uses_dot_not_conv(ci, co, k, s, dtype):
    mod, _ = _pair(_DotConv, ci, co, k, s, dtype)
    x = jnp.zeros((1, 8, 8, ci), dtype)
    params = mod.init(jax.random.PRNGKey(0), x)
    jaxpr = str(jax.make_jaxpr(lambda p, x: mod.apply(p, x))(params, x))
    return "dot_general" in jaxpr and "conv_general_dilated" not in jaxpr


@pytest.mark.parametrize("ci,co,k,s", [
    (17, 16, 1, 1),   # the iconv6 shortcut shape that motivated the lowering
    (32, 64, 1, 2),   # strided 1x1 (BasicBlock downsample projection)
    (16, 32, 3, 1),   # fine 3x3 under both caps
    (64, 64, 3, 1),   # at the fp32 cap boundary
])
def test_fp32_lowering_matches_conv(ci, co, k, s):
    y_dot, y_ref = _run(ci, co, k, s, jnp.float32)
    np.testing.assert_allclose(y_dot, y_ref, rtol=2e-5, atol=2e-5)
    assert _uses_dot_not_conv(ci, co, k, s, jnp.float32)


def test_bf16_cap128_tap_path():
    """Under bf16 compute the 3x3 cap is 128 (measured +1.0% in-step, r5):
    ci=co=128 must take the tap path in bf16 and match nn.Conv to bf16
    accumulation tolerance."""
    assert _uses_dot_not_conv(128, 128, 3, 1, jnp.bfloat16)
    y_dot, y_ref = _run(128, 128, 3, 1, jnp.bfloat16)
    # 9 partial matmul sums vs one conv: bf16 reassociation tolerance
    np.testing.assert_allclose(y_dot, y_ref, rtol=5e-2, atol=5e-2)


def test_fp32_cap_excludes_128():
    """fp32 keeps cap 64 (128 measured neutral-minus in-step): ci=co=128
    must fall through to the XLA conv path."""
    assert not _uses_dot_not_conv(128, 128, 3, 1, jnp.float32)


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("CC_TPU_TAP_CAP", "256")
    assert _uses_dot_not_conv(128, 128, 3, 1, jnp.float32)
    monkeypatch.setenv("CC_TPU_TAP_CAP", "32")
    assert not _uses_dot_not_conv(64, 64, 3, 1, jnp.bfloat16)
