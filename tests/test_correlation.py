"""Correlation cost-volume tests: brute-force oracle + permutation parity."""
import numpy as np
import pytest
import jax.numpy as jnp

from cc_tpu.ops.correlation import correlation_xla, b2f_channel_permutations


def brute_force_corr(f1, f2, patch, dilation=1):
    b, h, w, c = f1.shape
    r = patch // 2
    out = np.zeros((b, h, w, patch * patch), dtype=np.float32)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                for pi in range(patch):
                    for pj in range(patch):
                        yy = y + (pi - r) * dilation
                        xx = x + (pj - r) * dilation
                        if 0 <= yy < h and 0 <= xx < w:
                            out[bi, y, x, pi * patch + pj] = (
                                f1[bi, y, x] @ f2[bi, yy, xx]) / c
    return out


@pytest.mark.parametrize("patch,dilation", [(3, 1), (9, 1), (5, 2)])
def test_correlation_matches_bruteforce(patch, dilation):
    r = np.random.RandomState(0)
    f1 = r.randn(1, 10, 12, 4).astype(np.float32)
    f2 = r.randn(1, 10, 12, 4).astype(np.float32)
    ours = np.asarray(correlation_xla(jnp.asarray(f1), jnp.asarray(f2),
                                      patch, dilation))
    exp = brute_force_corr(f1, f2, patch, dilation)
    np.testing.assert_allclose(ours, exp, rtol=1e-5, atol=1e-5)


def test_b2f_permutations_match_reference_construction():
    # The reference builds idx = flatten([range(n, -1, -9) for n in 80..72])
    # (back2future.py:56-59). Verify our closed form reproduces it.
    idx = [list(range(n, -1, -9)) for n in range(80, 71, -1)]
    idx = list(np.array(idx).flatten())
    fwd, bwd = b2f_channel_permutations(9)
    np.testing.assert_array_equal(fwd, np.array(idx))
    np.testing.assert_array_equal(bwd, np.array(list(reversed(idx))))


def test_b2f_permutation_semantics():
    # fwd permutation == transpose + flip both axes of the 9x9 grid;
    # bwd == transpose.
    fwd, bwd = b2f_channel_permutations(9)
    grid = np.arange(81).reshape(9, 9)
    np.testing.assert_array_equal(fwd.reshape(9, 9),
                                  grid.T[::-1, ::-1])
    np.testing.assert_array_equal(bwd.reshape(9, 9), grid.T)
