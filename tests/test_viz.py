"""Parity tests for host-side visualization (utils/viz.py) against the
reference's flowutils (flowlib.py flow_to_image, flow_viz.py
computeFlowImage).

The reference viz modules import packages absent in this environment
(pypng, torchvision, PIL); the functions under test are pure numpy, so the
oracle execs the reference source with the unloadable import lines dropped
— read-only use as a test oracle, no code is copied into the repo.
"""
from __future__ import annotations

import numpy as np
import pytest

from cc_tpu.utils.viz import (
    flow_to_image, flow_to_image_logscale, image_to_display, scalar_to_rgb)
from tests.ref_compat import REFERENCE_PATH, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not available")


def _exec_reference(relpath: str) -> dict:
    src = open(f"{REFERENCE_PATH}/{relpath}").read()
    kept = [l for l in src.splitlines()
            if not l.startswith(("import png", "from . import pfm",
                                 "from PIL", "import torch",
                                 "from torchvision"))]
    ns = {"np": np}
    exec(compile("\n".join(kept), relpath, "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def flows():
    r = np.random.RandomState(8964)
    smooth = r.randn(2, 2, 2).astype(np.float32)
    flow = np.zeros((24, 31, 2), np.float32)
    for c in range(2):
        fy = np.linspace(0, 1, 24)[:, None]
        fx = np.linspace(0, 1, 31)[None, :]
        flow[..., c] = (smooth[0, 0, c] * (1 - fy) * (1 - fx)
                        + smooth[0, 1, c] * (1 - fy) * fx
                        + smooth[1, 0, c] * fy * (1 - fx)
                        + smooth[1, 1, c] * fy * fx) * 12.0
    flow += r.randn(24, 31, 2).astype(np.float32) * 0.5
    return flow


class TestLogscaleFlowViz:
    def test_bit_exact_vs_reference(self, flows):
        ref = _exec_reference("flowutils/flow_viz.py")
        expect = ref["computeFlowImage"](flows[..., 0], flows[..., 1])
        got = flow_to_image_logscale(flows)
        assert got.dtype == np.uint8 and got.shape == expect.shape
        np.testing.assert_array_equal(got, expect.astype(np.uint8))

    def test_linear_scale_mode(self, flows):
        ref = _exec_reference("flowutils/flow_viz.py")
        expect = ref["computeFlowImage"](flows[..., 0], flows[..., 1],
                                         logscale=False, scaledown=12)
        got = flow_to_image_logscale(flows, scaledown=12, logscale=False)
        np.testing.assert_array_equal(got, expect.astype(np.uint8))


def _oracle_flowlib(flow_hw2: np.ndarray) -> np.ndarray:
    """Run flowlib.flow_to_image (CHW in, CHW float/255 out, mutates its
    input) and convert to this framework's HW3-uint8 convention."""
    ref = _exec_reference("flowutils/flowlib.py")
    chw = np.ascontiguousarray(flow_hw2.transpose(2, 0, 1)).copy()
    out = ref["flow_to_image"](chw)  # [3, H, W] float, exact ints / 255
    return np.rint(out.transpose(1, 2, 0) * 255).astype(np.uint8)


class TestMiddleburyFlowViz:
    def test_bit_exact_vs_reference(self, flows):
        got = flow_to_image(flows)
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, _oracle_flowlib(flows))

    def test_unknown_flow_masked(self, flows):
        f = flows.copy()
        f[3:5, 4:6, 0] = 1e9  # > UNKNOWN_FLOW_THRESH
        got = flow_to_image(f)
        assert (got[3:5, 4:6] == 0).all()
        np.testing.assert_array_equal(got, _oracle_flowlib(f))


class TestScalarViz:
    def test_image_to_display_range(self):
        img = np.random.RandomState(0).rand(5, 7, 3).astype(np.float32) * 2 - 1
        out = image_to_display(img)
        assert out.min() >= 0.0 and out.max() <= 1.0
        np.testing.assert_allclose(out, 0.5 + img * 0.5, rtol=1e-6)

    @pytest.mark.parametrize("cmap", ["rainbow", "magma", "bone"])
    def test_scalar_to_rgb_shapes(self, cmap):
        x = np.random.RandomState(1).rand(6, 9).astype(np.float32)
        out = scalar_to_rgb(x, colormap=cmap)
        assert out.shape == (6, 9, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0
