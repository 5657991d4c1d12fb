"""Forward-parity tests: reference torch nets vs our flax nets with
imported weights. This is the strongest architectural-parity evidence —
identical outputs (fp32 tolerance) imply identical layer geometry, padding,
upsampling, correlation, and activation semantics.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cc_tpu import models
from cc_tpu.train.torch_import import convert_state_dict
from tests.ref_compat import (
    reference_available, load_reference, to_torch_nchw, from_torch_nchw,
)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference/torch unavailable")

B, H, W = 1, 64, 128
KEY = jax.random.PRNGKey(0)


def _ref_models():
    import sys
    load_reference()  # pins align_corners=True grid_sample
    import torch
    # Back2Future hardcodes .cuda() in its constructor and warp(); neuter it
    # so the reference net runs on CPU for comparison.
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    import models as ref_models
    return ref_models


def rand_img(seed=0):
    r = np.random.RandomState(seed)
    return (r.rand(B, H, W, 3).astype(np.float32) * 2 - 1)


def assert_close(ours, theirs, tol=2e-4):
    ours = np.asarray(ours)
    theirs = from_torch_nchw(theirs) if theirs.dim() == 4 else \
        theirs.detach().numpy()
    scale = max(1.0, float(np.abs(theirs).max()))
    np.testing.assert_allclose(ours, theirs, atol=tol * scale, rtol=tol)


def make_pair(arch, **kw):
    """(torch_net.eval(), jitted flax apply, variables w/ imported weights)."""
    import torch
    ref_models = _ref_models()
    tnet = getattr(ref_models, arch)(**kw) if arch != "Back2Future" else \
        ref_models.Back2Future(nlevels=6)
    tnet.eval()
    params, batch_stats = convert_state_dict(arch, tnet.state_dict())
    net = models.build(arch, **kw)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    class _Jitted:
        """net.apply jitted — eager flax apply is pathologically slow on
        CPU backends (one tiny XLA compile per op)."""
        def __init__(self):
            self._fn = jax.jit(net.apply, static_argnames=("training",))

        def apply(self, variables, *args, **kwargs):
            return self._fn(variables, *args, **kwargs)

    return tnet, _Jitted(), variables


@pytest.mark.parametrize("arch", ["DispNetS", "DispNetS6", "DispResNet6",
                                  "DispResNetS6"])
def test_dispnet_forward_parity(arch):
    import torch
    tnet, net, variables = make_pair(arch)
    x = rand_img()
    ours = net.apply(variables, jnp.asarray(x), training=False)
    with torch.no_grad():
        theirs = tnet(to_torch_nchw(x))
    assert_close(ours[..., 0], theirs[:, 0])


@pytest.mark.parametrize("arch", ["PoseNetB6", "PoseNet6"])
def test_posenet_forward_parity(arch):
    import torch
    tnet, net, variables = make_pair(arch, nb_ref_imgs=4)
    tgt = rand_img()
    refs = [rand_img(i + 1) for i in range(4)]
    ours = net.apply(variables, jnp.asarray(tgt),
                     [jnp.asarray(r) for r in refs])
    with torch.no_grad():
        theirs = tnet(to_torch_nchw(tgt), [to_torch_nchw(r) for r in refs])
    assert_close(ours, theirs)


def test_poseexpnet_forward_parity():
    import torch
    tnet, net, variables = make_pair("PoseExpNet", nb_ref_imgs=4,
                                     output_exp=True)
    tgt = rand_img()
    refs = [rand_img(i + 1) for i in range(4)]
    mask, pose = net.apply(variables, jnp.asarray(tgt),
                           [jnp.asarray(r) for r in refs], training=False)
    with torch.no_grad():
        tmask, tpose = tnet(to_torch_nchw(tgt),
                            [to_torch_nchw(r) for r in refs])
    assert_close(pose, tpose)
    assert_close(mask, tmask)


@pytest.mark.parametrize("arch", ["MaskNet6", "MaskResNet6"])
def test_masknet_forward_parity(arch):
    import torch
    tnet, net, variables = make_pair(arch, nb_ref_imgs=4)
    tgt = rand_img()
    refs = [rand_img(i + 1) for i in range(4)]
    ours = net.apply(variables, jnp.asarray(tgt),
                     [jnp.asarray(r) for r in refs], training=False)
    with torch.no_grad():
        theirs = tnet(to_torch_nchw(tgt), [to_torch_nchw(r) for r in refs])
    assert_close(ours, theirs)


def test_flownetc_forward_parity():
    import torch
    tnet, net, variables = make_pair("FlowNetC6")
    x1, x2 = rand_img(), rand_img(1)
    ours = net.apply(variables, jnp.asarray(x1), jnp.asarray(x2),
                     training=False)
    with torch.no_grad():
        theirs = tnet(to_torch_nchw(x1), to_torch_nchw(x2))
    assert_close(ours, theirs, tol=5e-4)


def test_back2future_forward_parity():
    import torch
    tnet, net, variables = make_pair("Back2Future")
    tgt = rand_img()
    refs = [rand_img(1), rand_img(2)]
    f_fwd, f_bwd, occ = net.apply(variables, jnp.asarray(tgt),
                                  [jnp.asarray(r) for r in refs],
                                  training=False)
    with torch.no_grad():
        t_fwd, t_bwd, t_occ = tnet(to_torch_nchw(tgt),
                                   [to_torch_nchw(r) for r in refs])
    assert_close(f_fwd, t_fwd, tol=5e-4)
    assert_close(f_bwd, t_bwd, tol=5e-4)
    assert_close(occ, t_occ, tol=5e-4)
