"""Round-trip tests for flax -> torch weight export (torch_export.py).

Strategy: build each reference torch net, import its state_dict into flax
params (the already-parity-tested direction), export back, and require the
result to equal the original torch state_dict bit-exactly, key for key.
That exercises every mapped tensor in both directions. A strict
load_state_dict + forward-parity check proves the exported format is what
the reference actually loads (/root/reference/train.py:247-262).
"""
import numpy as np
import pytest

from cc_tpu.train.torch_import import convert_state_dict
from cc_tpu.train.torch_export import export_state_dict
from tests.ref_compat import reference_available, load_reference

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference/torch unavailable")

ARCHS = ["DispNetS", "DispNetS6", "DispResNet6", "DispResNetS6",
         "PoseNetB6", "PoseNet6", "PoseExpNet", "MaskNet6", "MaskResNet6",
         "Back2Future", "FlowNetC6"]


def _ref_net(arch):
    import sys
    import torch
    load_reference()
    torch.Tensor.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models as ref_models
    if arch == "Back2Future":
        return ref_models.Back2Future(nlevels=6)
    if arch == "PoseExpNet":
        return ref_models.PoseExpNet(nb_ref_imgs=4, output_exp=True)
    return getattr(ref_models, arch)()


@pytest.mark.parametrize("arch", ARCHS)
def test_roundtrip_bit_exact(arch):
    tnet = _ref_net(arch)
    sd0 = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, batch_stats = convert_state_dict(arch, tnet.state_dict())
    sd1 = export_state_dict(arch, params, batch_stats)
    assert set(sd1) == set(sd0), (
        f"key mismatch: missing={sorted(set(sd0) - set(sd1))[:4]} "
        f"extra={sorted(set(sd1) - set(sd0))[:4]}")
    for k in sd0:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(sd1[k], sd0[k], err_msg=k)


def test_exported_checkpoint_loads_strict_and_matches_forward(tmp_path):
    import torch
    from cc_tpu import models
    import jax
    import jax.numpy as jnp
    from cc_tpu.train.torch_export import save_torch_checkpoint
    from tests.ref_compat import to_torch_nchw

    arch = "DispNetS6"
    tnet = _ref_net(arch)
    params, batch_stats = convert_state_dict(arch, tnet.state_dict())

    p = str(tmp_path / "dispnet_exported.pth.tar")
    save_torch_checkpoint(p, arch, params, batch_stats, epoch=7)
    ckpt = torch.load(p, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 7

    fresh = _ref_net(arch)
    fresh.load_state_dict(ckpt["state_dict"], strict=True)
    fresh.eval()

    r = np.random.RandomState(0)
    x = (r.rand(1, 64, 128, 3).astype(np.float32) * 2 - 1)
    net = models.build(arch)
    ours = jax.jit(net.apply, static_argnames=("training",))(
        {"params": params}, jnp.asarray(x), training=False)
    with torch.no_grad():
        theirs = fresh(to_torch_nchw(x))
    theirs = theirs[0] if isinstance(theirs, (list, tuple)) else theirs
    ours = ours[0] if isinstance(ours, (list, tuple)) else ours
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(),
        atol=2e-4, rtol=2e-4)
