"""Round-3 microbenchs for the per-conv attribution's worst offenders.

profile_step.py (fp32, 832x256 b4) shows 18.6 of the 39.5 conv-fusion ms
running under 10 TF/s, concentrated in fine-scale tiny-channel convs:

  A  DispResNet iconv6 shortcut 1x1 ci=17 co=16 @ 832x256:
     fwd 0.59 ms (0.9 TF/s), dgrad 1.55 ms (0.3), wgrad 0.80 ms (0.7)
     -> ~3 ms for ONE pointwise conv whose bandwidth SOL is ~0.3 ms.
     Candidate: express as dot_general over flattened pixels.
  B  PredictDisp 3x3 ci=16 co=1 @ 832x256: fwd 0.20, dgrad 0.69, wgrad
     0.47 -> ~1.4 ms. Candidate: taps-accumulated dot.
  C  refs slicing in step.py:46: 4x f32[4,1,256,832,3] layout copies at
     45 GB/s = 1.8 ms. Candidate: store refs [nref,B,H,W,3] so each
     slice is contiguous-major.

Each case times fwd and fwd+grads (value_and_grad wrt x and w) with the
platform-safe sync (scalar D2H readback).

Usage: python scripts/exp_fine_convs.py [a b c]
"""
from __future__ import annotations

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts._bench_util import bench  # noqa: E402

r = np.random.RandomState(0)
B, H, W = 4, 256, 832


def conv2d(x, w, stride=1, pad=None):
    k = w.shape[0]
    p = (k - 1) // 2 if pad is None else pad
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((p, p), (p, p)), dimension_numbers=dn)


def dot1x1(x, w):
    """1x1 conv as a pixel matmul: [B,H,W,Ci] @ [Ci,Co]."""
    return jax.lax.dot_general(x, w[0, 0],
                               (((3,), (0,)), ((), ())))


def grad_wrap(f):
    def loss(x, w):
        return jnp.sum(f(x, w) ** 2)
    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))


def case_a():
    ci, co = 17, 16
    x = jnp.asarray(r.rand(B, H, W, ci).astype(np.float32))
    w = jnp.asarray(r.rand(1, 1, ci, co).astype(np.float32))
    cv = jax.jit(conv2d)
    dt = jax.jit(dot1x1)
    np.testing.assert_allclose(np.asarray(cv(x, w)), np.asarray(dt(x, w)),
                               rtol=2e-2, atol=2e-2)  # both bf16-MXU paths
    bench("A conv1x1 17->16 fwd", cv, x, w)
    bench("A dot1x1  17->16 fwd", dt, x, w)
    bench("A conv1x1 fwd+grads", grad_wrap(conv2d), x, w)
    bench("A dot1x1  fwd+grads", grad_wrap(dot1x1), x, w)


def tap_dot(x, w):
    """kxk conv (stride 1, same-pad) as k^2 tap-shifted pixel matmuls
    accumulated — no im2col materialization; each tap reads x once."""
    k = w.shape[0]
    p = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = None
    for dy in range(k):
        for dx in range(k):
            t = jax.lax.dot_general(
                xp[:, dy:dy + x.shape[1], dx:dx + x.shape[2], :],
                w[dy, dx], (((3,), (0,)), ((), ())))
            out = t if out is None else out + t
    return out


def case_b():
    ci, co = 16, 1
    x = jnp.asarray(r.rand(B, H, W, ci).astype(np.float32))
    w = jnp.asarray((r.rand(3, 3, ci, co) - 0.5).astype(np.float32))
    cv = jax.jit(conv2d)
    td = jax.jit(tap_dot)
    np.testing.assert_allclose(np.asarray(cv(x, w)), np.asarray(td(x, w)),
                               rtol=2e-2, atol=2e-2)
    bench("B conv3x3 16->1 fwd", cv, x, w)
    bench("B tapdot  16->1 fwd", td, x, w)
    bench("B conv3x3 fwd+grads", grad_wrap(conv2d), x, w)
    bench("B tapdot  fwd+grads", grad_wrap(tap_dot), x, w)


def case_c():
    """refs layout: [B,nref,H,W,3] slice-per-ref (current) vs
    [nref,B,H,W,3] leading-axis slice. Consumer mimics the real use:
    channel-concat into a posenet-stem-like conv + per-ref elementwise."""
    refs_bn = jnp.asarray(r.rand(B, 4, H, W, 3).astype(np.float32))
    refs_nb = jnp.moveaxis(refs_bn, 1, 0)
    w = jnp.asarray(r.rand(7, 7, 15, 16).astype(np.float32))

    def use(refs):
        cat = jnp.concatenate([refs[0]] + list(refs), axis=-1)
        y = conv2d(cat, w, stride=2)
        z = sum(jnp.sum(rf ** 2) for rf in refs)
        return jnp.sum(y ** 2) + z

    f_bn = jax.jit(lambda rr: use([rr[:, i] for i in range(4)]))
    f_nb = jax.jit(lambda rr: use([rr[i] for i in range(4)]))
    bench("C refs [B,4,...] slices", f_bn, refs_bn)
    bench("C refs [4,B,...] slices", f_nb, refs_nb)




def case_d():
    """3x3 fine-scale convs 17->16 and 16->16 (iconv6 BasicBlock bodies):
    conv lowering vs tap-accumulated dot."""
    for ci, co in ((17, 16), (16, 16)):
        x = jnp.asarray(r.rand(B, H, W, ci).astype(np.float32))
        w = jnp.asarray((r.rand(3, 3, ci, co) - 0.5).astype(np.float32))
        bench(f"D conv3x3 {ci}->{co} f+g", grad_wrap(conv2d), x, w)
        bench(f"D tapdot  {ci}->{co} f+g", grad_wrap(tap_dot), x, w)


if __name__ == "__main__":
    todo = [a.lower() for a in sys.argv[1:]] or ["a", "b", "c", "d"]
    for t in todo:
        {"a": case_a, "b": case_b, "c": case_c, "d": case_d}[t]()
