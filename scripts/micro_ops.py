"""Micro-benchmarks of individual net ops on the TPU (forced sync)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
import jax.numpy as jnp

from scripts._bench_util import sync  # noqa: E402  (scalar-reduced D2H)

def bench(name, f, *args, iters=20, flops=None):
    g = jax.jit(f)
    out = g(*args); sync(jnp.sum(out) if out.ndim else out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        sync(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    tf = f" {flops/best/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:42s} {best*1e3:8.3f} ms{tf}", flush=True)

r = np.random.RandomState(0)
B = 4
def t(shape): return jnp.asarray(r.rand(*shape).astype(np.float32))

def conv(x, cin, cout, k, s=1, lhs_dil=1, pad=None):
    w = t((k, k, cin, cout))
    p = (k - 1) // 2 if pad is None else pad
    def f(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC","HWIO","NHWC"))
        return jax.lax.conv_general_dilated(x, w, (s, s), ((p,p),(p,p)),
            lhs_dilation=(lhs_dil,lhs_dil), dimension_numbers=dn)
    return f, w

H, W = 256, 832
x0 = t((B, H//2, W//2, 32))
f, w = conv(x0, 32, 32, 7)
bench("k7 conv 32->32 @416x128", lambda a,b=w: f(a,b), x0,
      flops=B*(H//2)*(W//2)*32*32*49*2)
f, w = conv(x0, 32, 32, 3)
bench("k3 conv 32->32 @416x128", lambda a,b=w: f(a,b), x0,
      flops=B*(H//2)*(W//2)*32*32*9*2)
x1 = t((B, H//2, W//2, 64))
f, w = conv(x1, 64, 64, 3)
bench("k3 conv 64->64 @416x128", lambda a,b=w: f(a,b), x1,
      flops=B*(H//2)*(W//2)*64*64*9*2)
x2 = t((B, H//8, W//8, 256))
f, w = conv(x2, 256, 256, 3)
bench("k3 conv 256->256 @104x32", lambda a,b=w: f(a,b), x2,
      flops=B*(H//8)*(W//8)*256*256*9*2)
# transposed conv (input-dilated) as used by UpconvReLU k3 s2 p1 op1
xx = t((B, H//2, W//2, 32))
def tconv(x, cin, cout, k=3, p=1, op=1):
    w = t((k, k, cin, cout))
    pad = (k-1-p, k-1-p+op)
    def f(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC","HWIO","NHWC"))
        return jax.lax.conv_general_dilated(x, w, (1,1), (pad,pad),
            lhs_dilation=(2,2), dimension_numbers=dn)
    return f, w
f, w = tconv(xx, 32, 16)
bench("tconv(lhs_dil) 32->16 @416x128->832x256", lambda a,b=w: f(a,b), xx,
      flops=B*H*W*32*16*9*2//4)
x3 = t((B, H//8, W//8, 512))
f, w = tconv(x3, 512, 256)
bench("tconv(lhs_dil) 512->256 @104x32->208x64", lambda a,b=w: f(a,b), x3,
      flops=B*(H//4)*(W//4)*512*256*9*2//4)
# the same upconv decomposed: nearest-equivalent via 4 phase convs is what
# XLA should produce; measure an s1 conv at output res for reference
x4 = t((B, H, W, 32))
f, w = conv(x4, 32, 16, 3)
bench("k3 conv 32->16 @832x256 (s1 ref)", lambda a,b=w: f(a,b), x4,
      flops=B*H*W*32*16*9*2)
# first stem conv 3->32 k7 s2 @832x256
x5 = t((B, H, W, 3))
f, w = conv(x5, 3, 32, 7, s=2)
bench("k7s2 conv 3->32 @832x256", lambda a,b=w: f(a,b), x5,
      flops=B*(H//2)*(W//2)*3*32*49*2)
# batchnorm-ish reduction
bench("mean reduce @416x128x64", lambda a: jnp.mean(a, axis=(0,1,2)), x1)
