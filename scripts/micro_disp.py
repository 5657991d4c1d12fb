"""Bisect DispResNet6 fwd+bwd time: encoder-only vs full, fp32/bf16."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
import jax.numpy as jnp
import flax.linen as nn
from cc_tpu.models.layers import DownsampleConvBlock, ResLayer

from scripts._bench_util import sync  # noqa: E402  (scalar-reduced D2H)

ENC = (32, 64, 128, 256, 512, 512, 512)

class Encoder(nn.Module):
    @nn.compact
    def __call__(self, x, training=True):
        outs = []
        h = x
        for lvl, p in enumerate(ENC):
            h = DownsampleConvBlock(p, kernel=7)(h) if lvl == 0 else \
                ResLayer(p, 2, 2)(h, training)
            outs.append(jnp.mean(h))
        return sum(outs)

r = np.random.RandomState(0)
x = jnp.asarray(r.rand(4, 256, 832, 3).astype(np.float32) * 2 - 1)

def bench(name, fn, params, iters=15):
    g = jax.jit(jax.grad(fn))
    gr = g(params); sync(jax.tree_util.tree_leaves(gr)[0])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters): gr = g(params)
        sync(jax.tree_util.tree_leaves(gr)[0])
        best = min(best, (time.perf_counter()-t0)/iters)
    print(f"{name:32s} {best*1e3:8.1f} ms", flush=True)

enc = Encoder()
v0 = enc.init(jax.random.PRNGKey(0), x, training=True)
p, bs0 = v0["params"], v0["batch_stats"]
def f_enc(pp):
    out, _ = enc.apply({"params": pp, "batch_stats": bs0}, x, training=True,
                       mutable=["batch_stats"])
    return out
bench("disp encoder fwd+bwd fp32", f_enc, p)

def f_bf16(pp):
    pb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), pp)
    bsb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), bs0)
    out, _ = enc.apply({"params": pb, "batch_stats": bsb},
                       x.astype(jnp.bfloat16), training=True,
                       mutable=["batch_stats"])
    return out.astype(jnp.float32)
bench("disp encoder fwd+bwd bf16", f_bf16, p)

from cc_tpu import models
net = models.build("DispResNet6")
v = net.init(jax.random.PRNGKey(0), x, training=True)
params = v["params"]
def full(pp):
    out = net.apply({"params": pp, "batch_stats": v.get("batch_stats", {})},
                    x, training=True, mutable=["batch_stats"])
    return sum(jnp.mean(d) for d in out[0])
bench("dispresnet6 full fwd+bwd fp32", full, params)
