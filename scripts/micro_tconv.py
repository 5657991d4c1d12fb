"""ConvTranspose lowering shootout: lhs_dilation vs 4-phase decomposition."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
import jax.numpy as jnp

from scripts._bench_util import sync  # noqa: E402  (scalar-reduced D2H)

def bench(name, f, *args, iters=20):
    g = jax.jit(f)
    out = g(*args); sync(jnp.sum(out))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters): out = g(*args)
        sync(jnp.sum(out))
        best = min(best, (time.perf_counter()-t0)/iters)
    print(f"{name:46s} {best*1e3:8.3f} ms", flush=True)

r = np.random.RandomState(0)

def dn_for(x, w):
    return jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC","HWIO","NHWC"))

def tconv_dil(x, w, k=3, p=1, op=1):
    pad = (k-1-p, k-1-p+op)
    return jax.lax.conv_general_dilated(x, w, (1,1), (pad,pad),
        lhs_dilation=(2,2), dimension_numbers=dn_for(x, w))

def tconv_phase(x, w, k=3, p=1, op=1):
    """Exact 4-phase decomposition of stride-2 ConvTranspose.
    out[2i+py, 2j+px] = sum_{u,v: (u+py-p) even-aligned} ...
    Equivalent: out_phase(py,px) = conv(x, w_phase) where w_phase takes
    kernel taps w[u,v] with u ≡ (py + k-1-p) mod 2 (dilated-input zeros
    skipped)."""
    b, h, win, cin = x.shape
    cout = w.shape[-1]
    lo = k - 1 - p
    phases = {}
    for py in range(2):
        for px in range(2):
            # dilated-domain position of out (y=2i+py): input taps at
            # dilated idx (2i+py) - lo + u must be even (real pixels)
            us = [u for u in range(k) if (py - lo + u) % 2 == 0]
            vs = [v for v in range(k) if (px - lo + v) % 2 == 0]
            wk = w[np.ix_(us, vs)]
            # input start: i0 = ceil((lo - py)/2) offset -> implement via pad
            # For k3 p1 op1 (lo=1): py=0: us=[1]; py=1: us=[0,2]
            pys = [( (py - lo + u)//2 ) for u in us]  # relative input rows
            pxs = [( (px - lo + v)//2 ) for v in vs]
            # conv with kernel size len(us) x len(vs), padding chosen so
            # output[i] = sum_u wk[u] x[i + pys[u]]
            pad_y = (-pys[0], pys[-1] + 0) if pys else (0,0)
            pad_y = (max(0,-pys[0]), max(0, pys[-1] - (len(us)-1) + (len(us)-1)))
            # simpler: explicit pad then VALID conv
            py_lo, py_hi = max(0, -pys[0]), max(0, pys[-1])
            px_lo, px_hi = max(0, -pxs[0]), max(0, pxs[-1])
            xp = jnp.pad(x, ((0,0),(py_lo, py_hi),(px_lo, px_hi),(0,0)))
            out = jax.lax.conv_general_dilated(
                xp, wk, (1,1), "VALID", dimension_numbers=dn_for(xp, wk))
            phases[(py,px)] = out
    # interleave: out[., 2i+py, 2j+px, .] = phases[(py,px)][., i, j, .]
    h2 = phases[(0,0)].shape[1]; w2 = phases[(0,0)].shape[2]
    out = jnp.stack([phases[(0,0)], phases[(0,1)],
                     phases[(1,0)], phases[(1,1)]], axis=-2)  # [b,h2,w2,4,c]
    out = out.reshape(b, h2, w2, 2, 2, cout).transpose(0,1,3,2,4,5)
    return out.reshape(b, h2*2, w2*2, cout)

x = jnp.asarray(r.rand(4, 128, 416, 32).astype(np.float32))
w = jnp.asarray(r.rand(3, 3, 32, 16).astype(np.float32) * 0.1)
a = tconv_dil(x, w)
b2 = tconv_phase(x, w)
print("shapes", a.shape, b2.shape, "maxdiff",
      float(jnp.max(jnp.abs(a - b2))))
bench("tconv lhs_dil 32->16 @128x416->256x832", tconv_dil, x, w)
bench("tconv 4-phase 32->16 @128x416->256x832", tconv_phase, x, w)
x5 = jnp.asarray(r.rand(4, 32, 104, 512).astype(np.float32))
w5 = jnp.asarray(r.rand(3, 3, 512, 512).astype(np.float32) * 0.02)
bench("tconv lhs_dil 512->512 @32x104->64x208", tconv_dil, x5, w5)
bench("tconv 4-phase 512->512 @32x104->64x208", tconv_phase, x5, w5)
