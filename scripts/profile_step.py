"""Per-fusion / per-conv attribution of the CC train step on the real TPU.

VERDICT r2 weak #1: the ~95 ms conv+layout bucket (45% of the step) had
only a one-line diagnosis. This script produces the evidence: per-category
totals, a per-conv table (ms/step, net/layer from the XLA tf_op scope,
model_flops -> effective TF/s, fwd/dgrad/wgrad classification), and a
layout-copy ("data formatting") table with achieved GB/s — so the top
offenders can be attacked individually.

Method: run the canonical step (832x256 b4 fp32 by default) under
jax.profiler.trace, parse plugins/profile/*/*.trace.json.gz (Chrome trace;
device-stream events carry args.{hlo_category, long_name, tf_op,
model_flops, bytes_accessed, source_stack}), sum durations per op name
over N traced steps.

Usage:  python scripts/profile_step.py [--steps 3] [--dtype float32]
        [--csv /tmp/convs.csv] [--parse-only]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TRACE_DIR = "/tmp/cc_trace_r3"


def run_traced(steps: int, dtype: str, h: int, w: int, b: int):
    import jax.numpy as jnp
    from scripts._bench_util import sync
    from cc_tpu.train import (TrainConfig, make_models, init_state,
                              build_train_step)

    cfg = TrainConfig(height=h, width=w, batch_size=b, wssim=0.997,
                      smoothness_type="edgeaware", mask_loss_weight=0.1,
                      flow_photo_loss_weight=0.5, cam_photo_loss_weight=1.0,
                      smooth_loss_weight=0.1, consensus_loss_weight=0.3,
                      lr=1e-4, compute_dtype=dtype,
                      # same env knobs as bench.py: lets the tracer attribute
                      # the guarded-recipe overhead per-op
                      clip_grad_norm=float(
                          os.environ.get("CC_BENCH_CLIP_GRAD", "0")),
                      skip_nonfinite_updates=bool(int(
                          os.environ.get("CC_BENCH_SKIP_NONFINITE", "0"))))
    mods = make_models(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = build_train_step(cfg, mods, donate=True)
    r = np.random.RandomState(0)
    k = np.array([[w * .6, 0, w / 2], [0, h * 1.2, h / 2], [0, 0, 1]],
                 np.float32)[None].repeat(b, 0)
    batch = {"tgt": jnp.asarray(r.rand(b, h, w, 3).astype(np.float32)),
             "refs": jnp.asarray(r.rand(b, 4, h, w, 3).astype(np.float32)),
             "intrinsics": jnp.asarray(k),
             "intrinsics_inv": jnp.asarray(np.linalg.inv(k))}
    for _ in range(3):  # warm + let donation settle
        state, m = step(state, batch)
    sync(m["loss"])
    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(steps):
            state, m = step(state, batch)
        sync(m["loss"])
    wall = (time.perf_counter() - t0) / steps
    print(f"# traced {steps} steps, wall {wall*1e3:.1f} ms/step "
          f"(incl. trace overhead)", flush=True)


def load_events():
    paths = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"),
                   key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no trace under {TRACE_DIR}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return [e for e in data.get("traceEvents", [])
            if e.get("ph") == "X" and isinstance(e.get("args"), dict)
            and "hlo_category" in e["args"]]


_OUT_SHAPE = re.compile(r"\[([\d,]+)\]")


def out_dims(a) -> list[int]:
    s = a.get("shape_with_layout", "")
    m = _OUT_SHAPE.search(s)
    return [int(x) for x in m.group(1).split(",")] if m else []


def repo_frame(a) -> str:
    """Deepest /root/repo frame in the source stack (the op's model line)."""
    for line in a.get("source_stack", "").splitlines():
        line = line.strip()
        if line.startswith("/root/repo") and "/tests/" not in line:
            parts = line.split(":")
            return f"{os.path.basename(parts[0])}:{parts[1]}"
    src = a.get("source", "")
    return os.path.basename(src) if src else "?"


def scope(a) -> str:
    """Shortened tf_op: net + layer path."""
    t = a.get("tf_op", "").rstrip(":")
    t = t.replace("jit(step)/", "").replace("conv_general_dilated", "conv")
    return t


def conv_kind(a) -> str:
    t = a.get("tf_op", "")
    if "transpose(" not in t:
        return "fwd"
    od = out_dims(a)
    # wgrad produces a kernel-shaped output (spatial dims <= 8, no batch);
    # XLA may permute dims, so test: two dims <= 8 and total size small
    if len(od) >= 2 and sorted(od)[0] <= 8 and sorted(od)[1] <= 8 and \
            int(np.prod(od)) < 4 * 1024 * 1024:
        return "wgrad"
    return "dgrad"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=832)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse the existing trace without running")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    if not args.parse_only:
        run_traced(args.steps, args.dtype, args.h, args.w, args.b)

    evs = load_events()
    by_name = defaultdict(lambda: [0.0, 0, None])
    for e in evs:
        rec = by_name[e.get("name", "?")]
        rec[0] += e.get("dur", 0) / 1e3  # us -> ms
        rec[1] += 1
        rec[2] = e["args"]
    n = args.steps
    total = sum(r[0] for r in by_name.values()) / n
    print(f"# {len(by_name)} distinct ops, device total {total:.1f} ms/step\n")

    # ---- table A: per-category
    by_cat = defaultdict(float)
    for rec in by_name.values():
        by_cat[rec[2].get("hlo_category", "?")] += rec[0] / n
    print("== per-category ms/step ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms:8.2f}  {cat}")

    # ---- table B: convolution fusions, grouped by tf_op scope
    conv_groups = defaultdict(lambda: [0.0, 0, 0.0, None])  # ms, cnt, flops
    for name, (dur, cnt, a) in by_name.items():
        if a.get("hlo_category") != "convolution fusion":
            continue
        key = (scope(a), conv_kind(a))
        g = conv_groups[key]
        g[0] += dur / n
        g[1] += cnt / n  # float: an op can run fewer times than n steps
        g[2] += float(a.get("model_flops", 0)) * (cnt / n)
        g[3] = a
    rows = []
    for (sc, kind), (ms, cnt, flops, a) in conv_groups.items():
        tfs = flops / (ms / 1e3) / 1e12 if ms > 0 else 0.0
        rows.append((ms, tfs, kind, cnt, sc, repo_frame(a),
                     "x".join(map(str, out_dims(a)))))
    rows.sort(key=lambda r: -r[0])
    conv_ms = sum(r[0] for r in rows)
    by_kind = defaultdict(float)
    by_net = defaultdict(float)
    for ms, tfs, kind, cnt, sc, src, od in rows:
        by_kind[kind] += ms
        m = re.search(r"(?:jvp|transpose\(jvp)\((\w+)\)", sc)
        by_net[m.group(1) if m else "?"] += ms
    print(f"\n== convolution fusions: {conv_ms:.1f} ms/step ==")
    print("   kinds: " + "  ".join(f"{k}={v:.1f}ms"
                                   for k, v in sorted(by_kind.items())))
    print("   nets:  " + "  ".join(f"{k}={v:.1f}ms"
                                   for k, v in sorted(by_net.items(),
                                                      key=lambda kv: -kv[1])))
    print(f"{'ms/st':>7} {'TF/s':>6} {'kind':5} {'n':>2}  out_shape        "
          f"scope @line")
    for ms, tfs, kind, cnt, sc, src, od in rows[:args.top]:
        print(f"{ms:7.2f} {tfs:6.1f} {kind:5} {cnt:4.1f}  {od:16s} {sc} @{src}")

    # ---- table C: data formatting (layout copies), grouped by shape sig
    fmt_groups = defaultdict(lambda: [0.0, 0, 0.0, None])
    for name, (dur, cnt, a) in by_name.items():
        if a.get("hlo_category") != "data formatting":
            continue
        ln = a.get("long_name", "")
        # signature: result-type <- operand-type (strip instr names)
        sig = re.sub(r"%[\w.\-]+", "", ln)
        sig = re.sub(r"\s+", " ", sig).strip()[:110]
        g = fmt_groups[sig]
        g[0] += dur / n
        g[1] += cnt / n  # float: an op can run fewer times than n steps
        g[2] += float(a.get("bytes_accessed", 0)) * (cnt / n)
        g[3] = a
    frows = [(ms, cnt, byts / (ms / 1e3) / 1e9 if ms else 0, sig,
              repo_frame(a), scope(a))
             for sig, (ms, cnt, byts, a) in fmt_groups.items()]
    frows.sort(key=lambda r: -r[0])
    fmt_ms = sum(r[0] for r in frows)
    print(f"\n== data formatting (layout copies): {fmt_ms:.1f} ms/step in "
          f"{sum(r[1] for r in frows)} ops ==")
    print(f"{'ms/st':>7} {'n':>3} {'GB/s':>6}  signature  @line  scope")
    for ms, cnt, gbs, sig, src, sc in frows[:args.top]:
        print(f"{ms:7.2f} {cnt:5.1f} {gbs:6.0f}  {sig}  @{src}  {sc[:60]}")

    # ---- table D: loop fusions by repo source line
    loop_groups = defaultdict(lambda: [0.0, 0])
    for name, (dur, cnt, a) in by_name.items():
        if a.get("hlo_category") not in ("loop fusion", "reduce",
                                         "custom fusion"):
            continue
        key = (a.get("hlo_category"), repo_frame(a))
        loop_groups[key][0] += dur / n
        loop_groups[key][1] += cnt / n
    lrows = sorted(((ms, cnt, cat, src)
                    for (cat, src), (ms, cnt) in loop_groups.items()),
                   key=lambda r: -r[0])
    print(f"\n== loop/custom fusions + reduces by source line ==")
    for ms, cnt, cat, src in lrows[:args.top]:
        print(f"{ms:7.2f} {cnt:5.1f}x {cat:16s} @{src}")

    if args.csv:
        import csv
        with open(args.csv, "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["ms_per_step", "tflops", "kind", "count", "scope",
                         "source", "out_shape"])
            for r in rows:
                wr.writerow(r)
        print(f"\n# conv table -> {args.csv}")


if __name__ == "__main__":
    main()
