"""XLA compiler-option probe on the full CC train step (round-5 perf pass).

Every major bucket of the 173.6 ms fp32 step carries a source-level
reduce-or-bound argument (PARITY.md "Performance"); the remaining lever is
the COMPILER's own knobs. jax.jit(...).lower(...).compile(compiler_options=
{...}) serializes env_option_overrides into the PJRT CompileOptions proto,
so the options reach the axon server-side compiler (verified: an unknown
option name errors server-side; a known one compiles).

Usage:
  python scripts/exp_xla_flags.py probe            # cheap propagation check
  python scripts/exp_xla_flags.py baseline         # AOT no-options reference
  python scripts/exp_xla_flags.py vmem=98304       # one full-step variant
  python scripts/exp_xla_flags.py xla_tpu_foo=true # raw option passthrough

Named shortcuts: vmem=<kib> -> xla_tpu_scoped_vmem_limit_kib.
Each variant is a fresh ~10-min server-side compile; run serially.
Prints one JSON line per config: {config, steps_per_sec, frames_per_sec,
windows, loss}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x) -> float:
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def probe():
    """Propagation check: a bogus option must ERROR (proves the server sees
    the overrides); a real one must compile."""
    a = jnp.ones((256, 256), jnp.float32)
    f = jax.jit(lambda a: (a @ a).sum())
    low = f.lower(a)
    try:
        low.compile(compiler_options={"xla_cc_tpu_nonexistent_option": "1"})
        print("bogus option: ACCEPTED (overrides likely ignored!)")
    except Exception as e:  # noqa: BLE001
        print(f"bogus option: rejected ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]})")
    try:
        c = low.compile(compiler_options={
            "xla_tpu_scoped_vmem_limit_kib": "65536"})
        _sync(c(a))
        print("xla_tpu_scoped_vmem_limit_kib=65536: compiled + ran OK")
    except Exception as e:  # noqa: BLE001
        print(f"scoped_vmem option FAILED: {e}")


def run_step(options: dict[str, str], label: str):
    from cc_tpu.train import make_models, init_state, build_train_step
    from scripts._bench_util import paper_config, paper_batch

    cfg = paper_config(
        compute_dtype=os.environ.get("CC_BENCH_DTYPE", "float32"))
    b = cfg.batch_size
    mods = make_models(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    batch = paper_batch(cfg)
    jitted = build_train_step(cfg, mods, donate=True)
    t0 = time.perf_counter()
    lowered = jitted.lower(state, batch)
    step = lowered.compile(compiler_options=options or None)
    compile_s = time.perf_counter() - t0

    for _ in range(5):
        state, metrics = step(state, batch)
    _sync(metrics["loss"])
    windows = []
    steps = int(os.environ.get("CC_BENCH_STEPS", "30"))
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, batch)
        _sync(metrics["loss"])
        windows.append(steps / (time.perf_counter() - t0))
    sps = float(np.median(windows))
    print(json.dumps({
        "config": label, "options": options,
        "steps_per_sec": round(sps, 4),
        "frames_per_sec": round(sps * b, 3),
        "windows": [round(x, 3) for x in windows],
        "compile_s": round(compile_s, 1),
        "loss": _sync(metrics["loss"]),
    }), flush=True)


def main():
    args = sys.argv[1:]
    if not args or args[0] == "probe":
        probe()
        return
    options: dict[str, str] = {}
    label = ",".join(args)
    for a in args:
        if a == "baseline":
            continue
        k, _, v = a.partition("=")
        if k == "vmem":
            k = "xla_tpu_scoped_vmem_limit_kib"
        options[k] = v
    run_step(options, label)


if __name__ == "__main__":
    main()
