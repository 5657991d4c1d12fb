"""bf16 soak: N steps of the full CC train step at 832x256 on TPU with
finiteness checks every CHECK steps (VERDICT r01 item 6). On failure,
prints the full metrics dict and dumps the last finite state + params
max-abs per net for diagnosis."""
import os, sys, time, pickle
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/cc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from cc_tpu.train import TrainConfig, make_models, init_state, build_train_step

steps = int(os.environ.get("CC_SOAK_STEPS", "2000"))
check = int(os.environ.get("CC_SOAK_CHECK", "100"))
# state snapshots pull the full ~GB state through the (slow) remote D2H
# tunnel — keep them coarse even when the scalar check is fine-grained
snap = int(os.environ.get("CC_SOAK_SNAP", str(max(check, 100))))
dtype = os.environ.get("CC_SOAK_DTYPE", "bfloat16")
clip = float(os.environ.get("CC_SOAK_CLIP", "0"))
skipnf = os.environ.get("CC_SOAK_SKIPNF", "0") == "1"
cfg = TrainConfig(height=256, width=832, batch_size=4, wssim=0.997,
                  smoothness_type="edgeaware", mask_loss_weight=0.1,
                  flow_photo_loss_weight=0.5, cam_photo_loss_weight=1.0,
                  smooth_loss_weight=0.1, consensus_loss_weight=0.3,
                  lr=1e-4, compute_dtype=dtype, clip_grad_norm=clip,
                  skip_nonfinite_updates=skipnf)
mods = make_models(cfg)
state = init_state(cfg, jax.random.PRNGKey(0))
step = build_train_step(cfg, mods, donate=True)
r = np.random.RandomState(0)
k = np.array([[832*0.6,0,416],[0,256*1.2,128],[0,0,1]], np.float32)[None].repeat(4,0)
batches = []
for i in range(8):
    batches.append({
        "tgt": jnp.asarray(r.rand(4,256,832,3).astype(np.float32)*2-1),
        "refs": jnp.asarray(r.rand(4,4,256,832,3).astype(np.float32)*2-1),
        "intrinsics": jnp.asarray(k),
        "intrinsics_inv": jnp.asarray(np.linalg.inv(k))})
t0 = time.time()
last_good = None
consec_bad = 0  # with skip_nonfinite_updates a transient nan LOSS is the
                # guard working (update dropped); only persistent nan or
                # non-finite PARAMS fail the soak
last_snap_step = 0
for i in range(steps):
    if (i % snap) == 0:
        # keep a host copy BEFORE the next window (donation invalidates)
        last_good_candidate = jax.device_get(state)
        snap_step_candidate = i
    state, m = step(state, batches[i % 8])
    if (i+1) % check == 0:
        mh = {kk: float(np.asarray(jax.device_get(vv))) for kk, vv in m.items()}
        ok = np.isfinite(mh["loss"])
        print(f"step {i+1}: {mh} ({(i+1)/(time.time()-t0):.2f} steps/s)",
              flush=True)
        if not ok and skipnf:
            # the guard's contract is params-finite, not loss-finite: a
            # collapsed (absorbing inf) objective keeps producing nan
            # losses while every update is skipped — count and continue
            consec_bad += 1
            pfinite = all(
                bool(np.all(np.isfinite(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(
                    jax.device_get(state).params))
            print(f"  [skipnf] nan loss #{consec_bad}; params finite="
                  f"{pfinite}", flush=True)
            ok = pfinite
        elif ok:
            consec_bad = 0
        if not ok:
            if last_good is None:  # failed before any passing check:
                last_good = last_good_candidate  # the step-0 snapshot
                last_snap_step = snap_step_candidate
            with open("/tmp/soak_last_good.pkl", "wb") as f:
                pickle.dump({"state": last_good, "step": last_snap_step}, f)
            for net, p in jax.device_get(state).params.items():
                mx = max(float(np.abs(np.asarray(x)).max())
                         for x in jax.tree_util.tree_leaves(p))
                fin = all(bool(np.all(np.isfinite(np.asarray(x))))
                          for x in jax.tree_util.tree_leaves(p))
                print(f"  params[{net}]: max_abs={mx:.3e} finite={fin}",
                      flush=True)
            raise SystemExit(f"non-finite at step {i+1}")
        if last_good is None or snap_step_candidate > last_snap_step:
            last_good, last_snap_step = last_good_candidate, snap_step_candidate
print(f"SOAK OK: {steps} {dtype} steps at 832x256 b4 "
      f"(params finite throughout; {consec_bad and 'trailing ' or ''}"
      f"nan-loss checks at end: {consec_bad}")
