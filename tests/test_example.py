"""The examples stay runnable: drive examples/minimal_train.py in-process
on tiny shapes (same 64x64 + edge-aware config family the multichip dryrun
proves out)."""
from __future__ import annotations

import importlib.util
import os

import numpy as np


def test_minimal_train_example(tmp_path):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "minimal_train.py")
    spec = importlib.util.spec_from_file_location("minimal_train", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    state = mod.main(["--height", "64", "--width", "64", "-b", "2",
                      "--steps", "2", "--checkpoint-dir",
                      str(tmp_path / "ckpt")])
    assert int(state.step) == 2
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(state.params)]
    assert all(np.isfinite(l).all() for l in leaves)
    assert (tmp_path / "ckpt").exists()
