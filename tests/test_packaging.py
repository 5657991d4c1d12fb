"""Packaging sanity: every console script declared in pyproject.toml
resolves to an importable callable, and the declared package data exists."""
from __future__ import annotations

import importlib
import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    scripts = _pyproject()["project"]["scripts"]
    assert len(scripts) == 14  # one per CLI
    for name, target in scripts.items():
        mod_name, func = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func)), f"{name} -> {target}"


def test_cli_mains_accept_argv():
    """Every entry point takes main(argv=None) so both console scripts and
    in-process drives work."""
    import inspect
    for target in _pyproject()["project"]["scripts"].values():
        mod_name, func = target.split(":")
        main = getattr(importlib.import_module(mod_name), func)
        params = list(inspect.signature(main).parameters.values())
        assert params and params[0].name == "argv", target


@pytest.mark.parametrize("relpath", [
    "cc_tpu/data/lists/test_scenes.txt",
    "cc_tpu/data/lists/static_frames.txt",
    "cc_tpu/data/lists/test_files_eigen.txt",
    "cc_tpu/data/lists/test_files_90.txt",
    "cc_tpu/native/dataplane.cpp",
    "LICENSE",
])
def test_package_data_present(relpath):
    assert os.path.isfile(os.path.join(REPO, relpath)), relpath


def test_version_consistent():
    import cc_tpu
    assert _pyproject()["project"]["version"] == cc_tpu.__version__
