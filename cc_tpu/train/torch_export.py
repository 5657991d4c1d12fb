"""Export cc_tpu flax params to reference-format torch state_dicts.

The inverse of torch_import.py: produces a state_dict the reference
codebase loads verbatim (net.load_state_dict(torch.load(p)['state_dict']),
e.g. /root/reference/train.py:247-262), so checkpoints round-trip between
the frameworks in both directions.

The key mapping is not duplicated: torch_import's per-architecture
converters are replayed with a recording writer that captures
(kind, torch_key, flax_path) triples instead of reading tensor values,
and each triple's inverse transform is applied here:

- conv   kernel [kh,kw,I,O] -> weight [O,I,kh,kw]
- tconv  kernel [kh,kw,I,O] -> weight [I,O,kh,kw] + spatial flip (our
         ConvTranspose is an input-dilated conv; see models/layers.py)
- bn     scale/bias/mean/var -> weight/bias/running_mean/running_var
         (+ num_batches_tracked=0, required by strict load_state_dict)
"""
from __future__ import annotations

import numpy as np

from cc_tpu.train import torch_import as _ti


class _RecordingWriter(_ti._TreeWriter):
    """Captures the (torch_key, flax_path) mapping a converter implies."""

    def __init__(self):
        super().__init__()
        self.entries: list[tuple[str, str, str]] = []  # (kind, tkey, path)

    def conv(self, sd, torch_prefix, my_path, bias=True):
        self.entries.append(("conv_w", torch_prefix + ".weight",
                             my_path + "/kernel"))
        if bias:
            self.entries.append(("plain", torch_prefix + ".bias",
                                 my_path + "/bias"))

    def tconv(self, sd, torch_prefix, my_path, bias=True):
        self.entries.append(("tconv_w", torch_prefix + ".weight",
                             my_path + "/kernel"))
        if bias:
            self.entries.append(("plain", torch_prefix + ".bias",
                                 my_path + "/bias"))

    def bn(self, sd, torch_prefix, my_path):
        self.entries.append(("plain", torch_prefix + ".weight",
                             my_path + "/scale"))
        self.entries.append(("plain", torch_prefix + ".bias",
                             my_path + "/bias"))
        self.entries.append(("bn_mean", torch_prefix + ".running_mean",
                             my_path + "/mean"))
        self.entries.append(("bn_var", torch_prefix + ".running_var",
                             my_path + "/var"))


class _KeysOnly:
    """Stand-in sd for converter feature probes (key membership only)."""

    def __init__(self, keys):
        self._keys = list(keys)

    def __iter__(self):
        return iter(self._keys)


def _get(tree, path):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return np.asarray(node)


def _has_path(tree, path):
    node = tree
    for p in path.split("/"):
        if not isinstance(node, dict) or p not in node:
            return False
        node = node[p]
    return True


def record_mapping(arch: str, params: dict) -> list[tuple[str, str, str]]:
    """(kind, torch_key, flax_path) triples for one architecture."""
    # PoseExpNet's converter probes sd for the optional mask decoder; derive
    # the probe answer from the flax tree instead.
    probe_keys = []
    if arch == "PoseExpNet" and _has_path(params, "Upconv4ReLU_0"):
        probe_keys = ["upconv5.0.weight"]
    # Converters instantiate _TreeWriter via the module-global name; swap in
    # the recording subclass for the replay.
    orig = _ti._TreeWriter
    try:
        _ti._TreeWriter = _RecordingWriter
        w = _ti._CONVERTERS[arch](_KeysOnly(probe_keys))
    finally:
        _ti._TreeWriter = orig
    return w.entries


_INVERSE = {
    "conv_w": lambda a: np.ascontiguousarray(np.transpose(a, (3, 2, 0, 1))),
    "tconv_w": lambda a: np.ascontiguousarray(
        np.transpose(a, (2, 3, 0, 1))[:, :, ::-1, ::-1]),
    "plain": np.asarray,
    "bn_mean": np.asarray,
    "bn_var": np.asarray,
}


def export_state_dict(arch: str, params: dict,
                      batch_stats: dict | None = None) -> dict:
    """flax (params, batch_stats) -> reference torch state_dict (numpy)."""
    batch_stats = batch_stats or {}
    sd: dict[str, np.ndarray] = {}
    for kind, tkey, path in record_mapping(arch, params):
        tree = batch_stats if kind in ("bn_mean", "bn_var") else params
        sd[tkey] = _INVERSE[kind](_get(tree, path))
        if kind == "bn_var":
            sd[tkey.rsplit(".", 1)[0] + ".num_batches_tracked"] = \
                np.asarray(0, dtype=np.int64)
    return sd


def save_torch_checkpoint(path: str, arch: str, params: dict,
                          batch_stats: dict | None = None, epoch: int = 0):
    """Write a reference-format .pth.tar ({'epoch','state_dict'} of torch
    tensors, the layout train.py:518-538 saves and loads)."""
    import torch
    sd = export_state_dict(arch, params, batch_stats)
    tsd = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    torch.save({"epoch": epoch, "state_dict": tsd}, path)
