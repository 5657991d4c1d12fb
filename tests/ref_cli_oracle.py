"""Run the reference's own eval CLIs in-process on CPU as metric oracles.

The BASELINE north star is metric parity: the same checkpoint + dataset must
produce abs_rel / EPE numbers matching the reference's eval scripts. The
reference CLIs are torch-0.4-era code depending on packages absent or removed
here (path.py, pypng, skimage, torchvision, blessings/progressbar,
scipy.misc.imread/imresize). This module installs minimal shims for those
imports — faithful where numerics matter (imresize's toimage/bytescale
round-half-up, PIL-RGB imread, pypng 16-bit row iteration) — then imports the
reference CLI and calls its main() with patched argv, capturing the printed
metric rows.

Read-only oracle use of /root/reference; nothing is copied into cc_tpu.
"""
from __future__ import annotations

import contextlib
import importlib
import io
import os
import re
import sys
import types

import numpy as np

from tests.ref_compat import REFERENCE_PATH, _install_correlation_shim


class RefPath(str):
    """Minimal stand-in for path.py's Path (a str subclass)."""

    def __div__(self, other):
        return RefPath(os.path.join(str(self), str(other)))

    __truediv__ = __div__

    def joinpath(self, *parts):
        return RefPath(os.path.join(str(self), *map(str, parts)))

    def dirname(self):
        return RefPath(os.path.dirname(str(self)))

    def isfile(self):
        return os.path.isfile(str(self))

    def isdir(self):
        return os.path.isdir(str(self))

    def exists(self):
        return os.path.exists(str(self))

    def makedirs_p(self):
        os.makedirs(str(self), exist_ok=True)
        return self

    def files(self, pattern="*"):
        import glob
        return [RefPath(p) for p in
                sorted(glob.glob(os.path.join(str(self), pattern)))
                if os.path.isfile(p)]

    def dirs(self, pattern="*"):
        import glob
        return [RefPath(p) for p in
                sorted(glob.glob(os.path.join(str(self), pattern)))
                if os.path.isdir(p)]

    def relpathto(self, dest):
        return RefPath(os.path.relpath(str(dest), str(self)))

    @property
    def name(self):
        return RefPath(os.path.basename(str(self)))

    def basename(self):
        return RefPath(os.path.basename(str(self)))

    def stripext(self):
        return RefPath(os.path.splitext(str(self))[0])

    @property
    def namebase(self):
        return RefPath(os.path.splitext(os.path.basename(str(self)))[0])

    @property
    def ext(self):
        return os.path.splitext(str(self))[1]


def _bytescale(data):
    """old scipy.misc.bytescale: min-max to [0,255], round half up."""
    data = np.asarray(data)
    cmin, cmax = float(data.min()), float(data.max())
    scale = 255.0 / (cmax - cmin) if cmax > cmin else 1.0
    byte = (data - cmin) * scale
    return (byte.clip(0, 255) + 0.5).astype(np.uint8)


def _imread(path, mode=None):
    from PIL import Image
    im = Image.open(str(path))
    if mode is not None:
        im = im.convert(mode)
    return np.asarray(im)


def _imresize(arr, size, interp="bilinear", mode=None):
    from PIL import Image
    arr = np.asarray(arr)
    img8 = arr if arr.dtype == np.uint8 else _bytescale(arr)
    im = Image.fromarray(img8)
    if isinstance(size, (int, float)):
        raise NotImplementedError("fractional imresize not needed by oracle")
    h, w = int(size[0]), int(size[1])
    resample = {"nearest": Image.NEAREST, "bilinear": Image.BILINEAR,
                "bicubic": Image.BICUBIC, "cubic": Image.BICUBIC,
                "lanczos": Image.LANCZOS}[interp]
    return np.asarray(im.resize((w, h), resample))


def _imrotate(*a, **k):
    raise NotImplementedError(
        "scipy.misc.imrotate shim: only reachable from the train-time "
        "RandomRotate transform, which the eval oracles never use")


def _imsave(path, arr):
    """old scipy.misc.imsave via toimage: channel-first (3, H, W) arrays
    (run_inference.py writes 255*tensor2array outputs, which are CHW)
    are transposed to HWC; uint8 data is written as-is."""
    from PIL import Image
    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[0] in (3, 4) and arr.shape[-1] not in (
            3, 4):
        arr = arr.transpose(1, 2, 0)
    if arr.dtype != np.uint8:
        arr = _bytescale(arr)
    Image.fromarray(arr).save(str(path))


class _PngReader:
    """pypng Reader shim good for flow_io.flow_read_png's asDirect() use."""

    def __init__(self, fpath):
        self.path = str(fpath)

    def asDirect(self):
        import cv2
        img = cv2.imread(self.path, cv2.IMREAD_UNCHANGED)
        assert img is not None, self.path
        img = img[..., ::-1]  # cv2 BGR -> (u, v, valid) plane order
        h, w = img.shape[:2]
        rows = (img[r].reshape(-1) for r in range(h))
        return w, h, rows, {}


class _PngWriter:
    """pypng Writer shim good for flow_io.flow_write_png's 16-bit use."""

    def __init__(self, width, height, bitdepth=16, planes=3, **k):
        assert bitdepth == 16 and planes == 3
        self.width, self.height = width, height

    def write(self, fil, rows):
        import cv2
        arr = np.asarray(list(rows), dtype=np.uint16).reshape(
            self.height, self.width, 3)
        ok, buf = cv2.imencode(".png", arr[..., ::-1])  # RGB -> cv2 BGR
        assert ok
        fil.write(buf.tobytes())


_installed = False


def install_shims():
    """Install era-dependency shims + CPU patches (idempotent)."""
    global _installed
    if _installed:
        return
    _installed = True

    path_mod = types.ModuleType("path")
    path_mod.Path = RefPath
    sys.modules.setdefault("path", path_mod)

    skimage = types.ModuleType("skimage")
    skimage.transform = types.ModuleType("skimage.transform")
    sys.modules.setdefault("skimage", skimage)
    sys.modules.setdefault("skimage.transform", skimage.transform)

    png_mod = types.ModuleType("png")
    png_mod.Reader = _PngReader
    png_mod.Writer = _PngWriter
    sys.modules.setdefault("png", png_mod)

    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.datasets = types.ModuleType("torchvision.datasets")

    class _Unused:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise NotImplementedError("torchvision shim is import-only")

    # --- functional transforms, numerics-faithful to torchvision's PIL
    # path (mnist_eval.py:76-82 builds real pipelines from these)
    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class _ToTensor:
        def __call__(self, pic):
            import torch
            arr = np.asarray(pic, np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            chw = arr.transpose(2, 0, 1).astype(np.float32) / 255.0
            return torch.from_numpy(chw)

    class _Normalize:
        def __init__(self, mean, std):
            self.mean = np.asarray(mean, np.float32)
            self.std = np.asarray(std, np.float32)

        def __call__(self, t):
            import torch
            return (t - torch.from_numpy(self.mean)[:, None, None]) \
                / torch.from_numpy(self.std)[:, None, None]

    class _Resize:
        def __init__(self, size):
            self.size = size  # (h, w)

        def __call__(self, img):
            from PIL import Image
            h, w = (self.size if isinstance(self.size, (tuple, list))
                    else (self.size, self.size))
            return img.resize((w, h), Image.BILINEAR)

    class _Grayscale:
        def __init__(self, num_output_channels=1):
            assert num_output_channels == 1

        def __call__(self, img):
            return img.convert("L")

    tv.transforms.ToPILImage = _Unused
    tv.transforms.ToTensor = _ToTensor
    tv.transforms.Compose = _Compose
    tv.transforms.Normalize = _Normalize
    tv.transforms.Resize = _Resize
    tv.transforms.Grayscale = _Grayscale

    # --- datasets, matching torchvision's on-disk layouts and __getitem__
    # contracts (PIL image + int target); download flags are ignored —
    # the fixtures fabricate the files
    class _MNIST:
        def __init__(self, root, train=True, transform=None,
                     target_transform=None, download=False):
            import gzip
            import struct

            def _open(p):
                return (gzip.open(p + ".gz", "rb")
                        if os.path.exists(p + ".gz") else open(p, "rb"))

            def _find(name):
                for sub in ("", "MNIST/raw", "raw"):
                    p = os.path.join(str(root), sub, name)
                    if os.path.exists(p) or os.path.exists(p + ".gz"):
                        return p
                raise FileNotFoundError(f"{name} not under {root}")

            prefix = "train" if train else "t10k"
            with _open(_find(f"{prefix}-images-idx3-ubyte")) as f:
                magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
                assert magic == 2051
                self.data = np.frombuffer(f.read(), np.uint8).reshape(
                    n, rows, cols)
            with _open(_find(f"{prefix}-labels-idx1-ubyte")) as f:
                magic, n = struct.unpack(">II", f.read(8))
                assert magic == 2049
                self.targets = np.frombuffer(f.read(), np.uint8)
            self.transform = transform
            self.target_transform = target_transform

        def __len__(self):
            return len(self.data)

        def __getitem__(self, i):
            from PIL import Image
            img = Image.fromarray(self.data[i], mode="L")
            if self.transform is not None:
                img = self.transform(img)
            target = int(self.targets[i])
            if self.target_transform is not None:
                target = self.target_transform(target)
            return img, target

    class _SVHN:
        def __init__(self, root, split="train", transform=None,
                     target_transform=None, download=False):
            from scipy.io import loadmat
            mat = loadmat(os.path.join(str(root), f"{split}_32x32.mat"))
            # torchvision layout: [N, 3, 32, 32]; __getitem__ -> HWC PIL
            self.data = np.transpose(mat["X"], (3, 2, 0, 1))
            self.labels = mat["y"].astype(np.int64).squeeze()
            np.place(self.labels, self.labels == 10, 0)
            self.transform = transform
            self.target_transform = target_transform

        def __len__(self):
            return len(self.data)

        def __getitem__(self, i):
            from PIL import Image
            img = Image.fromarray(np.transpose(self.data[i], (1, 2, 0)))
            if self.transform is not None:
                img = self.transform(img)
            target = int(self.labels[i])
            if self.target_transform is not None:
                target = self.target_transform(target)
            return img, target

    tv.datasets.MNIST = _MNIST
    tv.datasets.SVHN = _SVHN
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    sys.modules.setdefault("torchvision.datasets", tv.datasets)

    class _AnyAttrModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):  # keep inspect/import machinery sane
                raise AttributeError(name)
            return _Unused

    sys.modules.setdefault("blessings", _AnyAttrModule("blessings"))
    sys.modules.setdefault("progressbar", _AnyAttrModule("progressbar"))

    import scipy.misc as scipy_misc
    scipy_misc.imread = _imread
    scipy_misc.imresize = _imresize
    scipy_misc.imrotate = _imrotate
    scipy_misc.imsave = _imsave

    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _install_correlation_shim()

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


@contextlib.contextmanager
def _numpy1_compat():
    """numpy-1.x behaviors the reference relies on, scoped to an oracle run
    so the rest of the suite still tests cc_tpu against real numpy-2
    semantics: the removed scalar aliases (np.int at
    depth_evaluation_utils.py:180) and generator arguments to np.stack
    (pose_evaluation_utils.py:20)."""
    added = []
    for name, alias in (("int", int), ("float", float), ("bool", bool)):
        if name not in np.__dict__:
            setattr(np, name, alias)
            added.append(name)
    orig_stack = np.stack

    def lenient_stack(arrays, *a, **k):
        if not hasattr(arrays, "__getitem__"):
            arrays = list(arrays)
        return orig_stack(arrays, *a, **k)

    np.stack = lenient_stack
    try:
        yield
    finally:
        np.stack = orig_stack
        for name in added:
            delattr(np, name)


def _patch_validation_flow_len(n: int, root: str | None = None):
    """ValidationFlow.__len__ returns its N argument (200 by default) no
    matter how many samples exist on disk — and test_back2future.py even
    hardcodes the author's dataset root — so cap N (and optionally override
    root) for tiny fixture trees. State is reset on every
    run_reference_cli call, never carried between tests. The reference
    call sites pass root as the first arg (kwarg everywhere today); the
    wrapper handles it positionally too, leaving the rest untouched."""
    import datasets.validation_flow as vf
    for cls_name in ("ValidationFlow", "ValidationMask",
                     "ValidationFlowKitti2012", "KITTI2015Test"):
        cls = getattr(vf, cls_name, None)
        if cls is not None and not getattr(cls, "_oracle_capped", False):
            orig_init = cls.__init__

            def capped(self, *a, _orig=orig_init, **k):
                k["N"] = min(k.get("N", 200), _patch_validation_flow_len.n)
                override = _patch_validation_flow_len.root
                if override is not None:
                    if "root" in k:
                        k["root"] = override
                    else:
                        a = (override,) + a[1:]
                _orig(self, *a, **k)

            cls.__init__ = capped
            cls._oracle_capped = True
    _patch_validation_flow_len.n = n
    _patch_validation_flow_len.root = root


_patch_validation_flow_len.n = 200
_patch_validation_flow_len.root = None


def run_reference_cli(module_name: str, argv: list[str],
                      n_samples: int | None = None,
                      dataset_root: str | None = None) -> str:
    """Import a reference CLI module and run main() under no_grad with
    patched argv; returns captured stdout."""
    install_shims()
    import torch
    # reset (not accumulate) the dataset patch state on every run
    _patch_validation_flow_len(n_samples if n_samples is not None else 200,
                               dataset_root)
    mod = importlib.import_module(module_name)
    old_argv = sys.argv
    sys.argv = [f"{module_name}.py"] + list(argv)
    buf = io.StringIO()
    try:
        with _numpy1_compat(), torch.no_grad(), \
                contextlib.redirect_stdout(buf):
            mod.main()
    finally:
        sys.argv = old_argv
    return buf.getvalue()


# float literals incl. exponent-only reprs like 5e-05 (repr of small floats)
FLOAT_RE = r"-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+"


def parse_metric_rows(text: str, n: int) -> list[np.ndarray]:
    """Extract every line containing exactly n float literals (metric rows
    like 'Errors \\t 0.1, 0.2' or 'mean \\t 0.1, 0.2')."""
    rows = []
    for line in text.splitlines():
        vals = [float(x) for x in re.findall(FLOAT_RE, line)]
        if len(vals) == n:
            rows.append(np.array(vals))
    return rows
