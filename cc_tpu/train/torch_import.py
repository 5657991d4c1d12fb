"""Import the reference's published torch checkpoints into cc_tpu params.

The reference ships pretrained .pth.tar files (README.md:117, 5 per
experiment: {dispnet,posenet,masknet,flownet}_*.pth.tar with
{'epoch','state_dict'}). This module maps every architecture's torch
state_dict onto our flax param/batch_stats trees:

- Conv2d weight [O,I,kh,kw]  -> kernel [kh,kw,I,O]  (transpose 2,3,1,0)
- ConvTranspose2d weight [I,O,kh,kw] -> kernel [kh,kw,I,O] with a spatial
  flip (our ConvTranspose is an input-dilated conv; see models/layers.py)
- BatchNorm2d weight/bias -> scale/bias; running stats -> batch_stats

Mappings are explicit per model family; a converted net's forward equals the
torch net's forward to float32 tolerance (tested in
tests/test_torch_import.py).
"""
from __future__ import annotations

import numpy as np


def _conv_w(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _tconv_w(w):
    w = np.asarray(w)
    return np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


class _TreeWriter:
    def __init__(self):
        self.params: dict = {}
        self.batch_stats: dict = {}

    @staticmethod
    def _set(tree, path, value):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def conv(self, sd, torch_prefix, my_path, bias=True):
        self._set(self.params, my_path + "/kernel",
                  _conv_w(sd[torch_prefix + ".weight"]))
        if bias:
            self._set(self.params, my_path + "/bias",
                      np.asarray(sd[torch_prefix + ".bias"]))

    def tconv(self, sd, torch_prefix, my_path, bias=True):
        self._set(self.params, my_path + "/kernel",
                  _tconv_w(sd[torch_prefix + ".weight"]))
        if bias:
            self._set(self.params, my_path + "/bias",
                      np.asarray(sd[torch_prefix + ".bias"]))

    def bn(self, sd, torch_prefix, my_path):
        self._set(self.params, my_path + "/scale",
                  np.asarray(sd[torch_prefix + ".weight"]))
        self._set(self.params, my_path + "/bias",
                  np.asarray(sd[torch_prefix + ".bias"]))
        self._set(self.batch_stats, my_path + "/mean",
                  np.asarray(sd[torch_prefix + ".running_mean"]))
        self._set(self.batch_stats, my_path + "/var",
                  np.asarray(sd[torch_prefix + ".running_var"]))


def _basic_block(w, sd, tpfx, mpfx, has_proj):
    w.conv(sd, f"{tpfx}.conv1", f"{mpfx}/Conv_0/Conv_0", bias=False)
    w.conv(sd, f"{tpfx}.conv2", f"{mpfx}/Conv_1/Conv_0", bias=False)
    if has_proj:
        w.conv(sd, f"{tpfx}.downsample.0", f"{mpfx}/Conv_2/Conv_0",
               bias=False)
        w.bn(sd, f"{tpfx}.downsample.1", f"{mpfx}/BatchNorm_0")


def _res_layer(w, sd, tpfx, mpfx, blocks, in_planes, planes, stride):
    for b in range(blocks):
        has_proj = b == 0 and (stride != 1 or in_planes != planes)
        _basic_block(w, sd, f"{tpfx}.{b}", f"{mpfx}/BasicBlock_{b}", has_proj)


def convert_dispnet(sd, variant: str) -> _TreeWriter:
    w = _TreeWriter()
    resnet = variant in ("DispResNet6", "DispResNetS6")
    n_scales = 4 if variant == "DispNetS" else 6
    enc_planes = [32, 64, 128, 256, 512, 512, 512]
    enc_blocks = ({"DispResNet6": [2] * 6,
                   "DispResNetS6": [2, 2, 3, 3, 3, 3]}.get(variant))
    dec_blocks = ({"DispResNet6": [1] * 7,
                   "DispResNetS6": [2, 2, 2, 2, 1, 1, 1]}.get(variant))
    dec_planes = [512, 512, 256, 128, 64, 32, 16]

    # encoder
    w.conv(sd, "conv1.0", "DownsampleConvBlock_0/Conv_0/Conv_0")
    w.conv(sd, "conv1.2", "DownsampleConvBlock_0/Conv_1/Conv_0")
    for i in range(2, 8):
        if resnet:
            _res_layer(w, sd, f"conv{i}", f"ResLayer_{i - 2}",
                       enc_blocks[i - 2], enc_planes[i - 2],
                       enc_planes[i - 1], 2)
        else:
            w.conv(sd, f"conv{i}.0",
                   f"DownsampleConvBlock_{i - 1}/Conv_0/Conv_0")
            w.conv(sd, f"conv{i}.2",
                   f"DownsampleConvBlock_{i - 1}/Conv_1/Conv_0")

    # decoder: levels 7..1 in call order
    enc_skip = [None, 16 + 1, 32 + 64 + 1, 64 + 128 + 1, 128 + 256,
                256 + 512, 512 + 512, 512 + 512]
    for j, lev in enumerate(range(7, 0, -1)):
        w.tconv(sd, f"upconv{lev}.0", f"UpconvReLU_{j}/ConvTranspose_0")
        if resnet:
            in_ch = enc_skip[lev] if lev >= 2 else 16 + 1
            _res_layer(w, sd, f"iconv{lev}", f"_IconvRes_{j}/ResLayer_0",
                       dec_blocks[j], in_ch, dec_planes[j], 1)
        else:
            w.conv(sd, f"iconv{lev}.0",
                   f"_IconvPlain_{j}/ConvReLU_0/Conv_0/Conv_0")
    top = 6 if n_scales == 6 else 4
    for k, lev in enumerate(range(top, 0, -1)):
        w.conv(sd, f"predict_disp{lev}.0", f"PredictDisp_{k}/Conv_0/Conv_0")
    return w


def convert_posenet(sd, variant: str) -> _TreeWriter:
    w = _TreeWriter()
    if variant == "PoseNetB6":
        for i in range(1, 9):
            w.conv(sd, f"conv{i}.0", f"ConvReLU_{i - 1}/Conv_0/Conv_0")
        w.conv(sd, "pose_pred", "Conv_0/Conv_0")
    elif variant == "PoseNet6":
        w.conv(sd, "conv0.0", "ConvReLU_0/Conv_0/Conv_0")
        for i in range(1, 8):
            w.conv(sd, f"conv{i}.0", f"ConvReLU_{i}/Conv_0/Conv_0")
        w.conv(sd, "pose_pred", "Conv_0/Conv_0")
    elif variant == "PoseExpNet":
        for i in range(1, 8):
            w.conv(sd, f"conv{i}.0", f"ConvReLU_{i - 1}/Conv_0/Conv_0")
        w.conv(sd, "pose_pred", "Conv_0/Conv_0")
        if any(k.startswith("upconv5") for k in sd):
            for j, lev in enumerate(range(5, 0, -1)):
                w.tconv(sd, f"upconv{lev}.0",
                        f"Upconv4ReLU_{j}/ConvTranspose_0")
            for k, lev in enumerate((4, 3, 2, 1)):
                w.conv(sd, f"predict_mask{lev}",
                       f"Conv_{k + 1}/Conv_0")
    else:
        raise ValueError(variant)
    return w


def convert_masknet(sd, variant: str) -> _TreeWriter:
    w = _TreeWriter()
    planes = [16, 32, 64, 128, 256, 256]
    if variant == "MaskNet6":
        for i in range(1, 7):
            w.conv(sd, f"conv{i}.0", f"ConvReLU_{i - 1}/Conv_0/Conv_0")
    else:  # MaskResNet6
        w.conv(sd, "conv1.0", "ConvReLU_0/Conv_0/Conv_0")
        for i in range(2, 7):
            _res_layer(w, sd, f"conv{i}", f"ResLayer_{i - 2}", 2,
                       planes[i - 2], planes[i - 1], 2)
    for j, lev in enumerate(range(6, 0, -1)):
        w.tconv(sd, f"deconv{lev}.0", f"Upconv4ReLU_{j}/ConvTranspose_0")
    for k in range(6):
        w.conv(sd, f"pred_mask{k + 1}", f"Conv_{k}/Conv_0")
    return w


def convert_back2future(sd) -> _TreeWriter:
    w = _TreeWriter()
    for lvl in range(1, 7):
        for s in "abc":
            w.conv(sd, f"conv{lvl}{s}.0", f"conv{lvl}{s}/Conv_0/Conv_0")
            w.conv(sd, f"conv{lvl}{s}.2", f"conv{lvl}{s}/Conv_1/Conv_0")
    decs = [f"decoder_fwd{l}" for l in range(2, 7)]
    decs += [f"decoder_bwd{l}" for l in range(2, 7)]
    decs += [f"decoder_occ{l}" for l in range(2, 7)]
    for name in decs:
        for j, t_idx in enumerate((0, 2, 4, 6, 8, 10)):
            w.conv(sd, f"{name}.{t_idx}", f"{name}/Conv_{j}/Conv_0")
    return w


def convert_flownetc(sd) -> _TreeWriter:
    w = _TreeWriter()
    convs = ["conv1", "conv2", "conv3", "conv_redir", "conv3_1", "conv4",
             "conv4_1", "conv5", "conv5_1", "conv6", "conv6_1"]
    for name in convs:
        w.conv(sd, f"{name}.0", f"{name}/Conv_0/Conv_0")
    for lev in range(1, 6):
        w.tconv(sd, f"deconv{lev}.0", f"deconv{lev}/ConvTranspose_0")
    for lev in range(1, 7):
        w.conv(sd, f"predict_flow{lev}", f"predict_flow{lev}/Conv_0/Conv_0")
    for a, b in ((6, 5), (5, 4), (4, 3), (3, 2), (2, 1)):
        w.tconv(sd, f"upsampled_flow{a}_to_{b}",
                f"up{a}to{b}/ConvTranspose_0")
    return w


_CONVERTERS = {
    "DispNetS": lambda sd: convert_dispnet(sd, "DispNetS"),
    "DispNetS6": lambda sd: convert_dispnet(sd, "DispNetS6"),
    "DispResNet6": lambda sd: convert_dispnet(sd, "DispResNet6"),
    "DispResNetS6": lambda sd: convert_dispnet(sd, "DispResNetS6"),
    "PoseNetB6": lambda sd: convert_posenet(sd, "PoseNetB6"),
    "PoseNet6": lambda sd: convert_posenet(sd, "PoseNet6"),
    "PoseExpNet": lambda sd: convert_posenet(sd, "PoseExpNet"),
    "MaskNet6": lambda sd: convert_masknet(sd, "MaskNet6"),
    "MaskResNet6": lambda sd: convert_masknet(sd, "MaskResNet6"),
    "Back2Future": lambda sd: convert_back2future(sd),
    "FlowNetC6": lambda sd: convert_flownetc(sd),
}


def convert_state_dict(arch: str, state_dict) -> tuple[dict, dict]:
    """torch state_dict -> (params, batch_stats) numpy trees."""
    sd = {k.replace("module.", "", 1): v.numpy() if hasattr(v, "numpy")
          else np.asarray(v) for k, v in state_dict.items()}
    writer = _CONVERTERS[arch](sd)
    return writer.params, writer.batch_stats


def _check_compatible(name, converted, target):
    import jax
    conv_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    tgt_flat = dict(jax.tree_util.tree_flatten_with_path(target)[0])
    missing = set(tgt_flat) - set(conv_flat)
    extra = set(conv_flat) - set(tgt_flat)
    if missing or extra:
        raise ValueError(
            f"{name}: converted tree mismatch. missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]}")
    for k in tgt_flat:
        if conv_flat[k].shape != tgt_flat[k].shape:
            raise ValueError(
                f"{name}: shape mismatch at {k}: "
                f"{conv_flat[k].shape} vs {tgt_flat[k].shape}")


def load_torch_checkpoint(path: str, arch: str):
    """Read a reference .pth.tar and convert ({'epoch','state_dict'} or a
    bare state_dict)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_state_dict(arch, sd)


def maybe_load_torch_weights(cfg, state, disp=None, pose=None, mask=None,
                             flow=None):
    """Replace per-net params in a TrainState from torch checkpoints."""
    arch = {"disp": cfg.dispnet, "pose": cfg.posenet, "mask": cfg.masknet,
            "flow": cfg.flownet}
    params = dict(state.params)
    batch_stats = dict(state.batch_stats)
    for net, path in (("disp", disp), ("pose", pose), ("mask", mask),
                      ("flow", flow)):
        if path is None:
            continue
        print(f"=> loading pretrained torch weights for {net} from {path}")
        p, bs = load_torch_checkpoint(path, arch[net])
        _check_compatible(net, p, params[net])
        params[net] = p
        if bs:
            _check_compatible(net + "/bn", bs, batch_stats[net])
            batch_stats[net] = bs
    return state.replace(params=params, batch_stats=batch_stats)
