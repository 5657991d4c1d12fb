"""Training state: the four CC networks' variables + one Adam over all.

The reference keeps 4 separate torch modules and a single Adam over their
chained parameters (train.py:307-310). Here: one pytree
{disp, pose, mask, flow} of params (+ batch_stats for the ResNet variants'
projection BN), one optax optimizer state, one step counter — a single
donated buffer set for the fused train step.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

import cc_tpu.models as models
from cc_tpu.train.config import TrainConfig

NETS = ("disp", "pose", "mask", "flow")


@flax.struct.dataclass
class CCModels:
    disp: Any = flax.struct.field(pytree_node=False)
    pose: Any = flax.struct.field(pytree_node=False)
    mask: Any = flax.struct.field(pytree_node=False)
    flow: Any = flax.struct.field(pytree_node=False)


@flax.struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: Any
    step: jnp.ndarray


def make_models(cfg: TrainConfig) -> CCModels:
    disp = models.build(cfg.dispnet)
    pose = models.build(cfg.posenet, nb_ref_imgs=cfg.nb_ref_imgs)
    mask = models.build(cfg.masknet, nb_ref_imgs=cfg.nb_ref_imgs)
    flow = models.build(cfg.flownet, nlevels=cfg.nlevels)
    return CCModels(disp=disp, pose=pose, mask=mask, flow=flow)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam matching torch semantics (L2 weight decay added to the gradient
    before the moment updates), with per-net freezing for the CC alternation
    (the TPU-native equivalent of requires_grad=False, train.py:332-346)."""
    chain = []
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_adam(b1=cfg.momentum, b2=cfg.beta, eps=1e-8))
    chain.append(optax.scale(-cfg.lr))
    adam = optax.chain(*chain)

    frozen = {
        "disp": cfg.fix_dispnet, "pose": cfg.fix_posenet,
        "mask": cfg.fix_masknet, "flow": cfg.fix_flownet,
    }
    labels = {k: ("freeze" if frozen[k] else "train") for k in NETS}
    return optax.multi_transform(
        {"train": adam, "freeze": optax.set_to_zero()},
        param_labels=labels)


def init_state(cfg: TrainConfig, key: jax.Array,
               batch_size: int | None = None) -> TrainState:
    """Initialize all four nets (xavier-uniform like the reference's
    init_weights) and the optimizer."""
    b = batch_size or cfg.batch_size
    h, w = cfg.height, cfg.width
    img = jnp.zeros((b, h, w, 3), jnp.float32)
    refs = [img] * cfg.nb_ref_imgs
    mods = make_models(cfg)
    keys = jax.random.split(key, 4)

    # jit the inits: flax init otherwise dispatches eagerly op-by-op, which
    # is pathologically slow on CPU backends (hundreds of tiny compiles).
    v_disp = jax.jit(lambda k: mods.disp.init(k, img, training=True))(keys[0])
    v_pose = jax.jit(
        lambda k: mods.pose.init(k, img, refs, training=True))(keys[1])
    v_mask = jax.jit(
        lambda k: mods.mask.init(k, img, refs, training=True))(keys[2])
    if cfg.flownet == "Back2Future":
        v_flow = jax.jit(
            lambda k: mods.flow.init(k, img, refs[1:3], training=True))(keys[3])
    else:
        v_flow = jax.jit(
            lambda k: mods.flow.init(k, img, refs[2], training=True))(keys[3])

    params = {
        "disp": v_disp["params"], "pose": v_pose["params"],
        "mask": v_mask["params"], "flow": v_flow["params"],
    }
    batch_stats = {
        k: v.get("batch_stats", {})
        for k, v in zip(NETS, (v_disp, v_pose, v_mask, v_flow))
    }
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def apply_net(net, params, batch_stats, *args, training: bool):
    """Apply a flax module, threading batch_stats only when present.
    Returns (outputs, new_batch_stats)."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if training:
        out, mutated = net.apply(variables, *args, training=True,
                                 mutable=["batch_stats"])
        return out, mutated.get("batch_stats", {})
    return net.apply(variables, *args, training=False), batch_stats
