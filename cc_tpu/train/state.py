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
    (the TPU-native equivalent of requires_grad=False, train.py:332-346).

    Freezing leaves the frozen nets' Adam moments AND params untouched —
    like torch skipping grad=None params — and the optimizer state STRUCTURE
    is identical across phases, so checkpoints resume across --fix-* changes
    (optax.multi_transform would change the state pytree per phase)."""
    chain = []
    if cfg.clip_grad_norm:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_adam(b1=cfg.momentum, b2=cfg.beta, eps=1e-8))
    chain.append(optax.scale(-cfg.lr))
    adam = optax.chain(*chain)
    if cfg.skip_nonfinite_updates:
        # mixed-precision guard: drop (don't apply) any update computed
        # from non-finite grads; Adam moments are untouched on such steps.
        # max_consecutive_errors is effectively infinite: optax's give-up-
        # and-accept default poisons the params exactly when the failure is
        # an ABSORBING state (e.g. a diverged pose warps fully out of
        # bounds -> the reference's oob normalization divides by zero ->
        # inf loss every step) — keeping params finite and the loss
        # visibly stuck is strictly more debuggable than NaN params. The
        # ApplyIfFiniteState.total_notfinite counter is the monitor.
        adam = optax.apply_if_finite(adam, max_consecutive_errors=10**9)

    frozen = {
        "disp": cfg.fix_dispnet, "pose": cfg.fix_posenet,
        "mask": cfg.fix_masknet, "flow": cfg.fix_flownet,
    }
    if not any(frozen.values()):
        return adam

    def init(params):
        return adam.init(params)

    def update(grads, state, params=None):
        updates, new_state = adam.update(grads, state, params)
        updates = {
            k: (jax.tree_util.tree_map(jnp.zeros_like, updates[k])
                if frozen[k] else updates[k])
            for k in updates
        }

        def keep_frozen(old_leaf_tree, new_leaf_tree):
            """Per-net moment surgery: frozen nets keep their old state."""
            if not isinstance(old_leaf_tree, dict):
                return new_leaf_tree
            if set(old_leaf_tree) != set(NETS):
                return new_leaf_tree
            return {k: (old_leaf_tree[k] if frozen[k] else new_leaf_tree[k])
                    for k in old_leaf_tree}

        def fix_state(old, new):
            if isinstance(new, optax.ScaleByAdamState):
                return new._replace(mu=keep_frozen(old.mu, new.mu),
                                    nu=keep_frozen(old.nu, new.nu))
            if hasattr(new, "inner_state"):  # e.g. ApplyIfFiniteState
                return new._replace(
                    inner_state=fix_state(old.inner_state, new.inner_state))
            if isinstance(new, tuple) and not hasattr(new, "_fields"):
                return tuple(fix_state(o, n) for o, n in zip(old, new))
            return new

        return updates, fix_state(state, new_state)

    return optax.GradientTransformation(init, update)


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


def _cast_floats(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def apply_net(net, params, batch_stats, *args, training: bool,
              compute_dtype: str = "float32"):
    """Apply a flax module, threading batch_stats only when present.
    Returns (outputs, new_batch_stats).

    compute_dtype='bfloat16' runs the NET in bf16 (params, inputs,
    activations cast down; outputs and mutated batch_stats cast back to
    fp32) — master params stay fp32 and the loss graph stays fp32, the
    standard TPU mixed-precision recipe."""
    bf16 = compute_dtype == "bfloat16"
    if bf16:
        params = _cast_floats(params, jnp.bfloat16)
        args = _cast_floats(args, jnp.bfloat16)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if training:
        out, mutated = net.apply(variables, *args, training=True,
                                 mutable=["batch_stats"])
        new_bs = mutated.get("batch_stats", {})
        if bf16:
            out = _cast_floats(out, jnp.float32)
            new_bs = _cast_floats(new_bs, jnp.float32)
        return out, new_bs
    out = net.apply(variables, *args, training=False)
    if bf16:
        out = _cast_floats(out, jnp.float32)
    return out, batch_stats
