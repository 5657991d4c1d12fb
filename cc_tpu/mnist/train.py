"""MNIST CC training: two jitted steps (compete / collaborate), one per
alternation phase — the exact E/M semantics of mnist.py:324-413.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from cc_tpu.mnist.model import LeNet

sg = jax.lax.stop_gradient


@dataclasses.dataclass(frozen=True)
class MnistConfig:
    lr: float = 2e-4
    momentum: float = 0.9
    beta: float = 0.999
    weight_decay: float = 0.0
    wr: float = 1.0           # moderator regularization weight
    fix_alice: bool = False
    fix_bob: bool = False
    fix_mod: bool = False


@flax.struct.dataclass
class MnistState:
    params: dict
    opt_compete: Any
    opt_collaborate: Any
    step: jnp.ndarray


def _optimizers(cfg: MnistConfig):
    def adam():
        chain = []
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
        chain.append(optax.scale_by_adam(b1=cfg.momentum, b2=cfg.beta,
                                         eps=1e-8))
        chain.append(optax.scale(-cfg.lr))
        return optax.chain(*chain)

    # compete: all three nets (minus fixed); collaborate: moderator only
    # (mnist.py:220-227)
    compete_labels = {
        "alice": "freeze" if cfg.fix_alice else "train",
        "bob": "freeze" if cfg.fix_bob else "train",
        "mod": "freeze" if cfg.fix_mod else "train",
    }
    collab_labels = {"alice": "freeze", "bob": "freeze",
                     "mod": "freeze" if cfg.fix_mod else "train"}
    opt_compete = optax.multi_transform(
        {"train": adam(), "freeze": optax.set_to_zero()}, compete_labels)
    opt_collab = optax.multi_transform(
        {"train": adam(), "freeze": optax.set_to_zero()}, collab_labels)
    return opt_compete, opt_collab


def init_mnist_state(cfg: MnistConfig, key) -> MnistState:
    nets = models()
    keys = jax.random.split(key, 3)
    x = jnp.zeros((1, 28, 28, 1))
    params = {
        "alice": nets["alice"].init(keys[0], x)["params"],
        "bob": nets["bob"].init(keys[1], x)["params"],
        "mod": nets["mod"].init(keys[2], x)["params"],
    }
    opt_c, opt_m = _optimizers(cfg)
    return MnistState(params=params, opt_compete=opt_c.init(params),
                      opt_collaborate=opt_m.init(params),
                      step=jnp.zeros((), jnp.int32))


def models():
    return {"alice": LeNet(10), "bob": LeNet(10), "mod": LeNet(1)}


def _forward_losses(params, img, target):
    nets = models()
    pred_alice = nets["alice"].apply({"params": params["alice"]}, img)
    pred_bob = nets["bob"].apply({"params": params["bob"]}, img)
    pred_mod = nets["mod"].apply({"params": params["mod"]}, img)
    ce = lambda logits: optax.softmax_cross_entropy_with_integer_labels(
        logits, target)
    return pred_alice, pred_bob, pred_mod[:, 0], ce(pred_alice), ce(pred_bob)


def mod_regularization_loss(pred_mod):
    """relu(|var(sigmoid(mod)) - 0.25| - 0.05) (mnist.py:104-106)."""
    var = jnp.var(jax.nn.sigmoid(pred_mod), ddof=1)
    return jax.nn.relu(jnp.abs(var - 0.25) - 0.05)


def make_compete_step(cfg: MnistConfig):
    opt_c, _ = _optimizers(cfg)

    def loss_fn(params, img, target):
        _, _, pred_mod, loss_alice, loss_bob = _forward_losses(params, img,
                                                               target)
        if cfg.fix_bob:
            loss = jnp.mean(loss_alice)
        elif cfg.fix_alice:
            loss = jnp.mean(loss_bob)
        else:
            w = sg(jax.nn.sigmoid(pred_mod))  # moderator detached
            loss = jnp.mean(w * loss_alice + (1 - w) * loss_bob)
        metrics = {"loss": loss, "loss_alice": jnp.mean(loss_alice),
                   "loss_bob": jnp.mean(loss_bob),
                   "mod_mean": jnp.mean(jax.nn.sigmoid(pred_mod))}
        return loss, metrics

    @jax.jit
    def step(state: MnistState, img, target):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img, target)
        updates, new_opt = opt_c.update(grads, state.opt_compete,
                                        state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, opt_compete=new_opt,
                             step=state.step + 1), metrics
    return step


def make_collaborate_step(cfg: MnistConfig):
    _, opt_m = _optimizers(cfg)

    def loss_fn(params, img, target):
        _, _, pred_mod, loss_alice, loss_bob = _forward_losses(params, img,
                                                               target)
        la, lb = sg(loss_alice), sg(loss_bob)  # classifiers detached
        s = jax.nn.sigmoid(pred_mod)
        loss1 = jnp.mean(s * la + (1 - s) * lb)
        pseudo = sg((la < lb).astype(pred_mod.dtype))
        loss2 = jnp.mean(optax.sigmoid_binary_cross_entropy(pred_mod, pseudo))
        loss = loss1 + loss2 + cfg.wr * mod_regularization_loss(pred_mod)
        metrics = {"loss": loss, "loss_alice": jnp.mean(loss_alice),
                   "loss_bob": jnp.mean(loss_bob),
                   "mod_mean": jnp.mean(s)}
        return loss, metrics

    @jax.jit
    def step(state: MnistState, img, target):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img, target)
        updates, new_opt = opt_m.update(grads, state.opt_collaborate,
                                        state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, opt_collaborate=new_opt,
                             step=state.step + 1), metrics
    return step


@jax.jit
def predict(params, img):
    """(total, alice, bob) label predictions; total picks alice where
    sigmoid(mod) > 0.5 (mnist.py:432-438)."""
    pred_alice, pred_bob, pred_mod, _, _ = _forward_losses(
        params, img, jnp.zeros((img.shape[0],), jnp.int32))
    la = jnp.argmax(pred_alice, axis=1)
    lb = jnp.argmax(pred_bob, axis=1)
    pick_alice = jax.nn.sigmoid(pred_mod) > 0.5
    return jnp.where(pick_alice, la, lb), la, lb


def evaluate(params, batches):
    """[1-acc_total, 1-acc_alice, 1-acc_bob] over an iterable of
    (img, target) numpy batches (mnist.py:416-463)."""
    import numpy as np
    correct = np.zeros(3)
    count = 0
    for img, target in batches:
        total, la, lb = predict(params, jnp.asarray(img))
        correct += [np.sum(np.asarray(p) == target) for p in (total, la, lb)]
        count += len(target)
    acc = correct / count
    return [1 - a for a in acc], ["Total loss", "alice loss", "bob loss"]
