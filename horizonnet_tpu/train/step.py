"""SPMD train step: loss, gradients, optimizer, BN-stat update.

Reference behavior: train.py:44-58 (loss = L1(bon) + BCE-with-logits(cor)),
Adam/SGD (train.py:216-223), AMP autocast (train.py:273). TPU mapping:
- one jit'd step over a ('data','model') mesh; batch sharded on 'data',
  params/optimizer replicated; XLA/GSPMD inserts the gradient all-reduce
  (no hand-written collectives — SURVEY.md §2 parallelism note);
- mixed precision = bf16 compute dtype inside the model with f32 params
  and f32 loss (simpler and faster than AMP's dynamic loss scaling, which
  bf16 does not need thanks to its f32-equal exponent range);
- BatchNorm stats are global-batch (sync-BN) under GSPMD; documented
  deviation from DataParallel's per-replica stats.
"""

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_optimizer(optim="Adam", schedule=None, lr=1e-4, beta1=0.9,
                   weight_decay=0.0, freeze_mask=None):
    """Adam/SGD mirroring the reference's optimizer surface (train.py:216-223).

    freeze_mask: optional pytree of bools (True = trainable) implementing
    --freeze_earlier_blocks via zeroed updates.
    """
    lr_fn = schedule if schedule is not None else lr
    if optim == "Adam":
        tx = optax.adam(lr_fn, b1=beta1, b2=0.999)
    elif optim == "SGD":
        tx = optax.sgd(lr_fn, momentum=beta1)
    else:
        raise NotImplementedError(optim)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    if freeze_mask is not None:
        tx = optax.chain(tx, optax.masked(
            optax.set_to_zero(),
            jax.tree.map(lambda t: not t, freeze_mask)))
    return tx


def create_train_state(model, variables, tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=tx.init(params), tx=tx)


def loss_terms(bon_pred, cor_pred, y_bon, y_cor):
    """L1 boundary loss + BCE-with-logits corner loss (train.py:53-56)."""
    bon_loss = jnp.abs(bon_pred - y_bon).mean()
    # Numerically-stable BCE with logits: max(x,0) - x*y + log1p(exp(-|x|))
    x = cor_pred
    cor_loss = (jnp.maximum(x, 0) - x * y_cor +
                jnp.log1p(jnp.exp(-jnp.abs(x)))).mean()
    return bon_loss, cor_loss


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def train_step(model, state: TrainState, x, y_bon, y_cor, rng):
    """One optimization step. x: [B,H,W,3]; y_bon [B,2,W]; y_cor [B,1,W]."""

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"])
        bon_pred, cor_pred = out
        bon_loss, cor_loss = loss_terms(bon_pred, cor_pred, y_bon, y_cor)
        total = bon_loss + cor_loss
        return total, (bon_loss, cor_loss, mutated["batch_stats"])

    (total, (bon_loss, cor_loss, new_stats)), grads = \
        jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt)
    metrics = {"total": total, "bon": bon_loss, "cor": cor_loss}
    return new_state, metrics


@partial(jax.jit, static_argnums=(0,))
def eval_losses(model, state: TrainState, x, y_bon, y_cor):
    bon_pred, cor_pred = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False)
    bon_loss, cor_loss = loss_terms(bon_pred, cor_pred, y_bon, y_cor)
    return {"total": bon_loss + cor_loss, "bon": bon_loss, "cor": cor_loss}


def encoder_freeze_mask(params, n_frozen_blocks: int):
    """True = trainable. Freeze conv1/bn1 (block 0) and layer1..layerN.

    Mirrors --freeze_earlier_blocks (train.py:200-208, model.py:84-91).
    """
    def block_of(name):
        if name in ("conv1", "bn1", "conv0", "norm0"):
            return 0
        for i in range(1, 5):
            if name.startswith(f"layer{i}") or name.startswith(f"denseblock{i}") \
               or name.startswith(f"transition{i}"):
                return i
        if name == "norm5":
            return 4
        return None

    mask = jax.tree.map(lambda _: True, params)
    if n_frozen_blocks < 0:
        return mask
    enc = {}
    for name, sub in params["encoder"].items():
        b = block_of(name)
        trainable = b is None or b > n_frozen_blocks
        enc[name] = jax.tree.map(lambda _: trainable, sub)
    out = dict(mask)
    out["encoder"] = enc
    return out
