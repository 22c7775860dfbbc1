"""Standalone SpecSeg training — dice + focal segmentation objective.

The reference builds dice+focal losses for SpecSeg and discards them
(SpecSeg.py:92-96); SpecSeg arrives pre-trained as specsegv3_chkpt.h5 and its
optimizer is constructed but never applied (ShmGANwithSSpecSeg.py:175). This module
makes (re)training the mask network a real capability: a jitted step over (image Y,
binary mask) pairs with BatchNorm statistics updates, dropout RNG, and the same
Adam/exp-decay recipe as the GAN.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from shmgan_tpu.config import Config
from shmgan_tpu.models import SpecSeg
from shmgan_tpu.train.losses import binary_focal_loss, dice_loss
from shmgan_tpu.train.state import lr_schedule


class SpecSegTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def create_specseg_state(cfg: Config, rng: jax.Array) -> SpecSegTrainState:
    net = SpecSeg(base_filters=cfg.model.specseg_base_filters)
    y = jnp.zeros((1, cfg.model.image_size, cfg.model.image_size,
                   cfg.model.specseg_in_channels), jnp.float32)
    variables = net.init(rng, y, train=False)
    tx = optax.chain(
        optax.clip(cfg.train.grad_clip),
        optax.scale_by_adam(b1=cfg.train.beta1, b2=cfg.train.beta2,
                            eps=cfg.train.adam_eps),
        optax.scale_by_learning_rate(
            lr_schedule(cfg.train.g_lr, cfg.train.lr_decay_steps,
                        cfg.train.lr_decay_rate)),
    )
    return SpecSegTrainState(step=jnp.zeros((), jnp.int32),
                             params=variables["params"],
                             batch_stats=variables["batch_stats"],
                             opt_state=tx.init(variables["params"]), tx=tx)


def make_specseg_train_step(cfg: Config):
    net = SpecSeg(base_filters=cfg.model.specseg_base_filters)

    def step(state: SpecSegTrainState, images: jnp.ndarray, masks: jnp.ndarray,
             rng: jax.Array) -> Tuple[SpecSegTrainState, Dict[str, jnp.ndarray]]:
        """images: (B,H,W,1) Y-channel in [0,1]; masks: (B,H,W,1) binary."""

        def loss_fn(params):
            pred, mutated = net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            d = dice_loss(pred, masks)
            f = binary_focal_loss(pred, masks)
            return d + f, (d, f, pred, mutated["batch_stats"])

        grads, (d, f, pred, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        iou = _iou(pred, masks)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"dice": d, "focal": f, "loss": d + f, "iou": iou}

    return step


def _iou(pred: jnp.ndarray, target: jnp.ndarray, thresh: float = 0.5) -> jnp.ndarray:
    """IoU at threshold 0.5 (the reference tracks sm.metrics.IOUScore(0.5),
    SpecSeg.py:96)."""
    p = (pred > thresh).astype(jnp.float32)
    t = (target > thresh).astype(jnp.float32)
    inter = jnp.sum(p * t)
    union = jnp.sum(jnp.maximum(p, t))
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-7), 1.0)


def specseg_vars_from_state(state: SpecSegTrainState):
    """Package a trained SpecSeg state as the frozen variable tree the GAN pipeline
    consumes (create_train_state(..., specseg_vars=...)) — replacing the
    reference's separate specsegv3_chkpt.h5 hand-off (ShmGANwithSSpecSeg.py:931)."""
    return {"params": state.params, "batch_stats": state.batch_stats}


def train_specseg(cfg: Config, images, masks, num_steps: int = 100,
                  batch_size: Optional[int] = None,
                  verbose: bool = False) -> SpecSegTrainState:
    """Minimal in-memory trainer: images/masks are (N,H,W,1) arrays."""
    import numpy as np

    batch_size = batch_size or cfg.train.batch_size
    rng = jax.random.PRNGKey(cfg.train.seed)
    rng, init_rng = jax.random.split(rng)
    state = create_specseg_state(cfg, init_rng)
    step = jax.jit(make_specseg_train_step(cfg), donate_argnums=(0,))

    n = images.shape[0]
    for i in range(num_steps):
        rng, k_batch, k_drop = jax.random.split(rng, 3)
        idx = jax.random.randint(k_batch, (batch_size,), 0, n)
        bi = jnp.asarray(np.asarray(images)[np.asarray(idx)])
        bm = jnp.asarray(np.asarray(masks)[np.asarray(idx)])
        state, metrics = step(state, bi, bm, k_drop)
        if verbose and (i + 1) % 20 == 0:
            print(f"[specseg {i + 1}/{num_steps}] "
                  f"loss={float(metrics['loss']):.4f} iou={float(metrics['iou']):.3f}")
    return state
