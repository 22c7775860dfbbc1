"""Train state: G/D params, three optimizers, frozen SpecSeg variables, step counter.

Mirrors the reference's training-state surface (ShmGANwithSSpecSeg.py:169-175,
938-943): two live Adam optimizers (G, D) sharing an exponential-decay schedule, a
third (SpecSeg) that exists but is never applied in the GAN loop, and a checkpoint
covering {G, D, optimizer_G, optimizer_D}.  Here the whole thing is one PyTree so a
single Orbax checkpoint restores training exactly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from shmgan_tpu.config import Config
from shmgan_tpu.models import SHMDiscriminator, SHMGenerator, SpecSeg


def lr_schedule(initial_lr: float, decay_steps: int = 10000,
                decay_rate: float = 0.95) -> optax.Schedule:
    """ExponentialDecay(staircase=False) (ShmGANwithSSpecSeg.py:169-171)."""
    return optax.exponential_decay(init_value=initial_lr,
                                   transition_steps=decay_steps,
                                   decay_rate=decay_rate, staircase=False)


def make_optimizer(lr: float, cfg: Config) -> optax.GradientTransformation:
    """clip(±1) -> Adam(β1, β2, eps=1e-7) with the shared exponential decay.

    The elementwise ±1 clip happens BEFORE Adam, matching tf.clip_by_value on raw
    gradients (ShmGANwithSSpecSeg.py:860,869).
    """
    return optax.chain(
        optax.clip(cfg.train.grad_clip),
        optax.scale_by_adam(b1=cfg.train.beta1, b2=cfg.train.beta2,
                            eps=cfg.train.adam_eps),
        optax.scale_by_learning_rate(
            lr_schedule(lr, cfg.train.lr_decay_steps, cfg.train.lr_decay_rate)),
    )


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray                 # global step counter (drives both schedules)
    g_params: Any
    d_params: Any
    specseg_vars: Any                 # {'params':..., 'batch_stats':...} — FROZEN
    g_opt_state: Any
    d_opt_state: Any
    g_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # EMA of g_params (cfg.train.g_ema > 0); None when disabled so the pytree
    # (and therefore the checkpoint layout) is unchanged for parity runs.
    ema_g_params: Any = None


def build_models(cfg: Config):
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    gen = SHMGenerator(filter_size=cfg.model.filter_size, c_dim=cfg.model.c_dim,
                       dtype=dtype, instance_norm_eps=cfg.model.instance_norm_eps,
                       slope=cfg.model.leaky_relu_slope,
                       in_pallas=cfg.model.use_pallas_instance_norm,
                       upsample_mode=cfg.model.upsample_mode)
    disc = SHMDiscriminator(filter_size=cfg.model.filter_size, c_dim=cfg.model.c_dim,
                            dtype=dtype, instance_norm_eps=cfg.model.instance_norm_eps,
                            slope=cfg.model.leaky_relu_slope,
                            noise_stddev=cfg.model.d_input_noise,
                            dropout_rate=cfg.model.d_dropout,
                            in_pallas=cfg.model.use_pallas_instance_norm)
    specseg = SpecSeg(base_filters=cfg.model.specseg_base_filters, dtype=dtype)
    return gen, disc, specseg


def create_train_state(cfg: Config, rng: jax.Array,
                       specseg_vars: Optional[Any] = None) -> TrainState:
    """Initialize all model params and optimizer states.

    specseg_vars: pre-trained SpecSeg variables (from checkpoint.load_specseg_h5);
    when None, randomly initialized — the real specsegv3 weights are a separate blob
    in the reference too (ShmGANwithSSpecSeg.py:931).
    """
    gen, disc, specseg = build_models(cfg)
    h = w = cfg.model.image_size
    c = cfg.model.c_dim
    kg, kd, ks = jax.random.split(rng, 3)

    x = jnp.zeros((1, h, w, 2 * c), jnp.float32)
    mask = jnp.zeros((1, h, w, 1), jnp.float32)
    rgb = jnp.zeros((1, h, w, 3), jnp.float32)
    y1 = jnp.zeros((1, h, w, cfg.model.specseg_in_channels), jnp.float32)

    g_params = gen.init(kg, x, mask)["params"]
    d_params = disc.init({"params": kd}, rgb, mask, train=False)["params"]
    if specseg_vars is None:
        specseg_vars = specseg.init(ks, y1, train=False)

    g_tx = make_optimizer(cfg.train.g_lr, cfg)
    d_tx = make_optimizer(cfg.train.d_lr, cfg)

    # a REAL copy, not jnp.asarray — the EMA tree must not alias g_params
    # buffers or donating the state donates the same buffer twice
    ema = jax.tree_util.tree_map(jnp.copy, g_params) \
        if cfg.train.g_ema > 0.0 else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params, d_params=d_params, specseg_vars=specseg_vars,
        g_opt_state=g_tx.init(g_params), d_opt_state=d_tx.init(d_params),
        g_tx=g_tx, d_tx=d_tx, ema_g_params=ema,
    )


def param_count(tree: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
