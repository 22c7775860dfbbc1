"""SpecSeg standalone training: the mask network must learn a synthetic
highlight-segmentation task (loss decreases, IoU improves)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import synth_polar_scene
from shmgan_tpu.train.specseg_train import (
    create_specseg_state, make_specseg_train_step, train_specseg,
)


def small_config() -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32,
                                    specseg_base_filters=4)
    cfg.train = dataclasses.replace(cfg.train, batch_size=4, g_lr=1e-3)
    return cfg


def make_dataset(n=16, size=32, seed=0):
    rng = np.random.default_rng(seed)
    imgs, masks = [], []
    for _ in range(n):
        views, _, mask = synth_polar_scene(rng, size, size)
        y = views[0].mean(axis=-1, keepdims=True)  # luminance-ish channel
        imgs.append(y.astype(np.float32))
        masks.append(mask.astype(np.float32))
    return np.stack(imgs), np.stack(masks)


class TestSpecSegTraining:
    def test_loss_decreases(self):
        cfg = small_config()
        images, masks = make_dataset()
        state = create_specseg_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_specseg_train_step(cfg), donate_argnums=())

        bi = jnp.asarray(images[:4])
        bm = jnp.asarray(masks[:4])
        _, m0 = step(state, bi, bm, jax.random.PRNGKey(1))
        state2 = train_specseg(cfg, images, masks, num_steps=30)
        _, m1 = jax.jit(make_specseg_train_step(cfg), donate_argnums=())(
            state2, bi, bm, jax.random.PRNGKey(1))
        assert float(m1["loss"]) < float(m0["loss"])

    def test_batch_stats_update(self):
        cfg = small_config()
        images, masks = make_dataset(n=4)
        state = create_specseg_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_specseg_train_step(cfg), donate_argnums=())
        new_state, _ = step(state, jnp.asarray(images), jnp.asarray(masks),
                            jax.random.PRNGKey(1))
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.batch_stats, new_state.batch_stats)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
        assert int(new_state.step) == 1

    def test_metrics_finite(self):
        cfg = small_config()
        images, masks = make_dataset(n=4)
        state = create_specseg_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_specseg_train_step(cfg), donate_argnums=())
        _, metrics = step(state, jnp.asarray(images), jnp.asarray(masks),
                          jax.random.PRNGKey(1))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert 0.0 <= float(metrics["iou"]) <= 1.0
