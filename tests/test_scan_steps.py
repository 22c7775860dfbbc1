"""The scanned multi-step trainer must be step-for-step identical to the host loop."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from shmgan_tpu.config import Config
from shmgan_tpu.train.state import create_train_state
from shmgan_tpu.train.step import make_scan_train_steps, make_train_step


def small_config() -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    cfg.train = dataclasses.replace(cfg.train, batch_size=2)
    return cfg


def test_scan_matches_host_loop():
    cfg = small_config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    k = 3
    batches = jax.random.uniform(jax.random.PRNGKey(1), (k, 5, 2, 32, 32, 3))
    rngs = jax.random.split(jax.random.PRNGKey(2), k)
    epoch = jnp.zeros((), jnp.int32)

    host_step = jax.jit(make_train_step(cfg), donate_argnums=())
    s = state
    host_metrics = []
    for i in range(k):
        s, m = host_step(s, batches[i], rngs[i], epoch)
        host_metrics.append(float(m["total_G"]))

    scan_steps = jax.jit(make_scan_train_steps(cfg), donate_argnums=())
    s2, metrics = scan_steps(state, batches, rngs, epoch)

    np.testing.assert_allclose(np.asarray(metrics["total_G"]),
                               np.asarray(host_metrics), rtol=2e-4)
    assert int(s2.step) == k
    # final params identical within float tolerance
    for a, b in zip(jax.tree_util.tree_leaves(s.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        # scan changes XLA fusion boundaries -> few-ULP drift across 3 chained
        # Adam updates; 1e-4 absolute is far below any training-relevant scale
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)
