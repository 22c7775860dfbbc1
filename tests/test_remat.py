"""Remat (train.remat="models") must be a pure scheduling change.

jax.checkpoint re-runs the wrapped forwards during the backward pass instead of
storing their activations; the ops and their order are identical, so the updated
parameters must match the store-everything step exactly (up to compiler
reduction-order noise). Covers the default path, live_g1 (G1 becomes a
gradient-carrying pass), and the scan-chained trainer.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.train.state import create_train_state
from shmgan_tpu.train.step import make_scan_train_steps, make_train_step


def small_config(remat: str, **train_overrides) -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4,
                                    compute_dtype="float32")
    train_overrides.setdefault("batch_size", 2)
    cfg.train = dataclasses.replace(cfg.train, remat=remat, **train_overrides)
    return cfg


def _assert_tree_close(a, b, rtol, atol):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   rtol=rtol, atol=atol)


def _run_steps(cfg, n_steps=2):
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=())
    views = jax.random.uniform(jax.random.PRNGKey(1), (5, 2, 32, 32, 3))
    epoch = jnp.zeros((), jnp.int32)
    metrics = None
    for i in range(n_steps):
        state, metrics = step(state, views, jax.random.PRNGKey(100 + i), epoch)
    return state, metrics


@pytest.mark.parametrize("quality", [False, True],
                         ids=["parity", "quality_mode"])
def test_remat_matches_baseline(quality):
    overrides = dict(live_g1=True, g1_recon_weight=1.0,
                     single_input_prob=0.25,
                     consistent_domains=True) if quality else {}
    s_none, m_none = _run_steps(small_config("none", **overrides))
    s_remat, m_remat = _run_steps(small_config("models", **overrides))
    _assert_tree_close(s_none.g_params, s_remat.g_params, rtol=1e-5, atol=1e-7)
    _assert_tree_close(s_none.d_params, s_remat.d_params, rtol=1e-5, atol=1e-7)
    for k in m_none:
        np.testing.assert_allclose(float(m_none[k]), float(m_remat[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_remat_scan_chained():
    k = 2
    results = {}
    for remat in ("none", "models"):
        cfg = small_config(remat)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        scan = jax.jit(make_scan_train_steps(cfg), donate_argnums=())
        batches = jax.random.uniform(jax.random.PRNGKey(1), (k, 5, 2, 32, 32, 3))
        rngs = jax.random.split(jax.random.PRNGKey(2), k)
        results[remat], _ = scan(state, batches, rngs, jnp.zeros((), jnp.int32))
    _assert_tree_close(results["none"].g_params, results["models"].g_params,
                       rtol=1e-5, atol=1e-7)
    _assert_tree_close(results["none"].d_params, results["models"].d_params,
                       rtol=1e-5, atol=1e-7)


def test_remat_rejects_unknown_mode():
    with pytest.raises(ValueError):
        make_train_step(small_config("yolo"))
