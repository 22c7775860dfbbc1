"""Misc integration: SpecSeg trainer -> GAN hand-off, distributed init no-op,
package imports."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from shmgan_tpu.config import Config


def test_specseg_handoff_into_gan():
    from shmgan_tpu.train.specseg_train import (
        create_specseg_state, specseg_vars_from_state,
    )
    from shmgan_tpu.train.state import create_train_state

    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    sstate = create_specseg_state(cfg, jax.random.PRNGKey(0))
    variables = specseg_vars_from_state(sstate)
    gstate = create_train_state(cfg, jax.random.PRNGKey(1), specseg_vars=variables)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(gstate.specseg_vars)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_maybe_initialize_distributed_noop(monkeypatch):
    from shmgan_tpu.parallel.mesh import maybe_initialize_distributed
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize_distributed() is False


def test_package_surface_imports():
    import shmgan_tpu
    from shmgan_tpu import ops, models, parallel  # noqa: F401
    from shmgan_tpu.train import TrainState, create_train_state, train_step  # noqa
    from shmgan_tpu.eval import evaluate_pair, MetricAccumulator  # noqa
    assert shmgan_tpu.__version__
