"""Multi-device tests on the 8-virtual-CPU-device backend.

Validates the full training step under (a) pure data parallelism over 8 devices and
(b) a 4x2 data x model mesh with output-channel tensor parallelism — the rebuild's
replacement for the reference's absent distribution layer (SURVEY.md §2.2).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.parallel.mesh import (
    make_mesh, param_shardings, shard_batch, shard_train_state,
)
from shmgan_tpu.train.state import create_train_state
from shmgan_tpu.train.step import make_train_step


def small_config(dp=-1, mp=1) -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    cfg.train = dataclasses.replace(cfg.train, batch_size=8)
    cfg.mesh = dataclasses.replace(cfg.mesh, data_parallel=dp, model_parallel=mp)
    return cfg


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _run_one_step(cfg):
    mesh = make_mesh(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh)
    views = jax.random.uniform(jax.random.PRNGKey(1), (5, 8, 32, 32, 3))
    views = shard_batch(views, mesh)
    step = jax.jit(make_train_step(cfg), donate_argnums=())
    new_state, metrics = step(state, views, jax.random.PRNGKey(2),
                              jnp.zeros((), jnp.int32))
    return mesh, state, new_state, metrics


class TestDataParallel:
    def test_dp8_step_runs(self):
        cfg = small_config(dp=8, mp=1)
        _, state, new_state, metrics = _run_one_step(cfg)
        assert np.isfinite(float(metrics["total_G"]))
        assert np.isfinite(float(metrics["total_D"]))
        assert int(new_state.step) == 1

    def test_dp8_matches_single_device(self):
        # The sharded computation must produce the same losses as the unsharded one
        # (same batch, same rng) — SPMD partitioning is a layout, not a semantics.
        cfg = small_config(dp=8, mp=1)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        views = jax.random.uniform(jax.random.PRNGKey(1), (5, 8, 32, 32, 3))
        step = jax.jit(make_train_step(cfg), donate_argnums=())

        _, m_single = step(state, views, jax.random.PRNGKey(2),
                           jnp.zeros((), jnp.int32))

        mesh = make_mesh(cfg)
        state_sh = shard_train_state(state, mesh)
        views_sh = shard_batch(views, mesh)
        _, m_shard = step(state_sh, views_sh, jax.random.PRNGKey(2),
                          jnp.zeros((), jnp.int32))

        np.testing.assert_allclose(float(m_single["total_G"]),
                                   float(m_shard["total_G"]), rtol=2e-4)
        np.testing.assert_allclose(float(m_single["total_D"]),
                                   float(m_shard["total_D"]), rtol=2e-4)


class TestTensorParallel:
    def test_mesh_4x2(self):
        cfg = small_config(dp=4, mp=2)
        mesh = make_mesh(cfg)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_tp_param_shardings_exist(self):
        # With filter_size=64 (real size), the 256+ channel kernels shard over model.
        cfg = Config()
        cfg.mesh = dataclasses.replace(cfg.mesh, data_parallel=4, model_parallel=2)
        mesh = make_mesh(cfg)
        from shmgan_tpu.models import SHMGenerator
        gen = SHMGenerator(filter_size=64)
        params = jax.eval_shape(
            lambda k: gen.init(k, jnp.zeros((1, 32, 32, 10)),
                               jnp.zeros((1, 32, 32, 1)))["params"],
            jax.random.PRNGKey(0))
        shardings = param_shardings(params, mesh)
        specs = [s.spec for s in jax.tree_util.tree_leaves(shardings)]
        assert any(spec != jax.sharding.PartitionSpec() for spec in specs), \
            "expected at least some model-sharded kernels"

    def test_dp4_mp2_step_runs(self):
        cfg = small_config(dp=4, mp=2)
        # raise filter_size so some kernels actually shard (256 channels at lvl 3)
        cfg.model = dataclasses.replace(cfg.model, filter_size=32)
        _, state, new_state, metrics = _run_one_step(cfg)
        assert np.isfinite(float(metrics["total_G"]))
        assert np.isfinite(float(metrics["total_D"]))


class TestSpatialSharding:
    def test_spatial_matches_unsharded(self):
        # H sharded 2-way across the model axis (sequence-parallel analogue);
        # GSPMD inserts the conv halo exchanges — results must match unsharded.
        from shmgan_tpu.parallel.mesh import shard_batch, shard_train_state
        cfg = small_config(dp=4, mp=2)
        cfg.mesh = dataclasses.replace(cfg.mesh, spatial_sharding=True)
        cfg.train = dataclasses.replace(cfg.train, batch_size=4)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        views = jax.random.uniform(jax.random.PRNGKey(1), (5, 4, 32, 32, 3))
        step = jax.jit(make_train_step(cfg), donate_argnums=())
        _, m_ref = step(state, views, jax.random.PRNGKey(2),
                        jnp.zeros((), jnp.int32))
        mesh = make_mesh(cfg)
        state_sh = shard_train_state(state, mesh, spatial=True)
        views_sh = shard_batch(views, mesh, spatial=True)
        _, m_sp = step(state_sh, views_sh, jax.random.PRNGKey(2),
                       jnp.zeros((), jnp.int32))
        np.testing.assert_allclose(float(m_ref["total_G"]), float(m_sp["total_G"]),
                                   rtol=2e-4)
        np.testing.assert_allclose(float(m_ref["total_D"]), float(m_sp["total_D"]),
                                   rtol=2e-4)

    def test_spatial_param_shardings_replicate(self):
        from shmgan_tpu.parallel.mesh import param_shardings
        cfg = small_config(dp=4, mp=2)
        mesh = make_mesh(cfg)
        params = {"k": jnp.zeros((3, 3, 256, 512))}
        sh = param_shardings(params, mesh, spatial=True)
        assert sh["k"].spec == jax.sharding.PartitionSpec()


class TestRematSharding:
    def test_dp8_remat_matches_single_device(self):
        """remat composes with SPMD: jax.checkpoint regions partition like any
        other region, so the sharded rematerialized step must equal the
        unsharded one (same batch, same rng)."""
        cfg = small_config(dp=8, mp=1)
        cfg.train = dataclasses.replace(cfg.train, remat="models")
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        views = jax.random.uniform(jax.random.PRNGKey(1), (5, 8, 32, 32, 3))
        step = jax.jit(make_train_step(cfg), donate_argnums=())

        _, m_single = step(state, views, jax.random.PRNGKey(2),
                           jnp.zeros((), jnp.int32))

        mesh = make_mesh(cfg)
        state_sh = shard_train_state(state, mesh)
        views_sh = shard_batch(views, mesh)
        _, m_shard = step(state_sh, views_sh, jax.random.PRNGKey(2),
                          jnp.zeros((), jnp.int32))

        np.testing.assert_allclose(float(m_single["total_G"]),
                                   float(m_shard["total_G"]), rtol=2e-4)
        np.testing.assert_allclose(float(m_single["total_D"]),
                                   float(m_shard["total_D"]), rtol=2e-4)


class TestTpSpecExtentRule:
    """TP spec excludes kernels whose output feature map is spatially
    degenerate (GSPMD involuntary-full-remat finding, MULTICHIP_r02 /
    parallel/mesh.py::_param_spec)."""

    def _specs(self, image_size, min_channels=64):
        from jax.sharding import PartitionSpec as P
        mesh = make_mesh(small_config(dp=4, mp=2))
        tree = {
            "block3": {"conv": {"kernel": np.zeros((3, 3, 64, 128))}},
            "block4": {"conv": {"kernel": np.zeros((3, 3, 128, 256))}},
            "down1": {"conv0": {"kernel": np.zeros((3, 3, 32, 64))}},
            "head": {"kernel": np.zeros((3, 3, 256, 256))},
        }
        sh = param_shardings(tree, mesh, image_size=image_size,
                             min_channels=min_channels)
        return {k: jax.tree_util.tree_leaves(v)[0].spec
                for k, v in sh.items()}, P

    def test_degenerate_block_replicates(self):
        # 32px: D block4 writes a 1x1 map -> replicated; block3 (2x2) shards
        specs, P = self._specs(32)
        assert specs["block4"] == P()
        assert specs["block3"] == P(None, None, None, "model")
        # non-depth-indexed paths (head) are not extent-gated
        assert specs["head"] == P(None, None, None, "model")

    def test_large_image_shards_everything(self):
        specs, P = self._specs(128)
        assert specs["block4"] == P(None, None, None, "model")
        assert specs["block3"] == P(None, None, None, "model")

    def test_unknown_image_size_keeps_old_behavior(self):
        specs, P = self._specs(0)
        assert specs["block4"] == P(None, None, None, "model")
