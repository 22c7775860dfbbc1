"""Generator-EMA tests (config.train.g_ema — a documented divergence option;
the reference has no EMA. TrainState grows an ema_g_params slot only when
enabled, so parity runs keep the reference-shaped checkpoint layout)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.train.state import create_train_state
from shmgan_tpu.train.step import make_train_step


def small_config(**train_overrides) -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    train_overrides.setdefault("batch_size", 2)
    cfg.train = dataclasses.replace(cfg.train, **train_overrides)
    return cfg


def _step_once(cfg, state):
    step = jax.jit(make_train_step(cfg), donate_argnums=())
    views = jax.random.uniform(jax.random.PRNGKey(1), (5, 2, 32, 32, 3))
    rng = jax.random.PRNGKey(2)
    epoch = jnp.ones((), jnp.int32)
    new_state, _ = step(state, views, rng, epoch)
    return new_state


class TestEmaState:
    def test_default_off_keeps_layout(self):
        cfg = small_config()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        assert state.ema_g_params is None
        new_state = _step_once(cfg, state)
        assert new_state.ema_g_params is None

    def test_enabled_initializes_to_params(self):
        cfg = small_config(g_ema=0.9)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        assert state.ema_g_params is not None
        for e, p in zip(jax.tree_util.tree_leaves(state.ema_g_params),
                        jax.tree_util.tree_leaves(state.g_params)):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    def test_update_math_one_step(self):
        decay = 0.5
        cfg = small_config(g_ema=decay)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        init_g = state.g_params
        new_state = _step_once(cfg, state)
        expect = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * p, init_g,
            new_state.g_params)
        for e, x in zip(jax.tree_util.tree_leaves(new_state.ema_g_params),
                        jax.tree_util.tree_leaves(expect)):
            np.testing.assert_allclose(np.asarray(e), np.asarray(x),
                                       rtol=1e-6, atol=1e-7)

    def test_ema_does_not_change_training(self):
        # the EMA tree is write-only w.r.t. the update: g/d params after one
        # step are bit-identical with and without EMA
        base = _step_once(small_config(), create_train_state(
            small_config(), jax.random.PRNGKey(0)))
        ema = _step_once(small_config(g_ema=0.99), create_train_state(
            small_config(g_ema=0.99), jax.random.PRNGKey(0)))
        for a, b in zip(jax.tree_util.tree_leaves(base.g_params),
                        jax.tree_util.tree_leaves(ema.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEmaDonation:
    def test_state_donation_safe(self):
        # the EMA tree must not alias g_params buffers — a donated state would
        # otherwise donate the same buffer twice (caught by the CPU smoke)
        cfg = small_config(g_ema=0.9)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        views = jax.random.uniform(jax.random.PRNGKey(1), (5, 2, 32, 32, 3))
        new_state, _ = step(state, views, jax.random.PRNGKey(2),
                            jnp.ones((), jnp.int32))
        assert new_state.ema_g_params is not None


class TestEmaCheckpoint:
    def test_roundtrip_with_ema(self, tmp_path):
        from shmgan_tpu.checkpoint import CheckpointManager

        cfg = small_config(g_ema=0.9)
        state = _step_once(cfg, create_train_state(cfg, jax.random.PRNGKey(0)))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(state, step=1)
        template = create_train_state(cfg, jax.random.PRNGKey(7))
        restored = mgr.restore(template)
        assert restored is not None and restored.ema_g_params is not None
        for a, b in zip(jax.tree_util.tree_leaves(state.ema_g_params),
                        jax.tree_util.tree_leaves(restored.ema_g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pre_ema_checkpoint_seeds_ema_from_params(self, tmp_path):
        from shmgan_tpu.checkpoint import CheckpointManager

        plain_cfg = small_config()
        plain = create_train_state(plain_cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(plain, step=1)

        ema_cfg = small_config(g_ema=0.9)
        template = create_train_state(ema_cfg, jax.random.PRNGKey(7))
        restored = mgr.restore(template)
        assert restored is not None and restored.ema_g_params is not None
        for e, p in zip(jax.tree_util.tree_leaves(restored.ema_g_params),
                        jax.tree_util.tree_leaves(restored.g_params)):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    def test_plain_restore_of_plain_checkpoint_unchanged(self, tmp_path):
        from shmgan_tpu.checkpoint import CheckpointManager

        cfg = small_config()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(state, step=1)
        restored = mgr.restore(create_train_state(cfg, jax.random.PRNGKey(7)))
        assert restored is not None and restored.ema_g_params is None

    def test_has_key_reads_checkpoint_metadata(self, tmp_path):
        from shmgan_tpu.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "ck"))
        ema_state = create_train_state(small_config(g_ema=0.9),
                                       jax.random.PRNGKey(0))
        mgr.save(ema_state, step=1)
        plain = create_train_state(small_config(), jax.random.PRNGKey(0))
        mgr.save(plain, step=2)
        assert mgr.has_key(1, "ema_g_params")
        assert not mgr.has_key(2, "ema_g_params")
        assert mgr.has_key(2, "g_params")
        assert not mgr.has_key(99, "g_params")  # missing step -> False

    def test_include_ema_restores_into_plain_template(self, tmp_path):
        # inference surfaces (cli test/serve/export) deploy the EMA tree an
        # EMA run was evaluated with, without arming EMA maintenance
        from shmgan_tpu.checkpoint import CheckpointManager

        cfg = small_config(g_ema=0.9)
        state = _step_once(cfg, create_train_state(cfg, jax.random.PRNGKey(0)))
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(state, step=1)

        plain_template = create_train_state(small_config(),
                                            jax.random.PRNGKey(7))
        restored = mgr.restore(plain_template, include_ema=True)
        assert restored is not None and restored.ema_g_params is not None
        for a, b in zip(jax.tree_util.tree_leaves(state.ema_g_params),
                        jax.tree_util.tree_leaves(restored.ema_g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # without include_ema the plain template stays EMA-free even though
        # the checkpoint carries the tree
        restored2 = mgr.restore(create_train_state(small_config(),
                                                   jax.random.PRNGKey(7)))
        assert restored2 is not None and restored2.ema_g_params is None


class TestEmaSharding:
    def test_ema_follows_dp_mesh(self):
        from shmgan_tpu.parallel.mesh import make_mesh, shard_train_state

        cfg = small_config(g_ema=0.9)
        cfg.mesh = dataclasses.replace(cfg.mesh, data_parallel=8,
                                       model_parallel=1)
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        sharded = shard_train_state(state, mesh)
        assert sharded.ema_g_params is not None
        # replicated under pure DP, like g_params
        leaves_e = jax.tree_util.tree_leaves(sharded.ema_g_params)
        leaves_g = jax.tree_util.tree_leaves(sharded.g_params)
        assert leaves_e[0].sharding == leaves_g[0].sharding
