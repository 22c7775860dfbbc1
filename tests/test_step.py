"""Tests for the fused train step (shmgan_tpu/train/step.py).

Uses a small image size (32) and filter size (8) so the 8-virtual-CPU-device test
backend compiles quickly; the step logic is size-agnostic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.train.state import create_train_state, param_count
from shmgan_tpu.train.step import make_train_step, preprocess_views


def small_config(**train_overrides) -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    train_overrides.setdefault("batch_size", 2)
    cfg.train = dataclasses.replace(cfg.train, **train_overrides)
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=())
    views = jax.random.uniform(jax.random.PRNGKey(1), (5, 2, 32, 32, 3))
    return cfg, state, step, views


class TestPreprocess:
    def test_shapes(self):
        views = jax.random.uniform(jax.random.PRNGKey(0), (5, 2, 16, 16, 3))
        ds_yuv, y, cbcr = preprocess_views(views)
        assert ds_yuv.shape == (5, 2, 16, 16, 3)
        assert y.shape == (2, 16, 16, 5)
        assert cbcr.shape == (2, 16, 16, 2)

    def test_matches_sequential(self):
        from shmgan_tpu.ops.color import rgb_to_yuv
        from shmgan_tpu.ops.standardize import per_image_standardization
        views = jax.random.uniform(jax.random.PRNGKey(0), (5, 1, 16, 16, 3))
        ds_yuv, y, cbcr = preprocess_views(views)
        for i in range(5):
            ref, _ = per_image_standardization(rgb_to_yuv(views[i]))
            np.testing.assert_allclose(np.asarray(ds_yuv[i]), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6)
        ref_cbcr = np.mean([np.asarray(per_image_standardization(
            rgb_to_yuv(views[i]))[0])[..., 1:] for i in range(5)], axis=0)
        np.testing.assert_allclose(np.asarray(cbcr), ref_cbcr, rtol=1e-5, atol=1e-6)


class TestTrainStep:
    def test_smoke_and_finite(self, setup):
        cfg, state, step, views = setup
        new_state, metrics = step(state, views, jax.random.PRNGKey(2),
                                  jnp.zeros((), jnp.int32))
        for k, v in metrics.items():
            assert np.all(np.isfinite(np.asarray(v))), f"non-finite metric {k}"
        assert int(new_state.step) == 1

    def test_params_change(self, setup):
        cfg, state, step, views = setup
        new_state, _ = step(state, views, jax.random.PRNGKey(2),
                            jnp.zeros((), jnp.int32))
        g_delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.g_params,
            new_state.g_params)
        d_delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.d_params,
            new_state.d_params)
        assert max(jax.tree_util.tree_leaves(g_delta)) > 0
        assert max(jax.tree_util.tree_leaves(d_delta)) > 0
        # SpecSeg stays frozen (reference: optimizer_SpecSeg never applied)
        s_delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.specseg_vars,
            new_state.specseg_vars)
        assert max(jax.tree_util.tree_leaves(s_delta)) == 0

    def test_generator_gating(self):
        # train_G_after=5: at epoch 0 only D updates (reference :865-872)
        cfg = small_config(train_G_after=5)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg), donate_argnums=())
        views = jax.random.uniform(jax.random.PRNGKey(1), (5, 2, 32, 32, 3))
        new_state, _ = step(state, views, jax.random.PRNGKey(2),
                            jnp.zeros((), jnp.int32))
        g_delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.g_params,
            new_state.g_params)
        assert max(jax.tree_util.tree_leaves(g_delta)) == 0
        # at epoch 5, G updates
        new_state2, _ = step(state, views, jax.random.PRNGKey(2),
                             jnp.full((), 5, jnp.int32))
        g_delta2 = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.g_params,
            new_state2.g_params)
        assert max(jax.tree_util.tree_leaves(g_delta2)) > 0

    def test_deterministic_given_rng(self, setup):
        cfg, state, step, views = setup
        s1, m1 = step(state, views, jax.random.PRNGKey(7), jnp.zeros((), jnp.int32))
        s2, m2 = step(state, views, jax.random.PRNGKey(7), jnp.zeros((), jnp.int32))
        np.testing.assert_allclose(float(m1["total_G"]), float(m2["total_G"]))
        np.testing.assert_allclose(float(m1["total_D"]), float(m2["total_D"]))

    def test_rng_changes_draws(self, setup):
        cfg, state, step, views = setup
        _, m1 = step(state, views, jax.random.PRNGKey(7), jnp.zeros((), jnp.int32))
        _, m2 = step(state, views, jax.random.PRNGKey(8), jnp.zeros((), jnp.int32))
        assert float(m1["target_label"]) != float(m2["target_label"])

    def test_loss_totals_consistent(self, setup):
        # total_G = (D1_rf + D3_rf_cyc)/6 + 10*(L1 + SSIM + NST)  (:829-832)
        cfg, state, step, views = setup
        _, m = step(state, views, jax.random.PRNGKey(3), jnp.zeros((), jnp.int32))
        expect_g = (float(m["D1_rf"]) + float(m["D3_rf_cyc"])) / 6.0 \
            + 10.0 * float(m["L1"]) + 10.0 * float(m["SSIM_loss"]) \
            + 10.0 * float(m["NST"])
        np.testing.assert_allclose(float(m["total_G"]), expect_g, rtol=1e-5)
        expect_d = (float(m["D1_cls"]) + float(m["D3_cls"])) / 6.0 \
            + (float(m["D2_rf_target"]) + float(m["D4_rf_cyc"])) / 6.0 \
            + 0.5 * float(m["D4_cls"]) + 10.0 * float(m["NST"])
        np.testing.assert_allclose(float(m["total_D"]), expect_d, rtol=1e-5)
        expect_c = 10.0 * (float(m["D4_cls"]) + float(m["NST"]))
        np.testing.assert_allclose(float(m["total_C"]), expect_c, rtol=1e-5)

    def test_batch_one_parity_shape(self):
        # The reference's native regime: batch 1 (main.py:43)
        cfg = small_config(batch_size=1)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg), donate_argnums=())
        views = jax.random.uniform(jax.random.PRNGKey(1), (5, 1, 32, 32, 3))
        _, m = step(state, views, jax.random.PRNGKey(2), jnp.zeros((), jnp.int32))
        assert np.isfinite(float(m["total_G"]))


class TestPerSampleDropout:
    def test_per_sample_mode_runs_and_differs(self):
        # scalar_channel_dropout=False: Bernoulli drops drawn per batch element
        # (the batch>1 generalization; True is the reference's batch-1 semantics)
        cfg = small_config(scalar_channel_dropout=False, batch_size=4)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg), donate_argnums=())
        views = jax.random.uniform(jax.random.PRNGKey(1), (5, 4, 32, 32, 3))
        _, m = step(state, views, jax.random.PRNGKey(2), jnp.zeros((), jnp.int32))
        assert np.isfinite(float(m["total_G"]))
        assert np.isfinite(float(m["total_D"]))

        # same rng, scalar mode: different gating -> different SSIM loss
        cfg2 = small_config(scalar_channel_dropout=True, batch_size=4)
        step2 = jax.jit(make_train_step(cfg2), donate_argnums=())
        state2 = create_train_state(cfg2, jax.random.PRNGKey(0))
        _, m2 = step2(state2, views, jax.random.PRNGKey(2), jnp.zeros((), jnp.int32))
        assert float(m["SSIM_loss"]) != float(m2["SSIM_loss"])


class TestQualityModes:
    """Config-gated quality-training divergences (config.py TrainConfig docs):
    all default OFF, preserving reference parity (the grad-equivalence suite runs
    on the defaults); each mode must change exactly what it claims to change."""

    def _run(self, views, rng, **overrides):
        cfg = small_config(batch_size=2, **overrides)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, debug_grads=True), donate_argnums=())
        new_state, m = step(state, views, rng, jnp.zeros((), jnp.int32))
        return new_state, m

    @pytest.fixture(scope="class")
    def views(self):
        from shmgan_tpu.data.synthetic import synth_polar_batch
        return jnp.asarray(synth_polar_batch(2, 32, seed=5))

    def test_live_g1_value_neutral_but_trains_g(self, views):
        rng = jax.random.PRNGKey(11)
        s_off, m_off = self._run(views, rng)
        s_on, m_on = self._run(views, rng, live_g1=True)
        # reported reference-loss values identical (the extra adversarial term is
        # gradient-only), but the G update differs because G1 now carries grads
        np.testing.assert_allclose(float(m_on["total_G"]), float(m_off["total_G"]),
                                   rtol=1e-6)
        diffs = [float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree_util.tree_leaves(s_on.g_params),
            jax.tree_util.tree_leaves(s_off.g_params))]
        assert max(diffs) > 0.0
        # and the D gradients are untouched (no D leak through the frozen pass)
        for a, b in zip(jax.tree_util.tree_leaves(m_on["_grads"]["D"]),
                        jax.tree_util.tree_leaves(m_off["_grads"]["D"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_g1_recon_weight_adds_terms(self, views):
        rng = jax.random.PRNGKey(12)
        _, m = self._run(views, rng, live_g1=True, g1_recon_weight=10.0)
        assert np.isfinite(float(m["G1_L1"]))
        assert np.isfinite(float(m["G1_SSIM_loss"]))
        # recon weight requires live_g1 (documented: "only active with live_g1")
        _, m_off = self._run(views, rng, g1_recon_weight=10.0)
        assert "G1_L1" not in m_off

    def test_single_input_prob_one_forces_pattern(self, views):
        rng = jax.random.PRNGKey(13)
        _, m = self._run(views, rng, single_input_prob=1.0,
                         scalar_channel_dropout=False)
        drop = np.asarray(m["_drop"])  # (B, V)
        # exactly one channel kept per sample, and it is a polarized view (not ED)
        assert drop.shape == (2, 5)
        np.testing.assert_array_equal(drop.sum(axis=1), 4.0)
        kept = np.argmin(drop, axis=1)
        assert (kept < 4).all()

    def test_single_input_prob_zero_leaves_stream(self, views):
        rng = jax.random.PRNGKey(14)
        _, m0 = self._run(views, rng)
        _, m1 = self._run(views, rng, single_input_prob=0.0)
        np.testing.assert_array_equal(np.asarray(m0["_drop"]),
                                      np.asarray(m1["_drop"]))

    def test_consistent_domains_runs_and_changes_l1(self, views):
        rng = jax.random.PRNGKey(15)
        _, m_ref = self._run(views, rng)
        _, m_cd = self._run(views, rng, consistent_domains=True)
        assert np.isfinite(float(m_cd["total_G"]))
        assert np.isfinite(float(m_cd["total_D"]))
        # L1 now compares standardized-vs-standardized instead of the reference's
        # standardized-vs-raw domain mix — a different (finite) value
        assert float(m_cd["L1"]) != float(m_ref["L1"])
