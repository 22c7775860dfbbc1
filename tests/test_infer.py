"""Tests for the fused single-RGB inference graph and the eval harness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.eval.metrics import MetricAccumulator, evaluate_pair
from shmgan_tpu.infer import make_infer_fn, make_mask_fn
from shmgan_tpu.train.state import create_train_state


def small_config() -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = small_config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    return cfg, state, rgb


class TestInfer:
    def test_output_shapes(self, setup):
        cfg, state, rgb = setup
        infer = make_infer_fn(cfg)
        out = infer(state.g_params, state.specseg_vars, rgb)
        assert out["gen_rgb"].shape == (2, 32, 32, 3)
        assert out["gen_rgb_denorm"].shape == (2, 32, 32, 3)
        assert out["mask"].shape == (2, 32, 32, 1)
        assert out["gen_y"].shape == (2, 32, 32, 1)
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))

    def test_mask_is_probability(self, setup):
        cfg, state, rgb = setup
        out = make_infer_fn(cfg)(state.g_params, state.specseg_vars, rgb)
        m = np.asarray(out["mask"])
        assert m.min() >= 0.0 and m.max() <= 1.0

    def test_cyclic_outputs(self, setup):
        cfg, state, rgb = setup
        infer = make_infer_fn(cfg, with_cyclic=True)
        out = infer(state.g_params, state.specseg_vars, rgb)
        assert out["cyc_rgb"].shape == (5, 2, 32, 32, 3)

    def test_mask_fn(self, setup):
        cfg, state, rgb = setup
        mask = make_mask_fn(cfg)(state.specseg_vars, rgb)
        assert mask.shape == (2, 32, 32, 1)

    def test_cbcr_preserved(self, setup):
        # The output YUV reuses the input's own CbCr (test.py:224): verify the
        # chroma of gen_rgb equals the standardized input chroma.
        from shmgan_tpu.ops.color import rgb_to_yuv
        from shmgan_tpu.ops.standardize import per_image_standardization
        cfg, state, rgb = setup
        out = make_infer_fn(cfg)(state.g_params, state.specseg_vars, rgb)
        yuv_in, _ = per_image_standardization(rgb_to_yuv(rgb))
        yuv_out = rgb_to_yuv(out["gen_rgb"])
        np.testing.assert_allclose(np.asarray(yuv_out[..., 1:]),
                                   np.asarray(yuv_in[..., 1:]), atol=2e-5)


class TestNativeResolution:
    """Arbitrary-resolution inference (infer.make_native_infer_fn): reflect-pad
    to a bucketed shape, run the fused graph, crop every output back. The
    reference force-resizes all photos to a square (test.py:81-94)."""

    def test_bucket_shape(self):
        from shmgan_tpu.infer import bucket_shape
        assert bucket_shape(1013, 757, 16, 64) == (1024, 768)
        assert bucket_shape(64, 64, 16, 64) == (64, 64)
        assert bucket_shape(5, 9, 16, 64) == (64, 64)
        assert bucket_shape(24, 40, 16, 16) == (32, 48)
        with pytest.raises(ValueError):
            bucket_shape(10, 10, 16, 60)  # bucket not a multiple of 16

    def test_outputs_cropped_to_input(self, setup):
        from shmgan_tpu.infer import make_native_infer_fn
        cfg, state, _ = setup
        run = make_native_infer_fn(cfg, bucket=16)
        rgb = np.asarray(jax.random.uniform(jax.random.PRNGKey(3),
                                            (1, 24, 40, 3)))
        out = run(state.g_params, state.specseg_vars, rgb)
        assert out["gen_rgb_calibrated"].shape == (1, 24, 40, 3)
        assert out["gen_rgb_composited"].shape == (1, 24, 40, 3)
        assert out["mask"].shape == (1, 24, 40, 1)
        for v in out.values():
            assert np.all(np.isfinite(v))

    def test_aligned_input_matches_direct_infer(self, setup):
        # an input already on the bucket grid takes the zero-pad path and must
        # equal the plain jitted graph bit-for-bit
        from shmgan_tpu.infer import make_native_infer_fn
        cfg, state, _ = setup
        rgb = np.asarray(jax.random.uniform(jax.random.PRNGKey(4),
                                            (2, 32, 48, 3)))
        direct = make_infer_fn(cfg)(state.g_params, state.specseg_vars,
                                    jnp.asarray(rgb))
        native = make_native_infer_fn(cfg, bucket=16)(
            state.g_params, state.specseg_vars, rgb)
        for k in native:
            np.testing.assert_array_equal(native[k], np.asarray(direct[k]))

    def test_cyclic_cropped(self, setup):
        from shmgan_tpu.infer import make_native_infer_fn
        cfg, state, _ = setup
        run = make_native_infer_fn(cfg, with_cyclic=True, bucket=16)
        rgb = np.asarray(jax.random.uniform(jax.random.PRNGKey(5),
                                            (1, 24, 24, 3)))
        out = run(state.g_params, state.specseg_vars, rgb)
        assert out["cyc_rgb"].shape == (5, 1, 24, 24, 3)

    def test_tiny_image_edge_fallback(self, setup):
        # pad >= dim forces the edge-replication fallback (reflect would throw)
        from shmgan_tpu.infer import make_native_infer_fn
        cfg, state, _ = setup
        run = make_native_infer_fn(cfg, bucket=64)
        rgb = np.asarray(jax.random.uniform(jax.random.PRNGKey(6),
                                            (1, 20, 20, 3)))
        out = run(state.g_params, state.specseg_vars, rgb)
        assert out["gen_rgb_calibrated"].shape == (1, 20, 20, 3)


class TestEvalHarness:
    def test_identical_pair(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        m = evaluate_pair(x, x)
        np.testing.assert_allclose(np.asarray(m["ssim"]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m["mse"]), 0.0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(m["deltaE76"]), 0.0, atol=1e-3)
        assert np.all(np.asarray(m["psnr"]) > 60)

    def test_accumulator_report(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
        y = jnp.clip(x + 0.05, 0, 1)
        acc = MetricAccumulator()
        acc.add(evaluate_pair(x, y), wall_time=0.01)
        means = acc.means()
        assert set(means) == set(MetricAccumulator.COLUMNS)
        rep = acc.report()
        assert "MEAN" in rep

    def test_jsonl_dump(self, tmp_path):
        import json
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
        acc = MetricAccumulator()
        acc.add(evaluate_pair(x, x), wall_time=0.0)
        p = str(tmp_path / "m.jsonl")
        acc.dump_jsonl(p)
        lines = [json.loads(l) for l in open(p)]
        assert len(lines) == 2 and "mean" in lines[-1]


class TestCalibratedOutput:
    def test_calibration_is_luma_refit_plus_inverse_standardization(self, setup):
        # contract (round 3): calibrated = clip(yuv_to_rgb([a*gen_y+b, cbcr] *
        # stddev)) where (a, b) is the per-image affine luma fit of gen_y to
        # the input's standardized Y over non-specular pixels. Reconstruct the
        # fit on the host from the returned mask/gen_y and compare.
        from scipy import ndimage

        from shmgan_tpu.infer import fit_affine_luma, make_infer_fn
        from shmgan_tpu.ops.color import rgb_to_yuv, yuv_to_rgb
        from shmgan_tpu.ops.standardize import per_image_standardization
        cfg, state, rgb = setup
        out = make_infer_fn(cfg)(state.g_params, state.specseg_vars, rgb)
        cal = np.asarray(out["gen_rgb_calibrated"])
        assert cal.min() >= 0.0 and cal.max() <= 1.0

        yuv, stats = per_image_standardization(rgb_to_yuv(rgb))
        mask = np.asarray(out["mask"])
        m = np.zeros_like(mask)
        for b in range(mask.shape[0]):
            dil = ndimage.maximum_filter(mask[b, ..., 0], size=5,
                                         mode="constant", cval=-np.inf)
            m[b, ..., 0] = ndimage.uniform_filter(dil, size=5, mode="constant",
                                                  cval=0.0)
        a_fit, b_fit = fit_affine_luma(out["gen_y"], yuv[..., 0:1],
                                       jnp.clip(1.0 - jnp.asarray(m), 0, 1))
        cal_yuv = jnp.concatenate([a_fit * out["gen_y"] + b_fit, yuv[..., 1:]],
                                  axis=-1)
        expect = np.clip(np.asarray(yuv_to_rgb(
            cal_yuv * stats.stddev.reshape(-1, 1, 1, 1))), 0, 1)
        np.testing.assert_allclose(cal, expect, rtol=1e-4, atol=1e-5)

    def test_affine_luma_fit_recovers_drift(self):
        from shmgan_tpu.infer import fit_affine_luma
        rng = np.random.default_rng(0)
        y = rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32)
        # gen = (y - b_true) / a_true  =>  fit should return (a_true, b_true)
        a_true, b_true = 1.3, -0.2
        gen = (y - b_true) / a_true
        w = np.ones_like(y)
        a, b = fit_affine_luma(jnp.asarray(gen), jnp.asarray(y), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(a).ravel(), a_true, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(b).ravel(), b_true, atol=1e-4)

    def test_affine_luma_fit_identity_on_perfect(self):
        from shmgan_tpu.infer import fit_affine_luma
        rng = np.random.default_rng(1)
        y = rng.uniform(0, 1, (1, 8, 8, 1)).astype(np.float32)
        a, b = fit_affine_luma(jnp.asarray(y), jnp.asarray(y),
                               jnp.ones_like(jnp.asarray(y)))
        np.testing.assert_allclose(np.asarray(a).ravel(), 1.0, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(b).ravel(), 0.0, atol=1e-5)

    def test_affine_luma_fit_degenerate_weight_is_noop(self):
        from shmgan_tpu.infer import fit_affine_luma
        rng = np.random.default_rng(2)
        y = rng.uniform(0, 1, (1, 8, 8, 1)).astype(np.float32)
        gen = rng.uniform(0, 1, (1, 8, 8, 1)).astype(np.float32)
        # all-specular image: zero weight everywhere -> identity fit
        a, b = fit_affine_luma(jnp.asarray(gen), jnp.asarray(y),
                               jnp.zeros_like(jnp.asarray(y)))
        assert float(a.ravel()[0]) == 1.0 and float(b.ravel()[0]) == 0.0
        # constant gen_y (det == 0) -> identity fit, no NaN
        a, b = fit_affine_luma(jnp.full_like(jnp.asarray(y), 0.5),
                               jnp.asarray(y), jnp.ones_like(jnp.asarray(y)))
        assert float(a.ravel()[0]) == 1.0 and np.isfinite(float(b.ravel()[0]))


class TestCompositedOutput:
    """gen_rgb_composited (infer.py): input verbatim outside the dilated+softened
    specular mask, calibrated reconstruction inside."""

    def test_composite_contract(self):
        import dataclasses as dc
        cfg = Config()
        cfg.model = dc.replace(cfg.model, image_size=32, filter_size=8,
                               specseg_base_filters=4, compute_dtype="float32")
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        infer = make_infer_fn(cfg)
        rgb = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        out = infer(state.g_params, state.specseg_vars, rgb)
        assert out["gen_rgb_composited"].shape == (2, 32, 32, 3)

        # reconstruct the compositing weight on the host and pin the contract
        mask = np.asarray(out["mask"])
        from scipy import ndimage  # if unavailable, do it with numpy below
        m = np.zeros_like(mask)
        for b in range(mask.shape[0]):
            dil = ndimage.maximum_filter(mask[b, ..., 0], size=5, mode="constant",
                                         cval=-np.inf)
            soft = ndimage.uniform_filter(dil, size=5, mode="constant", cval=0.0)
            m[b, ..., 0] = soft
        expected = m * np.asarray(out["gen_rgb_calibrated"]) \
            + (1 - m) * np.asarray(rgb)
        np.testing.assert_allclose(np.asarray(out["gen_rgb_composited"]),
                                   expected, rtol=1e-4, atol=1e-5)

    def test_input_preserved_where_mask_zero(self):
        import dataclasses as dc
        cfg = Config()
        cfg.model = dc.replace(cfg.model, image_size=32, filter_size=8,
                               specseg_base_filters=4, compute_dtype="float32")
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        infer = make_infer_fn(cfg)
        rgb = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
        out = infer(state.g_params, state.specseg_vars, rgb)
        mask = np.asarray(out["mask"][0, ..., 0])
        comp = np.asarray(out["gen_rgb_composited"][0])
        inp = np.asarray(rgb[0])
        # pixels whose full 9x9 neighborhood has (near-)zero mask keep the input
        from scipy import ndimage
        neigh_max = ndimage.maximum_filter(mask, size=9, mode="constant")
        quiet = neigh_max < 1e-4
        if quiet.any():
            np.testing.assert_allclose(comp[quiet], inp[quiet], atol=1e-3)


class TestMaskTTA:
    """Dihedral mask TTA (infer._specseg_mask): probabilities averaged over
    flip/transpose views in ONE batched forward."""

    def test_tta_equals_manual_view_average(self, setup):
        """The in-graph TTA must equal averaging the plain mask over
        explicitly transformed inputs (proves every inverse mapping)."""
        cfg, state, rgb = setup
        plain = make_mask_fn(cfg)
        tta = make_mask_fn(cfg, tta=True)
        x = np.asarray(rgb)
        views = [x, x[:, :, ::-1], x[:, ::-1], x[:, ::-1, ::-1],
                 np.swapaxes(x, 1, 2),
                 np.swapaxes(x, 1, 2)[:, :, ::-1],
                 np.swapaxes(x, 1, 2)[:, ::-1],
                 np.swapaxes(x, 1, 2)[:, ::-1, ::-1]]
        invs = [lambda v: v, lambda v: v[:, :, ::-1], lambda v: v[:, ::-1],
                lambda v: v[:, ::-1, ::-1],
                lambda v: np.swapaxes(v, 1, 2),
                lambda v: np.swapaxes(v[:, :, ::-1], 1, 2),
                lambda v: np.swapaxes(v[:, ::-1], 1, 2),
                lambda v: np.swapaxes(v[:, ::-1, ::-1], 1, 2)]
        manual = np.mean([inv(np.asarray(plain(state.specseg_vars,
                                               jnp.asarray(view))))
                          for view, inv in zip(views, invs)], axis=0)
        got = np.asarray(tta(state.specseg_vars, rgb))
        np.testing.assert_allclose(got, manual, rtol=2e-4, atol=2e-5)

    def test_tta_output_is_flip_equivariant(self, setup):
        """The symmetrized predictor is exactly equivariant: mask(flip(x)) ==
        flip(mask(x)) — the property plain SpecSeg lacks."""
        cfg, state, rgb = setup
        tta = make_mask_fn(cfg, tta=True)
        m = np.asarray(tta(state.specseg_vars, rgb))
        m_flipped = np.asarray(tta(state.specseg_vars, rgb[:, :, ::-1]))
        np.testing.assert_allclose(m_flipped, m[:, :, ::-1],
                                   rtol=2e-4, atol=2e-5)

    def test_tta_non_square_uses_flips_only(self, setup):
        cfg, state, _ = setup
        tta = make_mask_fn(cfg, tta=True)
        rect = jax.random.uniform(jax.random.PRNGKey(7), (2, 32, 48, 3))
        m = np.asarray(tta(state.specseg_vars, rect))
        assert m.shape == (2, 32, 48, 1)
        assert np.all(np.isfinite(m)) and m.min() >= 0.0 and m.max() <= 1.0

    def test_infer_fn_honors_mask_tta_config(self, setup):
        cfg, state, rgb = setup
        import dataclasses as dc
        cfg_tta = Config()
        cfg_tta.model = cfg.model
        cfg_tta.eval = dc.replace(cfg_tta.eval, mask_tta=True)
        out = make_infer_fn(cfg_tta)(state.g_params, state.specseg_vars, rgb)
        want = np.asarray(make_mask_fn(cfg, tta=True)(state.specseg_vars, rgb))
        np.testing.assert_allclose(np.asarray(out["mask"]), want,
                                   rtol=2e-4, atol=2e-5)

    def test_mask_tta_cli_flag(self):
        cfg = Config.from_args(["--mode", "test", "--mask_tta", "true"])
        assert cfg.eval.mask_tta is True
        cfg = Config.from_args(["--mode", "test"])
        assert cfg.eval.mask_tta is False


class TestOutputSelection:
    """make_infer_fn(outputs=...) returns exactly the requested keys with
    values identical to the full graph (XLA prunes the rest — the serving
    paths use this to skip denorm/composited HBM writes)."""

    def test_subset_matches_full(self, setup):
        cfg, state, rgb = setup
        full = make_infer_fn(cfg)(state.g_params, state.specseg_vars, rgb)
        sub = make_infer_fn(cfg, outputs=("gen_rgb_calibrated", "mask"))(
            state.g_params, state.specseg_vars, rgb)
        assert set(sub) == {"gen_rgb_calibrated", "mask"}
        np.testing.assert_allclose(np.asarray(sub["mask"]),
                                   np.asarray(full["mask"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sub["gen_rgb_calibrated"]),
                                   np.asarray(full["gen_rgb_calibrated"]),
                                   rtol=1e-5, atol=1e-6)

    def test_unknown_key_raises(self, setup):
        cfg, _, _ = setup
        with pytest.raises(ValueError, match="unknown infer outputs"):
            make_infer_fn(cfg, outputs=("gen_rgb", "nope"))
        # cyc_rgb is only a valid key when with_cyclic is on
        with pytest.raises(ValueError, match="unknown infer outputs"):
            make_infer_fn(cfg, outputs=("cyc_rgb",))
        make_infer_fn(cfg, with_cyclic=True, outputs=("cyc_rgb",))

    def test_native_passthrough(self, setup):
        from shmgan_tpu.infer import make_native_infer_fn
        cfg, state, _ = setup
        run = make_native_infer_fn(cfg, outputs=("gen_rgb_calibrated", "mask"))
        rect = np.random.default_rng(0).uniform(
            0, 1, (1, 40, 56, 3)).astype(np.float32)
        out = run(state.g_params, state.specseg_vars, rect)
        assert set(out) == {"gen_rgb_calibrated", "mask"}
        assert out["gen_rgb_calibrated"].shape == (1, 40, 56, 3)
