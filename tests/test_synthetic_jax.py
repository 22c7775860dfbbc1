"""Tests for the on-device (jittable) synthetic scene generator.

data/synthetic_jax.py is the device twin of data/synthetic.py: same curriculum
constants, shape-static realization. These tests pin shapes/ranges, determinism,
ED-mode semantics, the camera-swap augmentation, and that the jax curriculum's
difficulty (identity-baseline PSNR, mask coverage) matches the host numpy
curriculum that generates the held-out eval sets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.data.synthetic import synth_eval_set
from shmgan_tpu.data.synthetic_jax import (synth_eval_batch,
                                           synth_specseg_batch, synth_scene,
                                           synth_views_batch)


class TestScene:
    def test_shapes_and_ranges(self):
        views, diffuse, mask, camera = synth_scene(jax.random.PRNGKey(0), 64, 64)
        assert views.shape == (4, 64, 64, 3)
        assert diffuse.shape == (64, 64, 3)
        assert mask.shape == (64, 64, 1)
        assert camera.shape == (64, 64, 3)
        for t in (views, diffuse, camera):
            assert float(t.min()) >= 0.0 and float(t.max()) <= 1.0
        assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}

    def test_deterministic_given_key(self):
        a = synth_scene(jax.random.PRNGKey(7), 32, 32)
        b = synth_scene(jax.random.PRNGKey(7), 32, 32)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_views_share_diffuse_base(self):
        # every view >= diffuse (specular is additive), and the brightest view
        # carries visibly more specular energy than the dimmest
        views, diffuse, _, _ = synth_scene(jax.random.PRNGKey(3), 64, 64)
        assert float((views - diffuse[None]).min()) >= -1e-6
        energies = jnp.sum(views - diffuse[None], axis=(1, 2, 3))
        assert float(energies.max()) > float(energies.min())


class TestViewsBatch:
    def test_min_ed_mode(self):
        v = synth_views_batch(jax.random.PRNGKey(0), 3, 32, 32, ed_mode="min")
        assert v.shape == (5, 3, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(v[4]),
                                   np.asarray(jnp.min(v[:4], axis=0)),
                                   rtol=0, atol=0)

    def test_diffuse_ed_mode_below_views(self):
        v = synth_views_batch(jax.random.PRNGKey(1), 3, 32, 32, ed_mode="diffuse")
        # true diffuse <= every view (specular is non-negative)
        assert float((v[:4] - v[4:5]).min()) >= -1e-6

    def test_camera_swap_replaces_one_view(self):
        k = jax.random.PRNGKey(5)
        base = synth_views_batch(k, 8, 32, 32, ed_mode="diffuse",
                                 camera_swap_prob=0.0)
        swapped = synth_views_batch(k, 8, 32, 32, ed_mode="diffuse",
                                    camera_swap_prob=1.0)
        # ED (true diffuse) identical; for each sample at most one of the 4
        # views changed (swapping the brightest view is a no-op: that view IS
        # the camera image when its Malus gain equals the max), and some
        # samples must actually change
        np.testing.assert_array_equal(np.asarray(base[4]), np.asarray(swapped[4]))
        diff = np.any(np.asarray(base[:4]) != np.asarray(swapped[:4]),
                      axis=(2, 3, 4))  # (4, B)
        assert (diff.sum(axis=0) <= 1).all()
        assert diff.any()

    def test_jit_compatible_inside_scan(self):
        def body(carry, s):
            v = synth_views_batch(jax.random.fold_in(jax.random.PRNGKey(0), s),
                                  2, 16, 16)
            return carry + jnp.mean(v), None
        total, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(3))
        assert np.isfinite(float(total))


class TestSpecSegBatch:
    def test_standardized_domain(self):
        y, m = synth_specseg_batch(jax.random.PRNGKey(0), 8, 32, 32)
        assert y.shape == (8, 32, 32, 1) and m.shape == (8, 32, 32, 1)
        # standardized (divide by stddev, no mean subtraction): positive, O(1/std)
        assert float(y.min()) >= 0.0
        assert float(y.max()) > 1.5  # not raw [0,1] luma


class TestCurriculumParity:
    """The device curriculum must pose the same task difficulty as the host
    numpy curriculum used for held-out eval (synthetic.py)."""

    @pytest.mark.slow
    def test_identity_baseline_and_mask_coverage_match_numpy(self):
        cam, dif, mask = synth_eval_batch(jax.random.PRNGKey(0), 48, 128, 128)
        mse = jnp.mean((cam - dif) ** 2, axis=(1, 2, 3))
        psnr_jax = float(jnp.mean(-10 * jnp.log10(mse)))
        cov_jax = float(mask.mean())

        ins, gts, masks = synth_eval_set(48, 128, seed=11)
        mse_np = ((ins - gts) ** 2).mean(axis=(1, 2, 3))
        psnr_np = float((-10 * np.log10(mse_np)).mean())
        cov_np = float(masks.mean())

        assert abs(psnr_jax - psnr_np) < 2.5, (psnr_jax, psnr_np)
        assert abs(cov_jax - cov_np) < 0.05, (cov_jax, cov_np)
