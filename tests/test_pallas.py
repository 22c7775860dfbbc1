"""Tests for the Pallas preprocessing kernel.

On the CPU test backend the kernel runs in interpreter mode via
pltpu.force_tpu_interpret_mode so the kernel body itself is validated without TPU
hardware; the XLA fallback path is validated for numerical identity with the
composed reference ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.ops.color import rgb_to_yuv
from shmgan_tpu.ops.pallas.preprocess import fused_standardize_yuv
from shmgan_tpu.ops.standardize import per_image_standardization


@pytest.fixture()
def rgb():
    return jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 128, 3))


class TestFusedStandardizeYUV:
    def test_xla_path_matches_composed_ops(self, rgb):
        yuv, scale = fused_standardize_yuv(rgb, use_pallas=False)
        ref, stats = per_image_standardization(rgb_to_yuv(rgb))
        np.testing.assert_allclose(np.asarray(yuv), np.asarray(ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(scale), np.asarray(stats.stddev),
                                   atol=1e-7)

    def test_pallas_kernel_interpreted(self, rgb):
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yuv, scale = fused_standardize_yuv(rgb, use_pallas=True)
        ref, stats = per_image_standardization(rgb_to_yuv(rgb))
        np.testing.assert_allclose(np.asarray(yuv), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(scale), np.asarray(stats.stddev),
                                   rtol=1e-5)

    def test_uniform_image_guard(self):
        # an all-zero image is the only constant-YUV case (a constant gray still has
        # cross-channel YUV variance since Y != U = V): stddev 0 -> scale = 1/256
        x = jnp.zeros((1, 16, 128, 3))
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yuv, scale = fused_standardize_yuv(x, use_pallas=True)
        np.testing.assert_allclose(float(scale[0]), 1.0 / 256.0, rtol=1e-6)
        assert np.all(np.isfinite(np.asarray(yuv)))
