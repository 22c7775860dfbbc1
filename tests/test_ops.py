"""Unit tests for shmgan_tpu.ops — numerics replicated from the reference.

Reference semantics under test (file:line cited per case):
  tf.image.rgb_to_yuv / yuv_to_rgb          (ShmGANwithSSpecSeg.py:480-484,550-553)
  custom_per_image_standardization          (ShmGANwithSSpecSeg.py:1270-1309)
  rescale_01                                (utils.py:190-195)
  tf.image.ssim / tf.image.psnr             (train loss :759-763; test.py:336-342)
  calculate_estimate_diffuse                (utils.py:68-123)
  calcDOP                                   (ShmGANwithSSpecSeg.py:1156-1169)
  gram_matrix                               (ShmGANwithSSpecSeg.py:1176-1180)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from shmgan_tpu.ops.color import (
    delta_e_76, delta_e_94, rgb_to_lab, rgb_to_yuv, yuv_to_rgb,
)
from shmgan_tpu.ops.polar import calc_dop, estimate_diffuse, gram_matrix
from shmgan_tpu.ops.ssim import psnr, ssim
from shmgan_tpu.ops.standardize import (
    MIN_STDDEV, per_image_standardization, rescale_01, rescale_01_per_image,
)

RNG = np.random.default_rng(25)


class TestColor:
    def test_yuv_roundtrip(self):
        rgb = RNG.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
        back = yuv_to_rgb(rgb_to_yuv(jnp.asarray(rgb)))
        np.testing.assert_allclose(np.asarray(back), rgb, atol=2e-6)

    def test_yuv_known_values(self):
        # Pure white -> Y=1, U=V=0 under the TF matrix (rows sum: .299+.587+.114=1)
        white = jnp.ones((1, 1, 1, 3))
        yuv = np.asarray(rgb_to_yuv(white))
        np.testing.assert_allclose(yuv[0, 0, 0], [1.0, 0.0, 0.0], atol=1e-6)
        # Pure red -> Y=0.299
        red = jnp.zeros((1, 1, 1, 3)).at[..., 0].set(1.0)
        yuv = np.asarray(rgb_to_yuv(red))
        assert abs(yuv[0, 0, 0, 0] - 0.299) < 1e-6

    def test_rgb_to_lab_white(self):
        lab = np.asarray(rgb_to_lab(jnp.ones((1, 1, 3))))
        np.testing.assert_allclose(lab[0, 0], [100.0, 0.0, 0.0], atol=1e-2)

    def test_delta_e_76_formula(self):
        lab1 = jnp.asarray([[50.0, 10.0, -5.0]])
        lab2 = jnp.asarray([[52.0, 7.0, -1.0]])
        expect = np.sqrt(2.0 ** 2 + 3.0 ** 2 + 4.0 ** 2)
        np.testing.assert_allclose(np.asarray(delta_e_76(lab1, lab2))[0], expect,
                                   rtol=1e-6)

    def test_delta_e_94_equal_is_zero(self):
        lab = jnp.asarray(RNG.uniform(-50, 50, (4, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(delta_e_94(lab, lab)), 0.0, atol=1e-5)


class TestStandardize:
    def test_matches_reference_semantics(self):
        # Reference: divide by max(stddev, rsqrt(65536)), stats over ALL dims,
        # NO mean subtraction (ShmGANwithSSpecSeg.py:1280-1302).
        x = RNG.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
        out, stats = per_image_standardization(jnp.asarray(x))
        mean = x.mean()
        var = max((x ** 2).mean() - mean ** 2, 0.0)
        scale = max(np.sqrt(var), 1.0 / 256.0)
        np.testing.assert_allclose(np.asarray(out), x / scale, rtol=1e-5)
        np.testing.assert_allclose(float(stats.mean[0]), mean, rtol=1e-5)
        np.testing.assert_allclose(float(stats.stddev[0]), scale, rtol=1e-5)

    def test_uniform_image_guard(self):
        # Constant image: stddev=0 -> scale=1/256 (the rsqrt(65536) guard)
        x = jnp.full((1, 8, 8, 3), 0.5)
        out, stats = per_image_standardization(x)
        assert abs(float(stats.stddev[0]) - MIN_STDDEV) < 1e-9
        np.testing.assert_allclose(np.asarray(out), 0.5 * 256.0, rtol=1e-6)

    def test_batched_is_per_image(self):
        a = RNG.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        b = RNG.uniform(0, 5, (1, 8, 8, 3)).astype(np.float32)
        both, _ = per_image_standardization(jnp.concatenate([a, b], axis=0))
        solo_a, _ = per_image_standardization(jnp.asarray(a))
        solo_b, _ = per_image_standardization(jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(both[0]), np.asarray(solo_a[0]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(both[1]), np.asarray(solo_b[0]), rtol=1e-6)

    def test_rescale_01(self):
        x = jnp.asarray([[-1.0, 0.0], [1.0, 3.0]])
        out = np.asarray(rescale_01(x))
        np.testing.assert_allclose(out, [[0.0, 0.25], [0.5, 1.0]], rtol=1e-6)
        # divide_no_nan semantics: constant tensor -> zeros
        np.testing.assert_allclose(np.asarray(rescale_01(jnp.full((3,), 2.0))), 0.0)

    def test_rescale_01_per_image(self):
        x = RNG.uniform(-2, 2, (3, 6, 6, 3)).astype(np.float32)
        out = np.asarray(rescale_01_per_image(jnp.asarray(x)))
        for i in range(3):
            np.testing.assert_allclose(out[i].min(), 0.0, atol=1e-6)
            np.testing.assert_allclose(out[i].max(), 1.0, atol=1e-6)


def _ssim_naive(a, b, max_val, filter_size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent O(N^2) numpy implementation of tf.image.ssim for validation."""
    coords = np.arange(filter_size) - (filter_size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    win = np.outer(g, g)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    B, H, W, C = a.shape
    out = np.zeros(B)
    for n in range(B):
        vals = []
        for c in range(C):
            x = a[n, :, :, c]
            y = b[n, :, :, c]
            for i in range(H - filter_size + 1):
                for j in range(W - filter_size + 1):
                    px = x[i:i + filter_size, j:j + filter_size]
                    py = y[i:i + filter_size, j:j + filter_size]
                    mx = (px * win).sum()
                    my = (py * win).sum()
                    vx = (px * px * win).sum() - mx * mx
                    vy = (py * py * win).sum() - my * my
                    cov = (px * py * win).sum() - mx * my
                    lum = (2 * mx * my + c1) / (mx * mx + my * my + c1)
                    cs = (2 * cov + c2) / (vx + vy + c2)
                    vals.append(lum * cs)
        out[n] = np.mean(vals)
    return out


class TestSSIM:
    def test_identity_is_one(self):
        x = jnp.asarray(RNG.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
        s = np.asarray(ssim(x, x, max_val=1.0))
        np.testing.assert_allclose(s, 1.0, atol=1e-5)

    def test_against_naive_implementation(self):
        a = RNG.uniform(0, 1, (1, 16, 16, 2)).astype(np.float32)
        b = np.clip(a + RNG.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
        ref = _ssim_naive(a, b, max_val=1.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_max_val_5(self):
        # The reference's odd max_val=5 on [0,1]-rescaled inputs — just check the
        # constant plumbing matches the naive implementation.
        a = RNG.uniform(0, 1, (1, 14, 14, 1)).astype(np.float32)
        b = RNG.uniform(0, 1, (1, 14, 14, 1)).astype(np.float32)
        ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), max_val=5.0))
        ref = _ssim_naive(a, b, max_val=5.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_psnr_known(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
        np.testing.assert_allclose(np.asarray(psnr(a, b, 1.0))[0], 20.0, rtol=1e-5)


class TestPolar:
    def test_estimate_diffuse_is_channelwise_min(self):
        views = [RNG.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32) for _ in range(4)]
        ed = np.asarray(estimate_diffuse(*[jnp.asarray(x) for x in views]))
        np.testing.assert_allclose(ed, np.min(np.stack(views), axis=0), rtol=1e-6)

    def test_calc_dop(self):
        i0 = jnp.full((1, 4, 4, 1), 0.8)
        i45 = jnp.full((1, 4, 4, 1), 0.5)
        i90 = jnp.full((1, 4, 4, 1), 0.2)
        i135 = jnp.full((1, 4, 4, 1), 0.5)
        dop, aop = calc_dop(i0, i45, i90, i135)
        # S0=1.0, S1=0.6, S2=0.0 -> DoP=0.6, AoP=0
        np.testing.assert_allclose(np.asarray(dop), 0.6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(aop), 0.0, atol=1e-7)

    def test_dop_divide_no_nan(self):
        z = jnp.zeros((1, 2, 2, 1))
        dop, _ = calc_dop(z, z, z, z)
        assert np.all(np.isfinite(np.asarray(dop)))
        np.testing.assert_allclose(np.asarray(dop), 0.0)

    def test_gram_matrix(self):
        x = RNG.uniform(-1, 1, (2, 4, 4, 3)).astype(np.float32)
        g = np.asarray(gram_matrix(jnp.asarray(x)))
        ref = np.einsum("bijc,bijd->bcd", x, x) / (4 * 4)
        np.testing.assert_allclose(g, ref, rtol=1e-5)
        assert g.shape == (2, 3, 3)


class TestWhiteBalance:
    def test_lab_roundtrip(self):
        from shmgan_tpu.ops.color import lab_to_rgb
        rgb = jnp.asarray(RNG.uniform(0.05, 0.95, (2, 8, 8, 3)).astype(np.float32))
        back = lab_to_rgb(rgb_to_lab(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-3)

    def test_gray_world_reduces_cast(self):
        from shmgan_tpu.ops.color import gray_world_white_balance
        # strong red cast on a gray-ish scene
        base = RNG.uniform(0.3, 0.6, (1, 16, 16, 3)).astype(np.float32)
        cast = base.copy()
        cast[..., 0] = np.clip(cast[..., 0] + 0.25, 0, 1)
        out = np.asarray(gray_world_white_balance(jnp.asarray(cast)))
        lab_in = np.asarray(rgb_to_lab(jnp.asarray(cast)))
        lab_out = np.asarray(rgb_to_lab(jnp.asarray(out)))
        # mean chroma magnitude must shrink toward neutral
        assert np.abs(lab_out[..., 1]).mean() < np.abs(lab_in[..., 1]).mean()
