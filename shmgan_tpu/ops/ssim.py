"""SSIM and PSNR replicating tf.image.ssim / tf.image.psnr semantics.

The reference uses tf.image.ssim with max_val=5 on rescaled YUV tensors inside the
training loss (ShmGANwithSSpecSeg.py:759-763) and with max_val=5 on rescaled RGB in
evaluation (test.py:336); tf.image.psnr with max_val=1 in evaluation (test.py:342).

tf.image.ssim algorithm (tensorflow/python/ops/image_ops_impl.py):
  - 11x11 gaussian window, sigma 1.5, applied as two separable VALID convolutions
  - k1=0.01, k2=0.03; c1=(k1*max_val)^2, c2=(k2*max_val)^2
  - luminance = (2*mu_x*mu_y + c1) / (mu_x^2 + mu_y^2 + c1)
  - cs        = (2*cov_xy + c2) / (var_x + var_y + c2), cov/var via the same window
  - per-image score = mean over window positions and channels

Implemented with two 1-D depthwise convolutions (lax.conv_general_dilated with
feature_group_count=C) — entirely XLA-fusable; the gaussian taps are compile-time
constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _gaussian_taps(filter_size: int, sigma: float):
    coords = np.arange(filter_size, dtype=np.float64) - (filter_size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.asarray(g, dtype=np.float32)


def _separable_gaussian(x: jnp.ndarray, filter_size: int, sigma: float) -> jnp.ndarray:
    """Depthwise separable gaussian blur, VALID padding. x: (B,H,W,C)."""
    taps = jnp.asarray(_gaussian_taps(filter_size, sigma))
    c = x.shape[-1]
    kh = jnp.tile(taps.reshape(filter_size, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1
    kw = jnp.tile(taps.reshape(1, filter_size, 1, 1), (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    # HIGHEST precision: on TPU the default lets f32 convs run at bf16 matmul
    # precision, and SSIM's variance path blur(x*x) - mu^2 cancels almost all
    # of bf16's 8 mantissa bits — measured ~0.3 absolute SSIM deflation on v5e.
    # The 11-tap blur is negligible next to the models, so exactness is free.
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return x


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float,
         filter_size: int = 11, filter_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Per-image SSIM, (B,H,W,C) -> (B,). Matches tf.image.ssim."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    blur = lambda t: _separable_gaussian(t, filter_size, filter_sigma)

    mu_a = blur(a)
    mu_b = blur(b)
    mu_aa = blur(a * a)
    mu_bb = blur(b * b)
    mu_ab = blur(a * b)

    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b

    luminance = (2.0 * mu_a * mu_b + c1) / (mu_a * mu_a + mu_b * mu_b + c1)
    cs = (2.0 * cov + c2) / (var_a + var_b + c2)
    score = luminance * cs
    return jnp.mean(score, axis=tuple(range(1, score.ndim)))


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float) -> jnp.ndarray:
    """Per-image PSNR in dB, (B,H,W,C) -> (B,). Matches tf.image.psnr."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mse = jnp.mean(jnp.square(a - b), axis=tuple(range(1, a.ndim)))
    return 10.0 / jnp.log(10.0) * jnp.log((max_val ** 2) / mse)


def ssim_log_loss(s: jnp.ndarray) -> jnp.ndarray:
    """-log((1+ssim)/2), the cyclic SSIM loss transform (ShmGANwithSSpecSeg.py:774-778)."""
    return -jnp.log((1.0 + s) / 2.0)


@jax.jit
def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Scalar MSE matching keras MeanSquaredError (test.py:346-347)."""
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))
