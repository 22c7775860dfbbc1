"""Per-image standardization and rescaling, replicating the reference numerics.

custom_per_image_standardization (ShmGANwithSSpecSeg.py:1270-1309):
  - statistics are over the WHOLE image tensor (all of H, W, C together)
  - variance = relu(E[x^2] - E[x]^2); stddev = sqrt(variance)
  - scale = max(stddev, rsqrt(num_pixels)) with num_pixels HARDCODED to 65536
    (the "for 256x256" comment; it stays 65536 even at image_size=128 — replicated)
  - NO mean subtraction (the subtract is commented out at :1301-1302)
  - the reference appends stddev/mean/variance to Python lists for later
    de-normalization; here the stats are returned functionally.

rescale_01 (utils.py:190-195): min-max rescale with divide_no_nan semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

# The reference hardcodes num_pixels = 65536 regardless of actual image size
# (ShmGANwithSSpecSeg.py:1280). min_stddev = rsqrt(65536) = 1/256.
_REF_NUM_PIXELS = 65536.0
MIN_STDDEV = 1.0 / 256.0


class ImageStats(NamedTuple):
    mean: jnp.ndarray      # per-image mean  (shape: batch)
    stddev: jnp.ndarray    # per-image scale actually applied (>= MIN_STDDEV)
    variance: jnp.ndarray  # per-image variance


def per_image_standardization(image: jnp.ndarray) -> Tuple[jnp.ndarray, ImageStats]:
    """Divide each image by max(stddev, 1/256); no mean subtraction.

    image: (B, H, W, C) float array. Statistics are computed per batch element over
    (H, W, C), matching the reference at batch=1 and generalizing per-image for B>1.
    Returns (standardized image, per-image stats for later de-normalization).
    """
    x = image.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(x, axis=axes)
    variance = jnp.maximum(jnp.mean(jnp.square(x), axis=axes) - jnp.square(mean), 0.0)
    stddev = jnp.sqrt(variance)
    scale = jnp.maximum(stddev, jnp.float32(MIN_STDDEV))
    bshape = (-1,) + (1,) * (x.ndim - 1)
    out = x / scale.reshape(bshape)
    return out, ImageStats(mean=mean, stddev=scale, variance=variance)


def rescale_01(x: jnp.ndarray) -> jnp.ndarray:
    """Min-max rescale over the whole tensor, with 0/0 -> 0 (tf divide_no_nan)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    denom = hi - lo
    return jnp.where(denom == 0, jnp.zeros_like(x), (x - lo) / denom)


def rescale_01_per_image(x: jnp.ndarray) -> jnp.ndarray:
    """Per-batch-element min-max rescale (batch generalization of rescale_01).

    The reference calls rescale_01 on batch-1 tensors so global == per-image there.
    """
    axes = tuple(range(1, x.ndim))
    lo = jnp.min(x, axis=axes, keepdims=True)
    hi = jnp.max(x, axis=axes, keepdims=True)
    denom = hi - lo
    return jnp.where(denom == 0, jnp.zeros_like(x), (x - lo) / denom)
