"""Pallas TPU kernel: fused RGB->YUV + per-image standardization.

The BASELINE north star calls for the polarimetric ingest (normalize + color
transform) to run as a fused on-device stage. Two implementations live here:

  * the XLA path (default): rgb_to_yuv + per_image_standardization — after XLA
    fusion this is already a near-roofline memory-bound kernel chain, and NHWC with
    C=3 is the layout the convs downstream want.
  * a Pallas kernel (fused_standardize_yuv(..., use_pallas=True)): one program per
    image, channels-FIRST internally — a (C,H,W) block keeps the VPU lane dimension
    at W=128 instead of the catastrophic C=3-padded-to-128 layout NHWC would give a
    TPU kernel (42x VMEM blowup, measured). The boundary transposes are XLA ops.

Profiling on v5e (see tests/test_pallas.py and bench notes): the XLA path is within
noise of the Pallas kernel for this op at SHMGAN sizes, so the XLA path stays the
default per SURVEY.md §7 ("Pallas only where profiling justifies it"); the kernel is
kept as the validated template for the fused-ingest stage at larger resolutions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from shmgan_tpu.ops.color import rgb_to_yuv
from shmgan_tpu.ops.standardize import per_image_standardization

# TF rgb_to_yuv matrix rows (see ops/color.py)
_M = ((0.299, 0.587, 0.114),
      (-0.14714119, -0.28886916, 0.43601035),
      (0.61497538, -0.51496512, -0.10001026))


def _kernel(rgb_ref, yuv_ref, scale_ref):
    # rgb_ref block: (1, 3, H, W) channels-first in VMEM
    r = rgb_ref[0, 0]
    g = rgb_ref[0, 1]
    b = rgb_ref[0, 2]
    y = _M[0][0] * r + _M[0][1] * g + _M[0][2] * b
    u = _M[1][0] * r + _M[1][1] * g + _M[1][2] * b
    v = _M[2][0] * r + _M[2][1] * g + _M[2][2] * b

    n = 3 * y.size
    total = jnp.sum(y) + jnp.sum(u) + jnp.sum(v)
    total_sq = jnp.sum(y * y) + jnp.sum(u * u) + jnp.sum(v * v)
    mean = total / n
    var = jnp.maximum(total_sq / n - mean * mean, 0.0)
    # reference semantics: divide by max(stddev, 1/256), NO mean subtraction
    # (ShmGANwithSSpecSeg.py:1280-1302)
    scale = jnp.maximum(jnp.sqrt(var), 1.0 / 256.0)
    inv = 1.0 / scale

    yuv_ref[0, 0] = y * inv
    yuv_ref[0, 1] = u * inv
    yuv_ref[0, 2] = v * inv
    scale_ref[...] = jnp.full((1, 8, 128), scale, jnp.float32)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def fused_standardize_yuv(rgb: jnp.ndarray, use_pallas: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,H,W,3) RGB [0,1] -> (standardized YUV (B,H,W,3), per-image scales (B,))."""
    if not use_pallas:
        out, stats = per_image_standardization(rgb_to_yuv(rgb))
        return out, stats.stddev

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = rgb.shape
    chw = jnp.transpose(rgb.astype(jnp.float32), (0, 3, 1, 2))  # (B,3,H,W)
    yuv_chw, scale = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        ],
    )(chw)
    return jnp.transpose(yuv_chw, (0, 2, 3, 1)), scale[:, 0, 0]
