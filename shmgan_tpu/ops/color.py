"""Color-space conversions (pure JAX, NHWC).

Matches the reference's TF ops bit-for-bit in f32:
  tf.image.rgb_to_yuv / tf.image.yuv_to_rgb  (ShmGANwithSSpecSeg.py:480-484, 550-553)
  tfio rgb_to_lab for the deltaE metrics     (test.py:351-352)

All functions take (..., 3) arrays; any leading batch/spatial dims are fine.  The
conversions are 3x3 matmuls on the channel axis — XLA fuses these into neighbouring
elementwise work, so there is no dedicated Pallas kernel for them; the fused
preprocessing kernel in ops/pallas/preprocess.py folds rgb_to_yuv into the
standardization pass instead.
"""

from __future__ import annotations

import jax.numpy as jnp

# TF's RGB<->YUV matrix constants (tensorflow/python/ops/image_ops_impl.py
# _rgb_to_yuv_kernel / _yuv_to_rgb_kernel). Implemented as explicit FMA rather than
# a (...,3)x(3,3) matmul: a 3-wide contraction can't tile the 128x128 MXU, and on
# TPU jnp.matmul's default precision would run it through bf16 passes (measured
# ~1e-3 error); the FMA form is exact f32 on the VPU and fuses into neighbours.

def rgb_to_yuv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB (any range) -> YUV. Last axis must be 3."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.14714119 * r + -0.28886916 * g + 0.43601035 * b
    v = 0.61497538 * r + -0.51496512 * g + -0.10001026 * b
    return jnp.stack([y, u, v], axis=-1)


def yuv_to_rgb(yuv: jnp.ndarray) -> jnp.ndarray:
    """YUV -> RGB. Last axis must be 3."""
    y, u, v = yuv[..., 0], yuv[..., 1], yuv[..., 2]
    r = y + 1.13988303 * v
    g = y + -0.394642334 * u + -0.58062185 * v
    b = y + 2.03206185 * u
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# sRGB -> CIE Lab (D65), replicating skimage.color.rgb2lab / tfio rgb_to_lab
# semantics used by the reference's deltaE metrics (test.py:351-354).
# ---------------------------------------------------------------------------

# D65 reference white
_XYZ_REF_WHITE = jnp.array([0.95047, 1.0, 1.08883], dtype=jnp.float32)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB in [0,1] -> CIE Lab (L in [0,100])."""
    rgb = rgb.astype(jnp.float32)
    # inverse sRGB companding
    linear = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    lr, lg, lb = linear[..., 0], linear[..., 1], linear[..., 2]
    # sRGB -> XYZ (same FMA-instead-of-matmul rationale as rgb_to_yuv above)
    x = 0.412453 * lr + 0.357580 * lg + 0.180423 * lb
    y = 0.212671 * lr + 0.715160 * lg + 0.072169 * lb
    z = 0.019334 * lr + 0.119193 * lg + 0.950227 * lb
    xyz = jnp.stack([x, y, z], axis=-1)
    xyz = xyz / _XYZ_REF_WHITE
    eps = 0.008856  # (6/29)^3
    kappa = 7.787   # (1/3)*(29/6)^2 as used by skimage
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), kappa * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def delta_e_76(lab1: jnp.ndarray, lab2: jnp.ndarray) -> jnp.ndarray:
    """CIE76 color difference per pixel (skimage.color.deltaE_cie76)."""
    return jnp.sqrt(jnp.sum(jnp.square(lab1 - lab2), axis=-1))


def gray_world_white_balance(rgb: jnp.ndarray, strength: float = 1.1) -> jnp.ndarray:
    """Gray-world white balance in Lab space.

    Working version of the reference's commented-out white_balance helper
    (utils.py:130-137): shift the a/b chroma channels toward neutral by the
    luminance-weighted average cast. rgb in [0,1], (B,H,W,3) or (H,W,3).
    """
    lab = rgb_to_lab(jnp.clip(rgb, 0.0, 1.0))
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    axes = tuple(range(lab.ndim - 3, lab.ndim - 1))  # spatial dims
    avg_a = jnp.mean(a, axis=axes, keepdims=True)
    avg_b = jnp.mean(b, axis=axes, keepdims=True)
    lw = (L / 100.0) * strength
    a = a - avg_a * lw
    b = b - avg_b * lw
    return lab_to_rgb(jnp.stack([L, a, b], axis=-1))


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """CIE Lab (D65) -> sRGB in [0,1] (inverse of rgb_to_lab)."""
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    eps = 0.008856
    kappa = 7.787

    def f_inv(t):
        t3 = t ** 3
        return jnp.where(t3 > eps, t3, (t - 16.0 / 116.0) / kappa)

    xyz = jnp.stack([f_inv(fx), f_inv(fy), f_inv(fz)], axis=-1) * _XYZ_REF_WHITE
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    # XYZ -> linear sRGB (inverse of the matrix in rgb_to_lab)
    r = 3.240481 * x + -1.537152 * y + -0.498536 * z
    g = -0.969255 * x + 1.875990 * y + 0.041556 * z
    bl = 0.055647 * x + -0.204041 * y + 1.057311 * z
    linear = jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 1.0)
    srgb = jnp.where(linear > 0.0031308,
                     1.055 * jnp.power(linear, 1.0 / 2.4) - 0.055,
                     12.92 * linear)
    return jnp.clip(srgb, 0.0, 1.0)


def delta_e_94(lab1: jnp.ndarray, lab2: jnp.ndarray,
               kH: float = 1.0, kC: float = 1.0, kL: float = 1.0,
               k1: float = 0.045, k2: float = 0.015) -> jnp.ndarray:
    """CIE94 color difference per pixel (skimage.color.deltaE_ciede94 defaults)."""
    L1, a1, b1 = lab1[..., 0], lab1[..., 1], lab1[..., 2]
    L2, a2, b2 = lab2[..., 0], lab2[..., 1], lab2[..., 2]
    dL = L1 - L2
    C1 = jnp.hypot(a1, b1)
    C2 = jnp.hypot(a2, b2)
    dC = C1 - C2
    dE2 = jnp.sum(jnp.square(lab1 - lab2), axis=-1)
    dH2 = jnp.maximum(dE2 - dL * dL - dC * dC, 0.0)
    SL = 1.0
    SC = 1.0 + k1 * C1
    SH = 1.0 + k2 * C1
    return jnp.sqrt((dL / (kL * SL)) ** 2 + (dC / (kC * SC)) ** 2 + dH2 / (kH * SH) ** 2)
