"""Polarimetric physics ops and style-transfer building blocks.

estimate_diffuse — pseudo/estimated-diffuse (ED) synthesis: per-pixel channel-wise
minimum across the four polarization views (utils.py:68-123, which does the same with
cv2.split + np.amin per channel). The reference runs this offline on the host; here it
is a pure JAX op usable inside the jitted ingest path.

calc_dop — Stokes-parameter degree of polarization (ShmGANwithSSpecSeg.py:1156-1169).

gram_matrix — batched gram matrix for the neural-style-transfer loss
(ShmGANwithSSpecSeg.py:1176-1180: einsum('bijc,bijd->bcd') / (H*W)).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def estimate_diffuse(i0: jnp.ndarray, i45: jnp.ndarray,
                     i90: jnp.ndarray, i135: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel, per-channel min across the 4 polarization views.

    Accepts (..., H, W, C) arrays of identical shape; returns the same shape.
    """
    return jnp.minimum(jnp.minimum(i0, i45), jnp.minimum(i90, i135))


def calc_dop(i0_y: jnp.ndarray, i45_y: jnp.ndarray,
             i90_y: jnp.ndarray, i135_y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Degree and angle of linear polarization from 4 polarizer-angle intensities.

    S0 = I0 + I90, S1 = I0 - I90, S2 = I45 - I135
    DoP = sqrt(S1^2 + S2^2) / S0 (0 where S0 == 0, tf divide_no_nan semantics)
    AoP = 0.5 * atan2(S2, S1)   (computed and dropped by the reference; returned here)
    """
    s0 = i0_y + i90_y
    s1 = i0_y - i90_y
    s2 = i45_y - i135_y
    pol_intensity = jnp.sqrt(jnp.square(s1) + jnp.square(s2))
    dop = jnp.where(s0 == 0, jnp.zeros_like(s0), pol_intensity / jnp.where(s0 == 0, 1.0, s0))
    aop = 0.5 * jnp.arctan2(s2, s1)
    return dop, aop


def gram_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,C,C) gram matrix normalized by H*W."""
    b, h, w, c = x.shape
    num_locations = jnp.float32(h * w)
    g = jnp.einsum("bijc,bijd->bcd", x, x)
    return g / num_locations
