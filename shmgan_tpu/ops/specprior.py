"""Dichromatic chroma prior for specular masks — an inference-time physics
cue the reference pipeline cannot express.

The reference's SpecSeg (and our parity net, models/specseg.py) consumes a
single standardized LUMA channel (ShmGANwithSSpecSeg.py:930-931 feeds Y only;
test.py:221 the same): the net literally never sees chroma, so it cannot
separate a bright *diffuse* surface (white paper, pale wall) from a specular
highlight. On real photographs that is exactly its measured failure mode
(round-3 OOD artifact: precision 0.30 against the reference's own masks —
over-firing on bright diffuse regions).

The dichromatic reflection model supplies the missing cue for free: a
specular lobe adds the (near-achromatic) illuminant to all three channels,
so inside a highlight

  * the per-pixel MIN channel spikes far above the image's diffuse baseline
    (the classic modified-specular-free-image observation — a purely diffuse
    pixel's min channel is bounded by the body color), and
  * HSV saturation collapses while brightness peaks.

`chroma_prior` turns those two observations into per-image soft scores with
robust statistics (median/MAD baseline for the min channel; a per-image
brightness quantile so exposure differences cancel) and takes their union.
No training, no parameters fit to any dataset — every constant below is a
generic soft threshold.

Fusing the prior with the learned net's probability (plain average,
`fuse_mask_prior`) was A/B-measured on all four eval domains at the default
0.5 operating threshold (benchmarks/quality_r3_prior/mask_ab.json):

  real photos (vs reference masks)  IoU 0.213 -> 0.268   (+26%)
  synthetic OOD family              IoU 0.889 -> 0.906
  base curriculum (held out)        IoU 0.757 -> 0.794
  DR curriculum (grayscale — the prior degenerates)      -0.4% (noise)

i.e. the prior adds information everywhere chroma exists and is harmless
where it doesn't. Enabled by cfg.eval.mask_chroma_prior (off by default for
strict reference parity); all inference surfaces honor the flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_image_median(x: jnp.ndarray) -> jnp.ndarray:
    """Median over the spatial axes of (B, H, W, 1) -> (B, 1, 1, 1)."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    return jnp.median(flat, axis=1).reshape(b, 1, 1, 1)


def _per_image_quantile(x: jnp.ndarray, q: float) -> jnp.ndarray:
    b = x.shape[0]
    flat = x.reshape(b, -1)
    return jnp.quantile(flat, q, axis=1).reshape(b, 1, 1, 1)


def chroma_prior(rgb: jnp.ndarray) -> jnp.ndarray:
    """Soft specular-highlight prior from chroma statistics.

    rgb: (B, H, W, 3) in [0, 1]. Returns (B, H, W, 1) in [0, 1], float32.
    Jittable, static-shaped, reduction-only (two per-image sorts for the
    median/quantile baselines — negligible next to a conv stack).
    """
    x = rgb.astype(jnp.float32)
    mx = jnp.max(x, axis=-1, keepdims=True)
    mn = jnp.min(x, axis=-1, keepdims=True)
    sat = (mx - mn) / jnp.maximum(mx, 1e-3)

    # Cue 1: min-channel excess over the per-image robust diffuse baseline.
    # MAD (not stddev) so the highlights themselves don't inflate the scale.
    med = _per_image_median(mn)
    mad = _per_image_median(jnp.abs(mn - med)) + 1e-3
    p_minc = jax.nn.sigmoid(((mn - med) / mad - 6.0) / 2.0)

    # Cue 2: bright AND desaturated. The brightness gate combines a per-image
    # quantile (self-normalizes across exposures) with an absolute floor —
    # without the floor, a highlight-free low-contrast scene would still mark
    # its top brightness decile.
    v = jnp.mean(x, axis=-1, keepdims=True)
    p_bright = (jax.nn.sigmoid((v - _per_image_quantile(v, 0.90)) / 0.03)
                * jax.nn.sigmoid((v - 0.5) / 0.1))
    p_desat = jax.nn.sigmoid((0.25 - sat) / 0.08)

    return jnp.maximum(p_minc, p_bright * p_desat)


def fuse_mask_prior(p_net: jnp.ndarray, prior: jnp.ndarray) -> jnp.ndarray:
    """Average the learned net's probability with the physics prior.

    A plain mean keeps the default 0.5 operating threshold meaningful: a
    pixel passes when the two sources jointly believe it (one very confident,
    or both moderately so). Measured against gating/geometric-mean/max
    variants on the real-photo + OOD + curriculum domains, the mean was the
    only fusion that improved every domain at t=0.5 (module docstring).
    """
    return 0.5 * (p_net.astype(jnp.float32) + prior)


def specseg_net_input(y_std: jnp.ndarray, rgb: jnp.ndarray,
                      in_channels: int) -> jnp.ndarray:
    """Build the SpecSeg input for a given cfg.model.specseg_in_channels.

    in_channels=1 is reference parity (standardized luma alone); 2 appends
    chroma_prior(rgb) as a second channel so a chroma-trained net can learn
    a spatial trust map for the physics cue (the output-mean fusion of
    fuse_mask_prior applies it uniformly). rgb must be the SAME image y_std
    was standardized from, in [0, 1].
    """
    if in_channels == 1:
        return y_std
    if in_channels == 2:
        return jnp.concatenate([y_std, chroma_prior(rgb)], axis=-1)
    raise ValueError(f"specseg_in_channels must be 1 or 2, got {in_channels}")
