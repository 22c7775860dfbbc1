"""Frechet distance + inception-score utilities.

The reference carries FID code that would crash if called (TF1 APIs tf.svd/tf.diag/
tf.trace, ShmGANwithSSpecSeg.py:1203-1233; only call site commented out) and a fully
commented-out inception score (:1240-1267). This module provides WORKING, jittable
equivalents:

  frechet_distance(feat_a, feat_b)  — classic FID over arbitrary feature sets
                                      (use any embedding network's pooled features;
                                      for image-space diagnostics, raw pixels can be
                                      passed like the reference intended)
  inception_score(probs)            — IS from class-probability rows

The matrix square root uses a symmetric eigendecomposition (the product
sqrt(Sa) Sb sqrt(Sa) is symmetric PSD), which is exact and differentiable, instead
of the reference's broken SVD path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sym_sqrtm(mat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Matrix square root of a symmetric PSD matrix via eigendecomposition."""
    w, v = jnp.linalg.eigh(mat)
    w = jnp.maximum(w, 0.0)
    return (v * jnp.sqrt(w + eps)) @ v.T


def _cov(x: jnp.ndarray) -> jnp.ndarray:
    """(N, D) -> (D, D) covariance (rows are samples)."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mu
    return (xc.T @ xc) / jnp.maximum(x.shape[0] - 1, 1)


@jax.jit
def frechet_distance(feat_a: jnp.ndarray, feat_b: jnp.ndarray) -> jnp.ndarray:
    """FID between two (N, D) feature sets:
    |mu_a - mu_b|^2 + tr(Sa + Sb - 2 sqrt(sqrt(Sa) Sb sqrt(Sa)))."""
    feat_a = feat_a.reshape(feat_a.shape[0], -1).astype(jnp.float32)
    feat_b = feat_b.reshape(feat_b.shape[0], -1).astype(jnp.float32)
    mu_a = jnp.mean(feat_a, axis=0)
    mu_b = jnp.mean(feat_b, axis=0)
    sa = _cov(feat_a)
    sb = _cov(feat_b)
    diff2 = jnp.sum(jnp.square(mu_a - mu_b))
    sqrt_sa = _sym_sqrtm(sa)
    middle = _sym_sqrtm(sqrt_sa @ sb @ sqrt_sa)
    # Fréchet distance is non-negative by definition; the eigh-sqrtm eps and
    # f32 trace cancellation can push near-identical distributions a hair below
    # zero (observed -0.1 in round-2 artifacts) — clamp so reports stay honest.
    return jnp.maximum(
        diff2 + jnp.trace(sa) + jnp.trace(sb) - 2.0 * jnp.trace(middle), 0.0)


# ---------------------------------------------------------------------------
# Embedding network: the frozen SpecSeg encoder
# ---------------------------------------------------------------------------
# FID needs features from a network trained on the image domain. The reference
# had none (its FID is dead TF1 code). This framework always carries one: the
# SpecSeg U-Net is trained on specular imagery and rides along frozen in every
# pipeline (ShmGANwithSSpecSeg.py:930-931 analogue), so its bottleneck — a
# (H/16, W/16, 16*base) map after four contracting levels — is the natural
# embedding. Features are the globally mean-pooled bottleneck activations.

def specseg_features(specseg_vars, rgb: jnp.ndarray,
                     base_filters: int = 16) -> jnp.ndarray:
    """(B, H, W, 3) RGB in [0,1] -> (B, 16*base_filters) pooled encoder features.

    Inputs go through the exact preprocessing every SpecSeg consumer uses
    (standardized luma, train/step.py:113-116 / infer.py:49-53), so the
    embedding sees its training distribution.
    """
    from shmgan_tpu.checkpoint import specseg_in_channels_of
    from shmgan_tpu.models import SpecSeg
    from shmgan_tpu.ops.color import rgb_to_yuv
    from shmgan_tpu.ops.specprior import specseg_net_input
    from shmgan_tpu.ops.standardize import per_image_standardization

    net = SpecSeg(base_filters=base_filters)
    y, _ = per_image_standardization(rgb_to_yuv(rgb)[..., 0:1])
    # chroma-input nets (2 channels) embed through the same input they were
    # trained on; the channel count is read off the variable tree itself so
    # every FID caller works with either net generation
    net_in = specseg_net_input(y, rgb, specseg_in_channels_of(specseg_vars))
    _, state = net.apply(specseg_vars, net_in, train=False,
                         capture_intermediates=True, mutable=["intermediates"])
    feats = state["intermediates"]["bottom"]["__call__"][0]
    return jnp.mean(feats.astype(jnp.float32), axis=(1, 2))


def fid_from_images(specseg_vars, images_a: jnp.ndarray, images_b: jnp.ndarray,
                    base_filters: int = 16) -> jnp.ndarray:
    """FID between two image sets under the frozen SpecSeg encoder embedding."""
    return frechet_distance(
        specseg_features(specseg_vars, images_a, base_filters),
        specseg_features(specseg_vars, images_b, base_filters))


@jax.jit
def inception_score(probs: jnp.ndarray, eps: float = 1e-16) -> jnp.ndarray:
    """IS = exp(E_x KL(p(y|x) || p(y))) for (N, C) probability rows
    (the formula of the reference's commented block, :1240-1260)."""
    probs = probs.astype(jnp.float32)
    p_y = jnp.mean(probs, axis=0, keepdims=True)
    kl = probs * (jnp.log(probs + eps) - jnp.log(p_y + eps))
    return jnp.exp(jnp.mean(jnp.sum(kl, axis=1)))
