"""On-device synthetic polarimetric scenes — the jittable twin of synthetic.py.

The host<->TPU path on this deployment is a network relay (~MB/s), so feeding the
170 img/s trainer from host-generated numpy scenes would be transfer-bound by two
orders of magnitude. This module generates the SAME curriculum (value-noise diffuse
textures + anisotropic, tinted, Malus-law-modulated specular lobes — see
synthetic.py for the physical model and reference citations, utils.py:68-123)
entirely inside the XLA graph: the training scan draws a fresh batch per step from
a folded PRNG key, so an unbounded stream of unique scenes costs zero bytes of
host traffic and a negligible slice of step time.

Distribution parameters are kept numerically identical to synthetic.py so that
models trained on this stream evaluate cleanly on the host-side held-out sets
(synthetic.py::synth_eval_set). The two generators share constants but not RNG
streams — train/eval scenes are disjoint by construction.

Everything here is shape-static and vmap/jit-friendly: variable highlight counts
are expressed as a fixed MAX_LOBES with amplitude masking, and the multi-octave
value noise uses jax.image.resize on per-octave coarse grids.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_VIEW_ANGLES_RAD = tuple(float(a) for a in (0.0, 0.7853981633974483,
                                            1.5707963267948966,
                                            2.356194490192345))
MAX_LOBES = 7  # synthetic.py draws n_highlights in [2, 8)


def _octave_sizes(h: int, w: int, octaves: int) -> Tuple[Tuple[int, int], ...]:
    sizes = []
    for o in range(octaves):
        step = max(1, min(h, w) >> (o + 1))
        sizes.append((max(2, h // step), max(2, w // step)))
    return tuple(sizes)


def smooth_noise(key: jax.Array, h: int, w: int, c: int,
                 octaves: int = 4) -> jnp.ndarray:
    """Multi-octave value noise in [0,1], (h, w, c). Mirrors
    synthetic.py::_smooth_noise (bilinear upsampling of uniform coarse grids,
    1/2^o octave weights)."""
    keys = jax.random.split(key, octaves)
    out = jnp.zeros((h, w, c), jnp.float32)
    for o, (gh, gw) in enumerate(_octave_sizes(h, w, octaves)):
        coarse = jax.random.uniform(keys[o], (gh, gw, c), jnp.float32)
        interp = jax.image.resize(coarse, (h, w, c), method="linear")
        out = out + interp / (2.0 ** o)
    return out / sum(1.0 / 2 ** o for o in range(octaves))


def specular_field(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    """Sum of up to MAX_LOBES anisotropic Gaussian lobes, (h, w).

    Same parameter ranges as synthetic.py::_specular_field (amplitude past
    saturation, aspect up to 4, any orientation); the per-scene lobe count
    n ~ U{2..7} is realized by zeroing the amplitudes of lobes >= n, which keeps
    the shape static for vmap/jit.
    """
    ks = jax.random.split(key, 8)
    n = jax.random.randint(ks[0], (), 2, MAX_LOBES + 1)
    cy = jax.random.uniform(ks[1], (MAX_LOBES,), minval=0.1, maxval=0.9) * h
    cx = jax.random.uniform(ks[2], (MAX_LOBES,), minval=0.1, maxval=0.9) * w
    sig_major = jax.random.uniform(ks[3], (MAX_LOBES,), minval=0.025,
                                   maxval=0.11) * min(h, w)
    aspect = jax.random.uniform(ks[4], (MAX_LOBES,), minval=1.0, maxval=4.0)
    sig_minor = jnp.maximum(sig_major / aspect, 0.6)
    theta = jax.random.uniform(ks[5], (MAX_LOBES,), minval=0.0, maxval=jnp.pi)
    amp = jax.random.uniform(ks[6], (MAX_LOBES,), minval=0.7, maxval=2.4)
    amp = amp * (jnp.arange(MAX_LOBES) < n)

    yy, xx = jnp.mgrid[0:h, 0:w]
    yy = yy.astype(jnp.float32)[None]          # (1, h, w)
    xx = xx.astype(jnp.float32)[None]
    ct = jnp.cos(theta)[:, None, None]
    st = jnp.sin(theta)[:, None, None]
    dy = yy - cy[:, None, None]
    dx = xx - cx[:, None, None]
    u = dx * ct + dy * st
    v_ = -dx * st + dy * ct
    lobes = amp[:, None, None] * jnp.exp(
        -(u ** 2 / (2 * sig_major[:, None, None] ** 2)
          + v_ ** 2 / (2 * sig_minor[:, None, None] ** 2)))
    return jnp.sum(lobes, axis=0)


def synth_scene(key: jax.Array, h: int, w: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One scene -> (views (4,h,w,3), diffuse (h,w,3), mask (h,w,1),
    camera (h,w,3)).

    Physical model identical to synthetic.py::synth_polar_scene: shared diffuse
    base, per-view Malus-law gain of a tinted specular field; `camera` is the
    non-polarimetric observation (diffuse + full-strength residue — the
    single-RGB inference input domain, test.py:21-39).
    """
    k_diff, k_spec, k_tint, k_phi, k_pol = jax.random.split(key, 5)
    diffuse = 0.12 + 0.76 * smooth_noise(k_diff, h, w, 3)
    spec = specular_field(k_spec, h, w)
    tint = 1.0 - jax.random.uniform(k_tint, (3,), minval=0.0, maxval=0.12)
    spec_rgb = spec[..., None] * tint
    phi = jax.random.uniform(k_phi, (), minval=0.0, maxval=jnp.pi)
    pol_frac = jax.random.uniform(k_pol, (), minval=0.6, maxval=0.95)

    angles = jnp.asarray(_VIEW_ANGLES_RAD)
    gains = (1 - pol_frac) * 0.5 + pol_frac * jnp.cos(angles - phi) ** 2  # (4,)
    views = jnp.clip(diffuse[None] + spec_rgb[None] * gains[:, None, None, None],
                     0.0, 1.0)
    mask = (spec > 0.25).astype(jnp.float32)[..., None]
    max_gain = jnp.max(gains)
    camera = jnp.clip(diffuse + spec_rgb * max_gain, 0.0, 1.0)
    return views, diffuse, mask, camera


@functools.partial(jax.jit, static_argnames=("batch", "h", "w", "ed_mode",
                                             "camera_swap_prob"))
def synth_views_batch(key: jax.Array, batch: int, h: int, w: int,
                      ed_mode: str = "min",
                      camera_swap_prob: float = 0.0) -> jnp.ndarray:
    """(5, B, h, w, 3) training batch, generated on device.

    ed_mode: "min" — ED is the channel-wise min over the 4 views (the reference's
    estimated-diffuse synthesis, utils.py:68-123); "diffuse" — ED is the scene's
    true diffuse layer (the reference's precomputed --diffuse_dir path,
    main.py:62).

    camera_swap_prob: per-sample probability that one random polarized view is
    replaced by the scene's camera image — the inference-domain augmentation
    (test.py feeds a plain camera RGB, not a polarized view; this puts that
    domain into the channel-dropout curriculum).
    """
    k_scenes, k_swap = jax.random.split(key)
    views, diffuse, _mask, camera = jax.vmap(
        lambda k: synth_scene(k, h, w))(jax.random.split(k_scenes, batch))
    views = jnp.moveaxis(views, 0, 1)                       # (4, B, h, w, 3)
    if camera_swap_prob > 0.0:
        k_u, k_slot = jax.random.split(k_swap)
        do_swap = (jax.random.uniform(k_u, (batch,)) < camera_swap_prob)
        slot = jax.random.randint(k_slot, (batch,), 0, 4)   # which view to replace
        sel = (jnp.arange(4)[:, None] == slot[None, :]) & do_swap[None, :]
        views = jnp.where(sel[..., None, None, None], camera[None], views)
    ed = diffuse if ed_mode == "diffuse" else jnp.min(views, axis=0)
    return jnp.concatenate([views, ed[None]], axis=0)


@functools.partial(jax.jit, static_argnames=("batch", "h", "w"))
def synth_specseg_batch(key: jax.Array, batch: int, h: int, w: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(standardized Y (B,h,w,1), mask (B,h,w,1)) SpecSeg training pairs.

    The GAN consumes SpecSeg on the STANDARDIZED Y channel of a polarized view
    (train/step.py:113-116), and single-image inference on the standardized
    camera Y (infer.py:49-53) — so the mask net trains on a uniform mix of all
    five of those input domains, standardized exactly as the consumers do.
    """
    from shmgan_tpu.ops.color import rgb_to_yuv
    from shmgan_tpu.ops.standardize import per_image_standardization

    rgb, mask = synth_specseg_rgb_batch(key, batch, h, w)
    y = rgb_to_yuv(rgb)[..., 0:1]
    y_std, _ = per_image_standardization(y)
    return y_std, mask


def synth_specseg_rgb_batch(key: jax.Array, batch: int, h: int, w: int
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(RGB (B,h,w,3) in [0,1], mask (B,h,w,1)) — the pre-luma stage of
    synth_specseg_batch, for consumers that need the color image too (the
    chroma-input SpecSeg curriculum computes its prior channel from it)."""
    k_scenes, k_pick = jax.random.split(key)
    views, _diffuse, mask, camera = jax.vmap(
        lambda k: synth_scene(k, h, w))(jax.random.split(k_scenes, batch))
    pool = jnp.concatenate([views, camera[:, None]], axis=1)  # (B, 5, h, w, 3)
    pick = jax.random.randint(k_pick, (batch,), 0, 5)
    rgb = jnp.take_along_axis(pool, pick[:, None, None, None, None], axis=1)[:, 0]
    return rgb, mask


@functools.partial(jax.jit, static_argnames=("n", "h", "w"))
def synth_eval_batch(key: jax.Array, n: int, h: int, w: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Held-out eval triplets on device: (camera inputs (N,h,w,3),
    diffuse GT (N,h,w,3), masks (N,h,w,1)) — the device twin of
    synthetic.py::synth_eval_set; the quality oracle is
    metrics(gen, diffuse) > metrics(camera, diffuse) (test.py:332-366)."""
    _views, diffuse, mask, camera = jax.vmap(
        lambda k: synth_scene(k, h, w))(jax.random.split(key, n))
    return camera, diffuse, mask
