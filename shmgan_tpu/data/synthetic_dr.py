"""Domain-randomized SpecSeg curriculum — closing the real-photo transfer gap.

Round-3 OOD audit (benchmarks/quality_ood, examples/ood_eval.py): the SpecSeg
net trained on the base curriculum (synthetic_jax.py) over-fires on real
photographs — mask IoU vs the reference's own published masks is 0.107, and
the galleries show it labeling entire high-albedo objects (yellow chip bags,
bright wood) as specular. Root cause: in the base curriculum every bright
region IS specular (diffuse tops out at ~0.88 mid-tones), so the net learns a
brightness threshold instead of the statistics that actually distinguish a
highlight in a photograph (reference README.md:61-62; its SpecSeg was trained
on real annotated data, specsegv3_chkpt.h5, absent from this deployment).

This module keeps the base physical model but randomizes exactly the axes
whose absence caused the shortcut:

  * bright-but-DIFFUSE distractors, labeled 0: large soft regions screen-
    blended toward white. Texture edges survive inside them (a printed bag
    stays a printed bag) — the cue that separates high albedo from a
    highlight, which ADDS light and washes texture out to clipping.
  * four texture families (multi-octave value noise, Voronoi flats, stripes,
    linear gradients) instead of one, so texture statistics carry no label
    information.
  * speculars with randomized edge profiles: per-lobe super-Gaussian exponent
    p ~ U[1,6] (soft lobes through hard plateaus), aspect up to 6 (elongated
    bar glints), optional bloom skirt, amplitudes that CLIP — real photo
    highlights are saturated.
  * photometric randomization: exposure, gamma, vignette, additive sensor
    noise — none of which may move the label.

Labels keep the base semantics (mask = spec_field > 0.25) so the IoU metric
is comparable across curricula. Everything is shape-static and jit/vmap-safe
(lax.switch over texture families, fixed MAX_* counts with amplitude
masking), generated on device like the base stream (see synthetic_jax.py for
why host feeding is not an option on this deployment).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from shmgan_tpu.data.synthetic_jax import smooth_noise, synth_specseg_batch

MAX_LOBES = 7        # same ceiling as the base curriculum
MAX_DISTRACTORS = 3  # bright diffuse regions per scene (0..3 active)
N_VORONOI = 16       # static cell count; inactive cells get duplicate seeds

# ---------------------------------------------------------------------------
# Texture families (h, w, 3) in [0, 1] — label-free by construction
# ---------------------------------------------------------------------------


def _tex_value_noise(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    """Base-curriculum texture, but spanning a wider albedo range (to ~0.95)."""
    k_n, k_lo, k_hi = jax.random.split(key, 3)
    lo = jax.random.uniform(k_lo, (), minval=0.02, maxval=0.25)
    hi = jax.random.uniform(k_hi, (), minval=0.6, maxval=0.97)
    return lo + (hi - lo) * smooth_noise(k_n, h, w, 3)


def _tex_voronoi(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    """Piecewise-flat colored cells (static N_VORONOI seeds)."""
    k_y, k_x, k_c = jax.random.split(key, 3)
    cy = jax.random.uniform(k_y, (N_VORONOI,), minval=0.0, maxval=1.0) * h
    cx = jax.random.uniform(k_x, (N_VORONOI,), minval=0.0, maxval=1.0) * w
    colors = jax.random.uniform(k_c, (N_VORONOI, 3), minval=0.05, maxval=0.95)
    yy, xx = jnp.mgrid[0:h, 0:w]
    d2 = ((yy.astype(jnp.float32)[..., None] - cy) ** 2
          + (xx.astype(jnp.float32)[..., None] - cx) ** 2)   # (h, w, N)
    return colors[jnp.argmin(d2, axis=-1)]


def _tex_stripes(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    k_t, k_p, k_c0, k_c1 = jax.random.split(key, 4)
    theta = jax.random.uniform(k_t, (), minval=0.0, maxval=jnp.pi)
    period = jax.random.uniform(k_p, (), minval=0.08, maxval=0.35) * min(h, w)
    c0 = jax.random.uniform(k_c0, (3,), minval=0.05, maxval=0.92)
    c1 = jax.random.uniform(k_c1, (3,), minval=0.05, maxval=0.92)
    yy, xx = jnp.mgrid[0:h, 0:w]
    phase = (xx * jnp.cos(theta) + yy * jnp.sin(theta)) / period
    t = (jnp.sin(2 * jnp.pi * phase) > 0).astype(jnp.float32)[..., None]
    return c0 * t + c1 * (1.0 - t)


def _tex_gradient(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    k_t, k_c0, k_c1 = jax.random.split(key, 3)
    theta = jax.random.uniform(k_t, (), minval=0.0, maxval=2 * jnp.pi)
    c0 = jax.random.uniform(k_c0, (3,), minval=0.03, maxval=0.95)
    c1 = jax.random.uniform(k_c1, (3,), minval=0.03, maxval=0.95)
    yy, xx = jnp.mgrid[0:h, 0:w]
    proj = (xx * jnp.cos(theta) + yy * jnp.sin(theta)).astype(jnp.float32)
    t = ((proj - proj.min()) / jnp.maximum(proj.max() - proj.min(), 1e-6))
    return (c0 + t[..., None] * (c1 - c0))


def _tex_spectrum(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    """1/f^alpha power-spectrum texture — the natural-image statistic
    (round-5 dr3 curriculum, VERDICT r4 next #4).

    Real photographs have amplitude spectra ~ |f|^-alpha with alpha ~= 1.0-1.4
    (Ruderman/Field natural-image statistics); every existing family (value
    noise, Voronoi flats, stripes, gradients) is spectrally far from that, and
    SpecSeg's residual real-photo false fires sit exactly on texture
    statistics it never saw. Shaped in the frequency domain: white noise
    filtered by f^-alpha, min-max normalized, then mapped through a random
    two-color ramp (real photos have strongly correlated RGB channels)."""
    k_n, k_a, k_c0, k_c1 = jax.random.split(key, 4)
    alpha = jax.random.uniform(k_a, (), minval=0.8, maxval=1.8)
    white = jax.random.normal(k_n, (h, w))
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.rfftfreq(w)[None, :]
    f = jnp.sqrt(fy * fy + fx * fx)
    amp = jnp.maximum(f, 1.0 / max(h, w)) ** (-alpha)
    tex = jnp.fft.irfft2(jnp.fft.rfft2(white) * amp, s=(h, w))
    lo, hi = jnp.min(tex), jnp.max(tex)
    t = (tex - lo) / jnp.maximum(hi - lo, 1e-6)
    c0 = jax.random.uniform(k_c0, (3,), minval=0.02, maxval=0.55)
    c1 = jax.random.uniform(k_c1, (3,), minval=0.4, maxval=0.97)
    return c0 + t[..., None] * (c1 - c0)


def _tex_photo(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    """Photo-statistics composite: a 1/f background with a second region
    carrying a DIFFERENT texture family behind an object-like soft boundary
    (smooth-noise level set). Real photos are piecewise: distinct objects
    with their own statistics meeting at edges — a cue no single-family
    texture provides."""
    k_bg, k_fg, k_pick, k_m, k_lv = jax.random.split(key, 5)
    bg = _tex_spectrum(k_bg, h, w)
    idx = jax.random.randint(k_pick, (), 0, 4)
    fg = jax.lax.switch(idx, [
        lambda k: _tex_value_noise(k, h, w),
        lambda k: _tex_voronoi(k, h, w),
        lambda k: _tex_stripes(k, h, w),
        lambda k: _tex_spectrum(k, h, w),
    ], k_fg)
    level = jax.random.uniform(k_lv, (), minval=0.35, maxval=0.65)
    m = jax.nn.sigmoid((smooth_noise(k_m, h, w, 1)[..., 0] - level) * 24.0)
    return bg * (1.0 - m[..., None]) + fg * m[..., None]


def _texture(key: jax.Array, h: int, w: int,
             photo: bool = False) -> jnp.ndarray:
    k_pick, k_tex = jax.random.split(key)
    if photo:
        # dr3: half the scenes get the photo-statistics composite, the rest
        # draw uniformly from the four dr families (coverage keeps the dr/dr2
        # regimes in-distribution)
        idx = jax.random.randint(k_pick, (), 0, 8)
        return jax.lax.switch(jnp.minimum(idx, 4), [
            lambda k: _tex_value_noise(k, h, w),
            lambda k: _tex_voronoi(k, h, w),
            lambda k: _tex_stripes(k, h, w),
            lambda k: _tex_gradient(k, h, w),
            lambda k: _tex_photo(k, h, w),
        ], k_tex)
    idx = jax.random.randint(k_pick, (), 0, 4)
    return jax.lax.switch(idx, [
        lambda k: _tex_value_noise(k, h, w),
        lambda k: _tex_voronoi(k, h, w),
        lambda k: _tex_stripes(k, h, w),
        lambda k: _tex_gradient(k, h, w),
    ], k_tex)


# ---------------------------------------------------------------------------
# Bright diffuse distractors (label 0) and DR specular field (label 1)
# ---------------------------------------------------------------------------


def _soft_regions(key: jax.Array, h: int, w: int, n_max: int,
                  sig_lo: float, sig_hi: float, p_lo: float, p_hi: float,
                  n_active: jax.Array) -> jnp.ndarray:
    """(n_max, h, w) super-Gaussian region weights in [0,1]; rows >= n_active
    are zeroed (static-shape analogue of a variable count)."""
    ks = jax.random.split(key, 6)
    cy = jax.random.uniform(ks[0], (n_max,), minval=0.05, maxval=0.95) * h
    cx = jax.random.uniform(ks[1], (n_max,), minval=0.05, maxval=0.95) * w
    sig_a = jax.random.uniform(ks[2], (n_max,), minval=sig_lo,
                               maxval=sig_hi) * min(h, w)
    aspect = jax.random.uniform(ks[3], (n_max,), minval=1.0, maxval=6.0)
    sig_b = jnp.maximum(sig_a / aspect, 0.6)
    theta = jax.random.uniform(ks[4], (n_max,), minval=0.0, maxval=jnp.pi)
    p = jax.random.uniform(ks[5], (n_max,), minval=p_lo, maxval=p_hi)

    yy, xx = jnp.mgrid[0:h, 0:w]
    yy = yy.astype(jnp.float32)[None]
    xx = xx.astype(jnp.float32)[None]
    ct = jnp.cos(theta)[:, None, None]
    st = jnp.sin(theta)[:, None, None]
    dy = yy - cy[:, None, None]
    dx = xx - cx[:, None, None]
    u = dx * ct + dy * st
    v = -dx * st + dy * ct
    r = (u / sig_a[:, None, None]) ** 2 + (v / sig_b[:, None, None]) ** 2
    regions = jnp.exp(-0.5 * r ** (p[:, None, None] / 2.0))
    active = (jnp.arange(n_max) < n_active)[:, None, None]
    return regions * active


def specular_field_dr(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    """Randomized-edge-profile specular field (h, w).

    Differences from synthetic_jax.specular_field: per-lobe super-Gaussian
    exponent (soft Gaussian .. hard plateau), aspect up to 6, amplitudes up
    to 3 (the composited camera CLIPS — saturated cores like photo
    highlights), and an optional exponent-1 bloom skirt at 3x the radius.
    """
    k_n, k_reg, k_amp, k_bloom = jax.random.split(key, 4)
    n = jax.random.randint(k_n, (), 1, MAX_LOBES + 1)
    regions = _soft_regions(k_reg, h, w, MAX_LOBES,
                            sig_lo=0.015, sig_hi=0.11, p_lo=1.0, p_hi=6.0,
                            n_active=n)
    amp = jax.random.uniform(k_amp, (MAX_LOBES,), minval=0.6, maxval=3.0)
    bloom = jax.random.uniform(k_bloom, (MAX_LOBES,), minval=0.0, maxval=0.18)
    # bloom skirt: a wide soft halo around the same center. regions**(1/9)
    # rescales the super-Gaussian argument by 9 => ~3x the radius, and pushes
    # the profile toward exponent-1 softness regardless of the core's p.
    skirt = regions ** (1.0 / 9.0)
    field = (amp[:, None, None] * regions
             + (amp * bloom)[:, None, None] * skirt)
    return jnp.sum(field, axis=0)


MAX_GLINTS = 56      # dr2: micro-glint ceiling per scene
N_GLINT_CLUSTERS = 4  # glints ride object surfaces in groups, not uniformly


def glint_field(key: jax.Array, h: int, w: int) -> jnp.ndarray:
    """Dense micro-glint specular layer (h, w) — the dr2 addition.

    Motivation (measured, benchmarks/quality_r3_dr/mask_ab.json + component
    audit of the reference figure's own masks): real photographs carry
    30-108 CONNECTED COMPONENTS of specularity per image, mostly tiny
    (1-80 px at 128px) — glitter on fruit skin, wet-surface sparkle, edge
    glints. The dr curriculum tops out at MAX_LOBES=7 lobes, so a net
    trained on it learns that highlights are few and large; its photo
    recall is 0.34. This layer adds up to MAX_GLINTS tiny anisotropic
    super-Gaussian spots, CLUSTERED around N_GLINT_CLUSTERS centers with
    per-cluster spread (uniform scatter would be the wrong prior: glints
    group on objects).
    """
    ks = jax.random.split(key, 11)
    n = jax.random.randint(ks[0], (), 0, MAX_GLINTS + 1)
    ccy = jax.random.uniform(ks[1], (N_GLINT_CLUSTERS,), minval=0.08,
                             maxval=0.92) * h
    ccx = jax.random.uniform(ks[2], (N_GLINT_CLUSTERS,), minval=0.08,
                             maxval=0.92) * w
    spread = jax.random.uniform(ks[3], (N_GLINT_CLUSTERS,), minval=0.04,
                                maxval=0.30) * min(h, w)
    assign = jax.random.randint(ks[4], (MAX_GLINTS,), 0, N_GLINT_CLUSTERS)
    offs = jax.random.normal(ks[5], (MAX_GLINTS, 2))
    cy = jnp.clip(ccy[assign] + offs[:, 0] * spread[assign], 1.0, h - 2.0)
    cx = jnp.clip(ccx[assign] + offs[:, 1] * spread[assign], 1.0, w - 2.0)

    # tiny cores: sigma 0.6..3 px regardless of image size (a glint is a
    # sensor-scale event), mild elongation, hard-ish edges, clipping amps
    sig_a = jax.random.uniform(ks[6], (MAX_GLINTS,), minval=0.6, maxval=3.0)
    aspect = jax.random.uniform(ks[7], (MAX_GLINTS,), minval=1.0, maxval=4.0)
    sig_b = jnp.maximum(sig_a / aspect, 0.45)
    theta = jax.random.uniform(ks[8], (MAX_GLINTS,), minval=0.0, maxval=jnp.pi)
    p = jax.random.uniform(ks[9], (MAX_GLINTS,), minval=1.5, maxval=5.0)
    amp = jax.random.uniform(ks[10], (MAX_GLINTS,), minval=0.55, maxval=2.6)

    yy, xx = jnp.mgrid[0:h, 0:w]
    yy = yy.astype(jnp.float32)[None]
    xx = xx.astype(jnp.float32)[None]
    ct = jnp.cos(theta)[:, None, None]
    st = jnp.sin(theta)[:, None, None]
    dy = yy - cy[:, None, None]
    dx = xx - cx[:, None, None]
    u = dx * ct + dy * st
    v = -dx * st + dy * ct
    r = (u / sig_a[:, None, None]) ** 2 + (v / sig_b[:, None, None]) ** 2
    spots = jnp.exp(-0.5 * r ** (p[:, None, None] / 2.0))
    active = (jnp.arange(MAX_GLINTS) < n)[:, None, None]
    return jnp.sum(spots * active * amp[:, None, None], axis=0)


def _scene_dr_parts(key: jax.Array, h: int, w: int, glints: bool,
                    photo: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                               jnp.ndarray, jax.Array]:
    """The DR scene's physical layers, pre-composite: (diffuse (h,w,3),
    spec (h,w), tint (3,), noise_sigma (), noise_key).

    Shared by the camera composite (synth_scene_dr — the SpecSeg curriculum)
    and the polarimetric view-stack builder (synth_scene_views_dr — the GAN
    curriculum). The 12-way key split is kept IDENTICAL to the original
    synth_scene_dr so round-3 artifacts and goldens reproduce bit-for-bit.
    photo=True (dr3) swaps in the photo-statistics texture distribution
    (1/f^alpha spectra + object-boundary composites) — everything downstream
    (distractors, speculars, photometrics, labels) is unchanged.
    """
    (k_tex, k_nd, k_dreg, k_ds, k_spec, k_tint, k_exp, k_gam, k_vig,
     k_nsig, k_noise, k_glint) = jax.random.split(key, 12)

    base = _texture(k_tex, h, w, photo=photo)

    # bright diffuse distractors: screen-blend toward white. Texture detail
    # survives inside (darker texels stay relatively darker) — the
    # anti-shortcut signal this curriculum exists for.
    n_d = jax.random.randint(k_nd, (), 0, MAX_DISTRACTORS + 1)
    dreg = _soft_regions(k_dreg, h, w, MAX_DISTRACTORS,
                         sig_lo=0.12, sig_hi=0.45, p_lo=1.0, p_hi=4.0,
                         n_active=n_d)
    strength = jax.random.uniform(k_ds, (MAX_DISTRACTORS,),
                                  minval=0.45, maxval=0.9)
    v = jnp.clip(jnp.sum(dreg * strength[:, None, None], axis=0), 0.0, 0.95)
    base = 1.0 - (1.0 - base) * (1.0 - v[..., None])

    # photometrics on the DIFFUSE scene (exposure/gamma/vignette), then the
    # ADDITIVE specular, then sensor noise on the composite.
    exposure = jax.random.uniform(k_exp, (), minval=0.75, maxval=1.15)
    gamma = jax.random.uniform(k_gam, (), minval=0.75, maxval=1.4)
    yy, xx = jnp.mgrid[0:h, 0:w]
    r2 = (((yy / h - 0.5) ** 2 + (xx / w - 0.5) ** 2) / 0.5).astype(jnp.float32)
    vig = 1.0 - jax.random.uniform(k_vig, (), minval=0.0, maxval=0.35) * r2
    diffuse = jnp.clip(base * exposure * vig[..., None], 0.0, 1.0) ** gamma

    spec = specular_field_dr(k_spec, h, w)
    if glints:  # dr2: overlay the dense micro-glint layer (static flag)
        spec = spec + glint_field(k_glint, h, w)
    tint = 1.0 - jax.random.uniform(k_tint, (3,), minval=0.0, maxval=0.08)
    nsig = jax.random.uniform(k_nsig, (), minval=0.0, maxval=0.02)
    return diffuse, spec, tint, nsig, k_noise


def synth_scene_dr(key: jax.Array, h: int, w: int, glints: bool = False,
                   photo: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DR scene -> (camera (h,w,3) in [0,1], mask (h,w,1)).

    camera = clip(photometrics(texture + bright distractors) + specular);
    the label is the specular field alone — distractors and photometric
    randomization must not move it.
    """
    diffuse, spec, tint, nsig, k_noise = _scene_dr_parts(key, h, w, glints,
                                                         photo=photo)
    camera = diffuse + spec[..., None] * tint
    camera = camera + nsig * jax.random.normal(k_noise, camera.shape)
    camera = jnp.clip(camera, 0.0, 1.0)

    mask = (spec > 0.25).astype(jnp.float32)[..., None]
    return camera, mask


def synth_scene_views_dr(key: jax.Array, h: int, w: int, glints: bool = True
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray]:
    """One DR scene as a POLARIMETRIC stack -> (views (4,h,w,3), diffuse
    (h,w,3), mask (h,w,1), camera (h,w,3)) — the GAN-phase DR curriculum
    (VERDICT r3 next #4).

    Same physical model as the base synth_scene (shared diffuse, per-view
    Malus-law gains on a tinted additive specular — synthetic_jax.py:93-118,
    reference utils.py:68-123) but with the DR scene statistics that fixed
    SpecSeg's real-photo transfer: texture families, bright-but-diffuse
    distractors, photometric randomization, super-Gaussian/plateau/glint
    speculars. The generator trained on the base curriculum alone damages
    non-specular photo content (outside-mask PSNR 18.9 dB uncomposited,
    benchmarks/quality_ood) because it never saw bright diffuse regions it
    must PRESERVE; these scenes make preservation part of the loss.

    Per-view sensor noise is drawn independently per view (a polarization
    camera reads four sensor quadrants), so ED=min inherits realistic noise
    floors instead of a single shared realization.
    """
    diffuse, spec, tint, nsig, k_noise = _scene_dr_parts(key, h, w, glints)
    k_phi, k_pol = jax.random.split(jax.random.fold_in(key, 7))
    phi = jax.random.uniform(k_phi, (), minval=0.0, maxval=jnp.pi)
    pol_frac = jax.random.uniform(k_pol, (), minval=0.6, maxval=0.95)

    from shmgan_tpu.data.synthetic_jax import _VIEW_ANGLES_RAD
    angles = jnp.asarray(_VIEW_ANGLES_RAD)
    gains = (1 - pol_frac) * 0.5 + pol_frac * jnp.cos(angles - phi) ** 2
    spec_rgb = spec[..., None] * tint
    views = diffuse[None] + spec_rgb[None] * gains[:, None, None, None]
    views = views + nsig * jax.random.normal(k_noise, views.shape)
    views = jnp.clip(views, 0.0, 1.0)

    camera = diffuse + spec_rgb * jnp.max(gains)
    camera = camera + nsig * jax.random.normal(
        jax.random.fold_in(k_noise, 1), camera.shape)
    camera = jnp.clip(camera, 0.0, 1.0)

    mask = (spec > 0.25).astype(jnp.float32)[..., None]
    return views, diffuse, mask, camera


@functools.partial(jax.jit, static_argnames=("batch", "h", "w", "ed_mode",
                                             "camera_swap_prob", "base_mix",
                                             "glints"))
def synth_views_batch_dr(key: jax.Array, batch: int, h: int, w: int,
                         ed_mode: str = "min",
                         camera_swap_prob: float = 0.0,
                         base_mix: float = 0.5,
                         glints: bool = True) -> jnp.ndarray:
    """(5, B, h, w, 3) GAN training batch mixing base and DR scene statistics.

    floor(batch * base_mix) samples come from the base curriculum
    (synthetic_jax.synth_views_batch — keeps the proven in-distribution
    regime), the rest are DR polarimetric stacks (synth_scene_views_dr).
    ed_mode/camera_swap_prob apply to both halves exactly as in the base
    batch builder.
    """
    from shmgan_tpu.data.synthetic_jax import synth_views_batch

    n_base = int(batch * base_mix)
    n_dr = batch - n_base
    k_base, k_dr, k_swap = jax.random.split(key, 3)

    parts = []
    if n_base > 0:
        parts.append(synth_views_batch(k_base, n_base, h, w, ed_mode=ed_mode,
                                       camera_swap_prob=camera_swap_prob))
    if n_dr > 0:
        views, diffuse, _mask, camera = jax.vmap(
            lambda k: synth_scene_views_dr(k, h, w, glints=glints))(
            jax.random.split(k_dr, n_dr))
        views = jnp.moveaxis(views, 0, 1)                   # (4, B, h, w, 3)
        if camera_swap_prob > 0.0:
            k_u, k_slot = jax.random.split(k_swap)
            do_swap = (jax.random.uniform(k_u, (n_dr,)) < camera_swap_prob)
            slot = jax.random.randint(k_slot, (n_dr,), 0, 4)
            sel = (jnp.arange(4)[:, None] == slot[None, :]) & do_swap[None, :]
            views = jnp.where(sel[..., None, None, None], camera[None], views)
        ed = diffuse if ed_mode == "diffuse" else jnp.min(views, axis=0)
        parts.append(jnp.concatenate([views, ed[None]], axis=0))
    return jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("batch", "h", "w", "base_mix", "glints",
                                    "photo"))
def synth_specseg_batch_dr(key: jax.Array, batch: int, h: int, w: int,
                           base_mix: float = 0.5, glints: bool = False,
                           photo: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(standardized Y (B,h,w,1), mask (B,h,w,1)) mixing both curricula.

    floor(batch * base_mix) samples come from the base curriculum's 5-domain
    pick (synthetic_jax.synth_specseg_batch — keeps the GAN's own training
    domains covered so the in-graph train step sees no regression), the rest
    from DR camera scenes standardized identically (the single-RGB photo
    inference domain, reference test.py:21-39). glints=True is the dr2
    curriculum: DR scenes additionally carry the dense micro-glint layer.
    """
    from shmgan_tpu.ops.color import rgb_to_yuv
    from shmgan_tpu.ops.standardize import per_image_standardization

    n_base = int(batch * base_mix)
    n_dr = batch - n_base
    k_base, k_dr = jax.random.split(key)

    parts_y, parts_m = [], []
    if n_base > 0:
        y_b, m_b = synth_specseg_batch(k_base, n_base, h, w)
        parts_y.append(y_b)
        parts_m.append(m_b)
    if n_dr > 0:
        cam, m_d = jax.vmap(lambda k: synth_scene_dr(k, h, w, glints=glints,
                                                     photo=photo))(
            jax.random.split(k_dr, n_dr))
        y = rgb_to_yuv(cam)[..., 0:1]
        y_std, _ = per_image_standardization(y)
        parts_y.append(y_std)
        parts_m.append(m_d)
    return jnp.concatenate(parts_y), jnp.concatenate(parts_m)


@functools.partial(jax.jit,
                   static_argnames=("batch", "h", "w", "base_mix", "glints",
                                    "photo"))
def synth_specseg_batch_dr_chroma(key: jax.Array, batch: int, h: int, w: int,
                                  base_mix: float = 0.5, glints: bool = False,
                                  photo: bool = False
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """((B,h,w,2) [standardized Y | chroma prior], mask (B,h,w,1)).

    The chroma-input curriculum (cfg.model.specseg_in_channels == 2): same
    scene mix as synth_specseg_batch_dr, but each sample keeps its RGB long
    enough to compute ops/specprior.chroma_prior as a second input channel —
    exactly what the inference surfaces feed a 2-channel net
    (infer.py::make_mask_fn / make_infer_fn via specseg_net_input). DR scenes
    carry tinted additive highlights over colored textures, so the channel is
    informative, not constant; base-curriculum picks go through the same
    function for train/serve consistency.
    """
    from shmgan_tpu.data.synthetic_jax import synth_specseg_rgb_batch
    from shmgan_tpu.ops.color import rgb_to_yuv
    from shmgan_tpu.ops.specprior import specseg_net_input
    from shmgan_tpu.ops.standardize import per_image_standardization

    n_base = int(batch * base_mix)
    n_dr = batch - n_base
    k_base, k_dr = jax.random.split(key)

    parts_rgb, parts_m = [], []
    if n_base > 0:
        rgb_b, m_b = synth_specseg_rgb_batch(k_base, n_base, h, w)
        parts_rgb.append(rgb_b)
        parts_m.append(m_b)
    if n_dr > 0:
        cam, m_d = jax.vmap(lambda k: synth_scene_dr(k, h, w, glints=glints,
                                                     photo=photo))(
            jax.random.split(k_dr, n_dr))
        parts_rgb.append(cam)
        parts_m.append(m_d)
    rgb = jnp.concatenate(parts_rgb)
    y_std, _ = per_image_standardization(rgb_to_yuv(rgb)[..., 0:1])
    return specseg_net_input(y_std, rgb, 2), jnp.concatenate(parts_m)
