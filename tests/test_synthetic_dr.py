"""Domain-randomized SpecSeg curriculum (data/synthetic_dr.py).

The DR stream exists to kill the brightness-threshold shortcut the base
curriculum taught (real-photo mask IoU 0.107, benchmarks/quality_ood) — these
tests pin the properties that give it that power: bright-but-diffuse
distractors labeled 0, saturated specular cores labeled 1, label invariance
to photometrics, and the standardized-Y contract shared with every SpecSeg
consumer (train/step.py, infer.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.data.synthetic_dr import (glint_field, specular_field_dr,
                                          synth_scene_dr,
                                          synth_specseg_batch_dr)

H = W = 32


def test_scene_shapes_ranges():
    cam, mask = synth_scene_dr(jax.random.PRNGKey(0), H, W)
    assert cam.shape == (H, W, 3) and mask.shape == (H, W, 1)
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0
    assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}


def test_scene_deterministic_per_key():
    k = jax.random.PRNGKey(7)
    a = synth_scene_dr(k, H, W)
    b = synth_scene_dr(k, H, W)
    assert jnp.array_equal(a[0], b[0]) and jnp.array_equal(a[1], b[1])
    c = synth_scene_dr(jax.random.PRNGKey(8), H, W)
    assert not jnp.array_equal(a[0], c[0])


def test_mask_matches_spec_threshold():
    # the label is the specular field alone — recompute it from the same key
    # split synth_scene_dr uses and check the threshold semantics survive the
    # scene compositing untouched.
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 12)
    spec = specular_field_dr(ks[4], H, W)
    _, mask = synth_scene_dr(key, H, W)
    expect = (spec > 0.25).astype(jnp.float32)[..., None]
    assert jnp.array_equal(mask, expect)


def test_glint_mask_matches_threshold():
    # dr2 label = (lobes + glints) > 0.25, same semantics, same key split
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 12)
    spec = specular_field_dr(ks[4], H, W) + glint_field(ks[11], H, W)
    _, mask = synth_scene_dr(key, H, W, glints=True)
    expect = (spec > 0.25).astype(jnp.float32)[..., None]
    assert jnp.array_equal(mask, expect)


def _n_components(mask_hw: np.ndarray) -> int:
    """4-connected component count (tiny pure-python flood fill)."""
    from collections import deque
    seen = np.zeros_like(mask_hw, bool)
    n = 0
    hh, ww = mask_hw.shape
    for y in range(hh):
        for x in range(ww):
            if mask_hw[y, x] > 0 and not seen[y, x]:
                n += 1
                q = deque([(y, x)])
                seen[y, x] = True
                while q:
                    cy, cx = q.popleft()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = cy + dy, cx + dx
                        if (0 <= ny < hh and 0 <= nx < ww
                                and mask_hw[ny, nx] > 0 and not seen[ny, nx]):
                            seen[ny, nx] = True
                            q.append((ny, nx))
    return n


def test_glint_scenes_carry_many_mask_components():
    # The dr2 raison d'etre: reference-figure photo masks have 30-108
    # connected components; dr scenes top out at MAX_LOBES=7. dr2 scenes
    # must be able to exceed that by a wide margin.
    big = 64
    keys = jax.random.split(jax.random.PRNGKey(21), 12)
    counts = []
    for k in keys:
        _, m = synth_scene_dr(k, big, big, glints=True)
        counts.append(_n_components(np.asarray(m[..., 0])))
    assert max(counts) > 15, f"component counts {counts}"
    # and the glint layer must not flip label sparsity
    _, masks = jax.vmap(lambda k: synth_scene_dr(k, big, big, glints=True))(
        keys)
    assert float(masks.mean()) < 0.35


def test_dr2_batch_contract():
    y, m = synth_specseg_batch_dr(jax.random.PRNGKey(2), 6, H, W,
                                  base_mix=0.5, glints=True)
    assert y.shape == (6, H, W, 1) and m.shape == (6, H, W, 1)
    # glints=False and glints=True must differ on the DR half of the batch
    y0, _ = synth_specseg_batch_dr(jax.random.PRNGKey(2), 6, H, W,
                                   base_mix=0.5, glints=False)
    assert not jnp.allclose(y, y0)


def test_masks_are_sparse_not_brightness_thresholds():
    # Aggregate over scenes: specular pixels must stay a minority even though
    # bright (>0.7 luma) pixels are common — i.e. "bright" must NOT imply
    # "masked". This is the anti-shortcut property.
    keys = jax.random.split(jax.random.PRNGKey(11), 32)
    cams, masks = jax.vmap(lambda k: synth_scene_dr(k, H, W))(keys)
    luma = cams.mean(-1)
    bright = float((luma > 0.7).mean())
    masked = float(masks.mean())
    assert masked < 0.35, f"mask fraction {masked} — speculars must be sparse"
    assert bright > masked, (
        f"bright fraction {bright} <= mask fraction {masked}: no "
        f"bright-but-diffuse signal in the curriculum")
    # and bright-but-unmasked pixels must actually exist in quantity
    bright_unmasked = float(((luma > 0.7) & (masks[..., 0] < 0.5)).mean())
    assert bright_unmasked > 0.02


def test_specular_field_saturates():
    # some lobes must exceed 1.0 pre-clip (photo highlights are blown)
    fields = jax.vmap(lambda k: specular_field_dr(k, H, W))(
        jax.random.split(jax.random.PRNGKey(5), 16))
    assert float(fields.max()) > 1.0


def test_batch_mix_contract():
    y, m = synth_specseg_batch_dr(jax.random.PRNGKey(0), 8, H, W,
                                  base_mix=0.5)
    assert y.shape == (8, H, W, 1) and m.shape == (8, H, W, 1)
    assert y.dtype == jnp.float32
    # standardized-Y contract: per-image scale applied => unit-ish magnitude,
    # never the raw [0,1] domain for every sample
    assert float(jnp.abs(y).max()) > 1.0


@pytest.mark.parametrize("base_mix", [0.0, 1.0])
def test_batch_mix_extremes(base_mix):
    y, m = synth_specseg_batch_dr(jax.random.PRNGKey(1), 4, H, W,
                                  base_mix=base_mix)
    assert y.shape == (4, H, W, 1) and m.shape == (4, H, W, 1)


def test_pure_base_mix_equals_base_batch():
    from shmgan_tpu.data.synthetic_jax import synth_specseg_batch
    k = jax.random.PRNGKey(9)
    y_dr, m_dr = synth_specseg_batch_dr(k, 4, H, W, base_mix=1.0)
    k_base, _ = jax.random.split(k)
    y_b, m_b = synth_specseg_batch(k_base, 4, H, W)
    assert jnp.allclose(y_dr, y_b) and jnp.array_equal(m_dr, m_b)


# ---------------------------------------------------------------------------
# GAN-phase DR curriculum (VERDICT r3 next #4)
# ---------------------------------------------------------------------------

def test_views_scene_dr_contract():
    from shmgan_tpu.data.synthetic_dr import synth_scene_views_dr
    views, diffuse, mask, camera = synth_scene_views_dr(
        jax.random.PRNGKey(3), H, W)
    assert views.shape == (4, H, W, 3)
    assert diffuse.shape == (H, W, 3) and camera.shape == (H, W, 3)
    assert mask.shape == (H, W, 1)
    for x in (views, diffuse, camera):
        assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    # Malus-law modulation: the four views DIFFER inside the specular region
    spread = (views.max(0) - views.min(0)) * mask
    assert float(spread.max()) > 0.05


def test_views_scene_dr_preserves_base_scene_reproducibility():
    """The _scene_dr_parts refactor must keep synth_scene_dr bit-identical:
    the camera composite equals what the pre-refactor 12-way key split
    produced (pinned by the scene-determinism + mask tests above), and the
    views builder's diffuse layer matches the camera's non-specular pixels."""
    from shmgan_tpu.data.synthetic_dr import (synth_scene_dr,
                                              synth_scene_views_dr)
    k = jax.random.PRNGKey(11)
    cam, mask = synth_scene_dr(k, H, W, glints=True)
    views, diffuse, mask_v, _camera = synth_scene_views_dr(k, H, W,
                                                           glints=True)
    assert jnp.array_equal(mask, mask_v)  # same spec field => same label
    # outside the mask (and its additive skirt), camera ~= diffuse + noise
    outside = (mask_v[..., 0] == 0.0)
    diff = jnp.abs(cam - diffuse).max(-1) * outside
    assert float(jnp.median(diff[outside])) < 0.3


def test_views_batch_dr_shapes_and_mix():
    from shmgan_tpu.data.synthetic_dr import synth_views_batch_dr
    out = synth_views_batch_dr(jax.random.PRNGKey(5), 4, H, W, base_mix=0.5)
    assert out.shape == (5, 4, H, W, 3)
    assert out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_views_batch_dr_ed_is_min_over_views():
    from shmgan_tpu.data.synthetic_dr import synth_views_batch_dr
    out = synth_views_batch_dr(jax.random.PRNGKey(6), 4, H, W, base_mix=0.0,
                               ed_mode="min")
    assert jnp.allclose(out[4], jnp.min(out[:4], axis=0))


def test_views_batch_dr_pure_base_equals_base_builder():
    from shmgan_tpu.data.synthetic_dr import synth_views_batch_dr
    from shmgan_tpu.data.synthetic_jax import synth_views_batch
    k = jax.random.PRNGKey(7)
    out_dr = synth_views_batch_dr(k, 4, H, W, base_mix=1.0)
    k_base = jax.random.split(k, 3)[0]
    out_b = synth_views_batch(k_base, 4, H, W)
    assert jnp.allclose(out_dr, out_b)


def test_views_batch_dr_feeds_train_step():
    """The DR batch is a drop-in for the fused train step (the whole point)."""
    import dataclasses
    from shmgan_tpu.config import Config
    from shmgan_tpu.data.synthetic_dr import synth_views_batch_dr
    from shmgan_tpu.train.state import create_train_state
    from shmgan_tpu.train.step import make_train_step
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    cfg.train = dataclasses.replace(cfg.train, batch_size=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    views = synth_views_batch_dr(jax.random.PRNGKey(1), 2, 32, 32,
                                 base_mix=0.5)
    step = jax.jit(make_train_step(cfg))
    state2, m = step(state, views, jax.random.PRNGKey(2),
                     jnp.zeros((), jnp.int32))
    assert np.isfinite(float(m["total_G"]))
    assert np.isfinite(float(m["total_D"]))


class TestPhotoStatisticsCurriculum:
    """dr3 (round 5, VERDICT r4 next #4): 1/f^alpha power-spectrum textures +
    object-boundary composites — the natural-image statistics the residual
    real-photo false fires sit on."""

    def test_spectrum_texture_shape_range(self):
        from shmgan_tpu.data.synthetic_dr import _tex_spectrum
        tex = _tex_spectrum(jax.random.PRNGKey(3), H, W)
        assert tex.shape == (H, W, 3)
        assert float(tex.min()) >= 0.0 and float(tex.max()) <= 1.0

    def test_spectrum_texture_is_spectrally_red(self):
        """The amplitude spectrum must fall with frequency (alpha > 0): the
        low-frequency half-band carries far more energy than the high one —
        the defining natural-image property no other family has."""
        from shmgan_tpu.data.synthetic_dr import _tex_spectrum
        tex = np.asarray(_tex_spectrum(jax.random.PRNGKey(7), 64, 64))
        g = tex.mean(axis=-1) - tex.mean()
        spec = np.abs(np.fft.rfft2(g))
        fy = np.fft.fftfreq(64)[:, None]
        fx = np.fft.rfftfreq(64)[None, :]
        f = np.sqrt(fy ** 2 + fx ** 2)
        lo = spec[(f > 0) & (f < 0.12)].mean()
        hi = spec[f > 0.3].mean()
        assert lo > 4.0 * hi, (lo, hi)

    def test_photo_scene_contract_and_determinism(self):
        cam, mask = synth_scene_dr(jax.random.PRNGKey(5), H, W, photo=True)
        cam2, mask2 = synth_scene_dr(jax.random.PRNGKey(5), H, W, photo=True)
        assert cam.shape == (H, W, 3) and mask.shape == (H, W, 1)
        np.testing.assert_array_equal(np.asarray(cam), np.asarray(cam2))
        assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0
        assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}

    def test_photo_flag_changes_textures_not_labels(self):
        """photo=True must only swap the texture distribution: the specular
        field (and hence the label) shares the same key split, so the mask is
        IDENTICAL with and without the flag."""
        key = jax.random.PRNGKey(11)
        _, m_a = synth_scene_dr(key, H, W, glints=True, photo=False)
        _, m_b = synth_scene_dr(key, H, W, glints=True, photo=True)
        np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))

    def test_batch_dr3_contract(self):
        y, m = synth_specseg_batch_dr(jax.random.PRNGKey(1), 4, H, W,
                                      base_mix=0.5, glints=True, photo=True)
        assert y.shape == (4, H, W, 1) and m.shape == (4, H, W, 1)
        assert np.all(np.isfinite(np.asarray(y)))
        # photo=False and photo=True must differ on the DR half of the batch
        # (the photo flag swaps the texture distribution)
        y0, _ = synth_specseg_batch_dr(jax.random.PRNGKey(1), 4, H, W,
                                       base_mix=0.5, glints=True, photo=False)
        assert not jnp.allclose(y, y0)

    def test_chroma_batch_dr3_contract(self):
        from shmgan_tpu.data.synthetic_dr import synth_specseg_batch_dr_chroma
        x, m = synth_specseg_batch_dr_chroma(jax.random.PRNGKey(2), 4, H, W,
                                             base_mix=0.5, glints=True,
                                             photo=True)
        assert x.shape == (4, H, W, 2) and m.shape == (4, H, W, 1)
