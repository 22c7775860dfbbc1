"""Dichromatic chroma prior (ops/specprior.py) + its inference wiring.

The prior exists because the parity SpecSeg consumes luma only
(ShmGANwithSSpecSeg.py:930-931) and therefore cannot separate bright diffuse
surfaces from specular highlights; these tests pin the physics behavior the
module promises (achromatic-bright fires, saturated-bright doesn't) and that
the cfg.eval.mask_chroma_prior flag actually reaches every inference surface.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.infer import make_infer_fn, make_mask_fn
from shmgan_tpu.ops.specprior import chroma_prior, fuse_mask_prior


def _tiny_cfg():
    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, image_size=32, filter_size=8, specseg_base_filters=4,
        compute_dtype="float32")
    return cfg


def _scene(saturated_blob: bool) -> np.ndarray:
    """Mid-gray diffuse field with one bright 8x8 blob: achromatic (specular
    lookalike) or fully saturated red (bright diffuse object)."""
    rng = np.random.default_rng(0)
    img = 0.35 + 0.1 * rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    if saturated_blob:
        img[:, 12:20, 12:20] = [0.95, 0.08, 0.08]
    else:
        img[:, 12:20, 12:20] = 0.97
    return img


def test_prior_shape_range_and_jit():
    rgb = jnp.asarray(np.random.default_rng(1).uniform(
        size=(3, 32, 48, 3)).astype(np.float32))
    p = jax.jit(chroma_prior)(rgb)
    assert p.shape == (3, 32, 48, 1)
    assert p.dtype == jnp.float32
    assert bool(jnp.all((p >= 0) & (p <= 1)))


def test_prior_fires_on_achromatic_not_saturated_brightness():
    blob = (slice(None), slice(13, 19), slice(13, 19), slice(None))
    p_spec = np.asarray(chroma_prior(jnp.asarray(_scene(False))))
    p_diff = np.asarray(chroma_prior(jnp.asarray(_scene(True))))
    assert p_spec[blob].mean() > 0.9          # achromatic highlight: fire
    assert p_diff[blob].mean() < 0.2          # bright but saturated: hold
    # background stays quiet in both
    assert p_spec[:, :8, :8].mean() < 0.1
    assert p_diff[:, :8, :8].mean() < 0.1


def test_prior_exposure_invariance():
    """The per-image quantile/median baselines self-normalize: a globally
    dimmed copy of the same scene produces (nearly) the same prior."""
    rgb = _scene(False)
    p1 = np.asarray(chroma_prior(jnp.asarray(rgb)))
    p2 = np.asarray(chroma_prior(jnp.asarray(0.6 * rgb)))
    assert np.abs(p1 - p2).mean() < 0.05


def test_fuse_is_mean_and_bounded():
    a = jnp.full((1, 4, 4, 1), 0.8)
    b = jnp.full((1, 4, 4, 1), 0.2)
    f = fuse_mask_prior(a, b)
    np.testing.assert_allclose(np.asarray(f), 0.5, atol=1e-6)


def test_mask_fn_flag_changes_output_and_stays_probability():
    cfg = _tiny_cfg()
    rng = jax.random.PRNGKey(0)
    from shmgan_tpu.train.state import build_models
    _g, _d, specseg = build_models(cfg)
    vars_ = specseg.init(rng, jnp.zeros((1, 32, 32, 1)), train=False)
    rgb = jnp.asarray(_scene(False))
    m_off = np.asarray(make_mask_fn(cfg)(vars_, rgb))
    m_on = np.asarray(make_mask_fn(cfg, prior=True)(vars_, rgb))
    assert not np.allclose(m_off, m_on)
    assert np.all((m_on >= 0) & (m_on <= 1))
    # default `prior=None` follows the config flag
    cfg_on = _tiny_cfg()
    cfg_on.eval = dataclasses.replace(cfg_on.eval, mask_chroma_prior=True)
    m_cfg = np.asarray(make_mask_fn(cfg_on)(vars_, rgb))
    np.testing.assert_allclose(m_cfg, m_on, atol=1e-6)


@pytest.mark.parametrize("tta", [False, True])
def test_infer_fn_with_prior_compiles_and_composites(tta):
    cfg = _tiny_cfg()
    cfg.eval = dataclasses.replace(cfg.eval, mask_chroma_prior=True,
                                   mask_tta=tta)
    from shmgan_tpu.train.state import create_train_state
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    infer = make_infer_fn(cfg)
    out = infer(state.g_params, state.specseg_vars, jnp.asarray(_scene(False)))
    for k in ("gen_rgb_composited", "gen_rgb_calibrated", "mask"):
        assert bool(jnp.all(jnp.isfinite(out[k]))), k
    assert bool(jnp.all((out["mask"] >= 0) & (out["mask"] <= 1)))


def test_cli_flag_roundtrip():
    cfg = Config.from_args(["--mode", "test", "--mask_chroma_prior", "true"])
    assert cfg.eval.mask_chroma_prior is True
    cfg = Config.from_args(["--mode", "test"])
    assert cfg.eval.mask_chroma_prior is False
