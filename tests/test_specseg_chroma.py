"""Chroma-input SpecSeg (cfg.model.specseg_in_channels == 2).

The parity net consumes standardized luma only (ShmGANwithSSpecSeg.py:930-931);
the 2-channel divergence appends the dichromatic chroma prior
(ops/specprior.py) as a LEARNED input channel. These tests pin:
  * the input builder (specseg_net_input),
  * the chroma training curriculum (synth_specseg_batch_dr_chroma),
  * msgpack round-trip + input-channel auto-detection,
  * every consumer graph (mask fn, full infer fn, fused GAN train step,
    inference bundles) building and running with a 2-channel net.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.ops.specprior import chroma_prior, specseg_net_input


def _tiny_cfg(in_channels=2):
    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, image_size=32, filter_size=8, specseg_base_filters=4,
        specseg_in_channels=in_channels, compute_dtype="float32")
    return cfg


class TestNetInput:
    def test_one_channel_is_passthrough(self):
        y = jnp.ones((2, 8, 8, 1))
        rgb = jnp.ones((2, 8, 8, 3)) * 0.5
        out = specseg_net_input(y, rgb, 1)
        assert out is y

    def test_two_channels_appends_prior(self):
        y = jnp.zeros((2, 16, 16, 1))
        rgb = jnp.full((2, 16, 16, 3), 0.4)
        out = specseg_net_input(y, rgb, 2)
        assert out.shape == (2, 16, 16, 2)
        np.testing.assert_allclose(np.asarray(out[..., 0:1]), 0.0)
        np.testing.assert_allclose(np.asarray(out[..., 1:2]),
                                   np.asarray(chroma_prior(rgb)))

    def test_bad_channel_count_raises(self):
        with pytest.raises(ValueError):
            specseg_net_input(jnp.zeros((1, 8, 8, 1)),
                              jnp.zeros((1, 8, 8, 3)), 3)


class TestChromaCurriculum:
    def test_shapes_and_ranges(self):
        from shmgan_tpu.data.synthetic_dr import synth_specseg_batch_dr_chroma
        x, m = synth_specseg_batch_dr_chroma(
            jax.random.PRNGKey(0), 8, 32, 32, base_mix=0.5, glints=True)
        assert x.shape == (8, 32, 32, 2)
        assert m.shape == (8, 32, 32, 1)
        assert np.isfinite(np.asarray(x)).all()
        prior_ch = np.asarray(x[..., 1])
        assert prior_ch.min() >= 0.0 and prior_ch.max() <= 1.0
        # channel 2 must carry information (not a constant plane)
        assert prior_ch.std() > 1e-3

    def test_base_only_mix(self):
        from shmgan_tpu.data.synthetic_dr import synth_specseg_batch_dr_chroma
        x, m = synth_specseg_batch_dr_chroma(
            jax.random.PRNGKey(1), 4, 32, 32, base_mix=1.0, glints=False)
        assert x.shape == (4, 32, 32, 2)

    def test_luma_channel_matches_parity_curriculum(self):
        # same key, same scenes: channel 0 of the chroma batch must equal the
        # 1-channel curriculum's output (the chroma path may not perturb luma)
        from shmgan_tpu.data.synthetic_dr import (synth_specseg_batch_dr,
                                                  synth_specseg_batch_dr_chroma)
        k = jax.random.PRNGKey(7)
        x2, m2 = synth_specseg_batch_dr_chroma(k, 4, 32, 32, base_mix=0.0,
                                               glints=False)
        x1, m1 = synth_specseg_batch_dr(k, 4, 32, 32, base_mix=0.0,
                                        glints=False)
        np.testing.assert_allclose(np.asarray(x2[..., 0:1]), np.asarray(x1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1))


class TestRoundTrip:
    def test_msgpack_autodetect_and_load(self, tmp_path):
        from shmgan_tpu.checkpoint import (load_specseg_msgpack,
                                           save_specseg_msgpack,
                                           specseg_msgpack_in_channels)
        from shmgan_tpu.models import SpecSeg

        net = SpecSeg(base_filters=4)
        for in_ch in (1, 2):
            v = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, in_ch)), train=False)
            path = str(tmp_path / f"ss{in_ch}.msgpack")
            save_specseg_msgpack(v, path)
            assert specseg_msgpack_in_channels(path) == in_ch
            loaded = load_specseg_msgpack(path, base_filters=4, image_size=32)
            k = loaded["params"]["down0"]["conv0"]["kernel"]
            assert np.asarray(k).shape[2] == in_ch

    def test_bundle_header_carries_in_channels(self, tmp_path):
        from shmgan_tpu.checkpoint import (export_inference_bundle,
                                           load_inference_bundle)
        from shmgan_tpu.train.state import create_train_state

        cfg = _tiny_cfg(2)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        path = str(tmp_path / "bundle.msgpack")
        export_inference_bundle(state, cfg, path)
        g, ss, hdr = load_inference_bundle(path)
        assert hdr["specseg_in_channels"] == 2
        k = ss["params"]["down0"]["conv0"]["kernel"]
        assert np.asarray(k).shape[2] == 2


class TestConsumers:
    def test_mask_fn_two_channel(self):
        from shmgan_tpu.infer import make_mask_fn
        from shmgan_tpu.train.state import build_models

        cfg = _tiny_cfg(2)
        _, _, specseg = build_models(cfg)
        v = specseg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)),
                         train=False)
        mask = make_mask_fn(cfg)(v, jnp.full((2, 32, 32, 3), 0.5))
        assert mask.shape == (2, 32, 32, 1)
        assert np.isfinite(np.asarray(mask)).all()

    def test_infer_fn_two_channel(self):
        from shmgan_tpu.infer import make_infer_fn
        from shmgan_tpu.train.state import create_train_state

        cfg = _tiny_cfg(2)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        out = make_infer_fn(cfg)(state.g_params, state.specseg_vars,
                                 jnp.full((1, 32, 32, 3), 0.3))
        assert out["mask"].shape == (1, 32, 32, 1)
        assert np.isfinite(np.asarray(out["gen_rgb_composited"])).all()

    def test_train_step_two_channel(self):
        from shmgan_tpu.train.state import create_train_state
        from shmgan_tpu.train.step import make_train_step

        cfg = _tiny_cfg(2)
        cfg.train = dataclasses.replace(cfg.train, batch_size=2)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg), donate_argnums=())
        views = jax.random.uniform(jax.random.PRNGKey(1), (5, 2, 32, 32, 3))
        state, metrics = step(state, views, jax.random.PRNGKey(2),
                              jnp.ones((), jnp.int32))
        assert np.isfinite(float(metrics["total_G"]))
