"""Tests for Orbax train-state checkpointing and the SpecSeg h5 converter."""

import dataclasses
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.checkpoint import (
    CheckpointManager, convert_keras_convt_kernel, load_specseg_h5,
)
from shmgan_tpu.config import Config
from shmgan_tpu.models import SpecSeg
from shmgan_tpu.train.state import create_train_state


def small_config() -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=16, filter_size=8,
                                    specseg_base_filters=4)
    cfg.train = dataclasses.replace(cfg.train, batch_size=1)
    return cfg


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = small_config()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        state = state.replace(step=jnp.asarray(42, jnp.int32))
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
        mgr.save(state)

        fresh = create_train_state(cfg, jax.random.PRNGKey(99))
        restored = mgr.restore(fresh)
        assert restored is not None
        assert int(restored.step) == 42
        for a, b in zip(jax.tree_util.tree_leaves(state.g_params),
                        jax.tree_util.tree_leaves(restored.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_restore_empty_returns_none(self, tmp_path):
        cfg = small_config()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "empty"), max_to_keep=3)
        assert mgr.restore(state) is None
        mgr.close()

    def test_max_to_keep(self, tmp_path):
        cfg = small_config()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "keep"), max_to_keep=2)
        for s in (1, 2, 3, 4):
            mgr.save(state.replace(step=jnp.asarray(s, jnp.int32)))
        assert mgr.latest_step() == 4
        steps = sorted(int(d) for d in os.listdir(str(tmp_path / "keep"))
                       if d.isdigit())
        assert len(steps) <= 2
        mgr.close()


def _write_fake_keras2_h5(path: str, flax_vars, base: int):
    """Write an h5 file in the keras-2 layout (model_weights/<layer>/<layer>/
    kernel:0) carrying our flax SpecSeg weights, inverting the converter mapping —
    validates the name/order/transform contract bidirectionally."""
    from shmgan_tpu.checkpoint import (
        _FLAX_BN_ORDER, _FLAX_CONVT_ORDER, _FLAX_CONV_ORDER, _keras_name,
    )

    def get(tree, path):
        node = tree
        for p in path.split("/"):
            node = node[p]
        return np.asarray(node)

    p = flax_vars["params"]
    bs = flax_vars["batch_stats"]
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")

        def put(layer, name, arr):
            g = mw.require_group(layer).require_group(layer)
            g.create_dataset(name, data=arr)

        for i, fp in enumerate(_FLAX_CONV_ORDER):
            layer = _keras_name("conv2d", i)
            put(layer, "kernel:0", get(p, fp + "/kernel"))
            put(layer, "bias:0", get(p, fp + "/bias"))
        for i, fp in enumerate(_FLAX_BN_ORDER):
            layer = _keras_name("batch_normalization", i)
            put(layer, "gamma:0", get(p, fp + "/scale"))
            put(layer, "beta:0", get(p, fp + "/bias"))
            put(layer, "moving_mean:0", get(bs, fp + "/mean"))
            put(layer, "moving_variance:0", get(bs, fp + "/var"))
        for i, fp in enumerate(_FLAX_CONVT_ORDER):
            layer = _keras_name("conv2d_transpose", i)
            # invert the converter transform: flax (kh,kw,in,out) -> keras (kh,kw,out,in)
            k = get(p, fp + "/kernel")
            put(layer, "kernel:0", np.ascontiguousarray(
                k[::-1, ::-1].transpose(0, 1, 3, 2)))
            put(layer, "bias:0", get(p, fp + "/bias"))


class TestSpecSegConverter:
    def test_convt_transform_involution(self):
        k = np.random.default_rng(0).normal(size=(2, 2, 8, 4)).astype(np.float32)
        twice = convert_keras_convt_kernel(convert_keras_convt_kernel(k))
        np.testing.assert_array_equal(twice, k)

    def test_h5_roundtrip_preserves_function(self, tmp_path):
        net = SpecSeg(base_filters=16)
        x = jnp.linspace(0, 1, 1 * 32 * 32 * 1).reshape(1, 32, 32, 1)
        variables = net.init(jax.random.PRNGKey(0), x, train=False)
        ref_out = net.apply(variables, x, train=False)

        path = str(tmp_path / "specseg_fake.h5")
        _write_fake_keras2_h5(path, jax.device_get(variables), base=16)
        loaded = load_specseg_h5(path)

        out = net.apply(loaded, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-5, atol=1e-6)

    def test_full_pipeline_uses_converted_weights(self, tmp_path):
        cfg = small_config()
        net = SpecSeg(base_filters=cfg.model.specseg_base_filters)
        x = jnp.zeros((1, 16, 16, 1))
        variables = net.init(jax.random.PRNGKey(1), x, train=False)
        path = str(tmp_path / "ss.h5")
        _write_fake_keras2_h5(path, jax.device_get(variables), base=4)
        loaded = load_specseg_h5(path)
        state = create_train_state(cfg, jax.random.PRNGKey(0), specseg_vars=loaded)
        for a, b in zip(jax.tree_util.tree_leaves(loaded),
                        jax.tree_util.tree_leaves(state.specseg_vars)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSpecSegMsgpack:
    """Native msgpack round-trip for SpecSeg weights (checkpoint.py:208-252) —
    the hand-off format when SpecSeg is trained in-framework instead of arriving
    as the reference's keras h5 blob (ShmGANwithSSpecSeg.py:930-931)."""

    def test_msgpack_roundtrip_preserves_function(self, tmp_path):
        from shmgan_tpu.checkpoint import (load_specseg_msgpack,
                                           load_specseg_weights,
                                           save_specseg_msgpack)

        net = SpecSeg(base_filters=16)
        x = jnp.linspace(0, 1, 32 * 32).reshape(1, 32, 32, 1)
        variables = net.init(jax.random.PRNGKey(0), x, train=False)
        ref_out = net.apply(variables, x, train=False)

        path = str(tmp_path / "ss.msgpack")
        save_specseg_msgpack(variables, path)
        loaded = load_specseg_msgpack(path, base_filters=16, image_size=32)
        out = net.apply(loaded, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-6, atol=1e-7)

        # extension dispatch picks the msgpack path
        via_dispatch = load_specseg_weights(path, base_filters=16, image_size=32)
        for a, b in zip(jax.tree_util.tree_leaves(loaded),
                        jax.tree_util.tree_leaves(via_dispatch)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_trained_specseg_flows_into_gan_state(self, tmp_path):
        from shmgan_tpu.checkpoint import (load_specseg_weights,
                                           save_specseg_msgpack)
        from shmgan_tpu.train.specseg_train import (create_specseg_state,
                                                    specseg_vars_from_state)

        cfg = small_config()
        ss_state = create_specseg_state(cfg, jax.random.PRNGKey(3))
        ss_vars = specseg_vars_from_state(ss_state)
        path = str(tmp_path / "trained.msgpack")
        save_specseg_msgpack(ss_vars, path)

        loaded = load_specseg_weights(
            path, base_filters=cfg.model.specseg_base_filters,
            image_size=cfg.model.image_size)
        state = create_train_state(cfg, jax.random.PRNGKey(0), specseg_vars=loaded)
        for a, b in zip(jax.tree_util.tree_leaves(ss_vars),
                        jax.tree_util.tree_leaves(state.specseg_vars)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestInferenceBundle:
    """Deployable inference bundle (checkpoint.py): generator + SpecSeg, no
    optimizer state — the serving hand-off (cli --mode export / --serve_weights_bundle)."""

    def test_export_load_roundtrip_preserves_inference(self, tmp_path):
        from shmgan_tpu.checkpoint import (export_inference_bundle,
                                           load_inference_bundle)
        from shmgan_tpu.infer import make_infer_fn

        cfg = small_config()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        path = str(tmp_path / "bundle.msgpack")
        export_inference_bundle(state, cfg, path)
        assert os.path.exists(path) and os.path.exists(path + ".json")

        g_params, ss_vars, header = load_inference_bundle(path)
        assert header["image_size"] == cfg.model.image_size

        infer = make_infer_fn(cfg)
        rgb = jax.random.uniform(jax.random.PRNGKey(1),
                                 (1, cfg.model.image_size,
                                  cfg.model.image_size, 3))
        a = infer(state.g_params, state.specseg_vars, rgb)
        b = infer(g_params, ss_vars, rgb)
        np.testing.assert_allclose(np.asarray(a["gen_rgb_calibrated"]),
                                   np.asarray(b["gen_rgb_calibrated"]),
                                   rtol=1e-6, atol=1e-6)

    def test_header_carries_upsample_mode(self, tmp_path):
        """A resize_conv bundle must reconstruct a resize_conv graph — the two
        modes share one param-tree structure, so only the header keeps the
        serving graph on the op the weights were trained for."""
        import dataclasses
        import json

        from shmgan_tpu.checkpoint import (export_inference_bundle,
                                           load_inference_bundle)

        cfg = small_config()
        cfg.model = dataclasses.replace(cfg.model, upsample_mode="resize_conv")
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        path = str(tmp_path / "bundle_rc.msgpack")
        export_inference_bundle(state, cfg, path)
        with open(path + ".json") as f:
            assert json.load(f)["upsample_mode"] == "resize_conv"
        _, _, header = load_inference_bundle(path)
        assert header["upsample_mode"] == "resize_conv"
        # old bundles without the key default to reference parity
        hdr = json.load(open(path + ".json"))
        del hdr["upsample_mode"]
        json.dump(hdr, open(path + ".json", "w"))
        _, _, header = load_inference_bundle(path)
        assert header.get("upsample_mode", "conv_transpose") == "conv_transpose"

    def test_fp16_bundle_halves_size_and_stays_accurate(self, tmp_path):
        """store_dtype=float16 bundles: half the bytes, floats come back as
        float32 at load, and inference agrees to fp16-quantization tolerance
        (the durable-in-repo flagship artifact relies on this)."""
        from shmgan_tpu.checkpoint import (export_inference_bundle,
                                           load_inference_bundle)
        from shmgan_tpu.infer import make_infer_fn

        cfg = small_config()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        p32 = str(tmp_path / "b32.msgpack")
        p16 = str(tmp_path / "b16.msgpack")
        export_inference_bundle(state, cfg, p32)
        export_inference_bundle(state, cfg, p16, store_dtype="float16")
        assert os.path.getsize(p16) < 0.6 * os.path.getsize(p32)

        g_params, ss_vars, header = load_inference_bundle(p16)
        assert header["store_dtype"] == "float16"
        assert all(np.asarray(x).dtype == np.float32
                   for x in jax.tree_util.tree_leaves(g_params)
                   if np.issubdtype(np.asarray(x).dtype, np.floating))
        infer = make_infer_fn(cfg)
        rgb = jax.random.uniform(jax.random.PRNGKey(1),
                                 (1, cfg.model.image_size,
                                  cfg.model.image_size, 3))
        a = infer(state.g_params, state.specseg_vars, rgb)
        b = infer(g_params, ss_vars, rgb)
        np.testing.assert_allclose(np.asarray(a["gen_rgb_calibrated"]),
                                   np.asarray(b["gen_rgb_calibrated"]),
                                   atol=5e-2)

    def test_bundle_smaller_than_checkpoint_state(self, tmp_path):
        from shmgan_tpu.checkpoint import export_inference_bundle

        cfg = small_config()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        path = str(tmp_path / "bundle.msgpack")
        export_inference_bundle(state, cfg, path)
        bundle_bytes = os.path.getsize(path)
        state_bytes = sum(
            np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(
                {"g": state.g_params, "d": state.d_params,
                 "go": state.g_opt_state, "do": state.d_opt_state,
                 "s": state.specseg_vars}))
        assert bundle_bytes < 0.5 * state_bytes
