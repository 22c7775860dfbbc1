"""Resolution warm start: shape-matched parameter transfer across image sizes.

G and SpecSeg are fully convolutional; D's Flatten->Dense class head is the
only size-dependent parameter. transfer_matching_params must move exactly the
size-agnostic leaves and keep the fresh init for the rest.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from shmgan_tpu.checkpoint import transfer_matching_params
from shmgan_tpu.config import Config
from shmgan_tpu.train.state import create_train_state


def cfg_at(size: int) -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=size, filter_size=8,
                                    specseg_base_filters=4,
                                    compute_dtype="float32")
    cfg.train = dataclasses.replace(cfg.train, batch_size=2)
    return cfg


def test_generator_transfers_fully_across_sizes():
    s32 = create_train_state(cfg_at(32), jax.random.PRNGKey(0))
    s64 = create_train_state(cfg_at(64), jax.random.PRNGKey(1))
    merged, kept, fresh = transfer_matching_params(s64.g_params, s32.g_params)
    assert fresh == 0  # G is fully convolutional
    assert kept == len(jax.tree_util.tree_leaves(s64.g_params))
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(s32.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_discriminator_dense_head_stays_fresh():
    s32 = create_train_state(cfg_at(32), jax.random.PRNGKey(0))
    s64 = create_train_state(cfg_at(64), jax.random.PRNGKey(1))
    merged, kept, fresh = transfer_matching_params(s64.d_params, s32.d_params)
    # exactly the Flatten->Dense class-head kernel depends on the input extent
    assert fresh >= 1
    assert kept >= 1
    mism = [p for p, (n, o) in zip(
        jax.tree_util.tree_leaves_with_path(merged),
        zip(jax.tree_util.tree_leaves(s64.d_params),
            jax.tree_util.tree_leaves(s32.d_params))) if n.shape != o.shape]
    for path, leaf in mism:
        assert "out_class" in jax.tree_util.keystr(path)
        # fresh leaves come from the destination init
    # and every shape-matched leaf equals the source
    flat_m = jax.tree_util.tree_leaves(merged)
    flat_n = jax.tree_util.tree_leaves(s64.d_params)
    flat_o = jax.tree_util.tree_leaves(s32.d_params)
    for m, n, o in zip(flat_m, flat_n, flat_o):
        src = o if n.shape == o.shape else n
        np.testing.assert_array_equal(np.asarray(m), np.asarray(src))


def test_same_size_transfer_is_identity_copy():
    a = create_train_state(cfg_at(32), jax.random.PRNGKey(0))
    b = create_train_state(cfg_at(32), jax.random.PRNGKey(1))
    merged, kept, fresh = transfer_matching_params(b.g_params, a.g_params)
    assert fresh == 0
    for m, o in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(a.g_params)):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(o))


def test_bundle_warm_start_across_sizes(tmp_path):
    """--init_from_bundle path: an exported inference bundle (fp16 store)
    warm-starts G at a different image size leaf-for-leaf, exactly as the
    checkpoint-dir warm start does (quality_train.py run_gan_phase)."""
    from shmgan_tpu.checkpoint import (export_inference_bundle,
                                       load_inference_bundle)

    s32 = create_train_state(cfg_at(32), jax.random.PRNGKey(0))
    path = str(tmp_path / "bundle.msgpack")
    export_inference_bundle(s32, cfg_at(32), path, store_dtype="float16")

    g_loaded, ss_loaded, hdr = load_inference_bundle(path)
    assert hdr["image_size"] == 32 and hdr["store_dtype"] == "float16"

    s64 = create_train_state(cfg_at(64), jax.random.PRNGKey(1))
    merged, kept, fresh = transfer_matching_params(s64.g_params, g_loaded)
    assert fresh == 0  # G fully convolutional -> size-agnostic
    assert kept == len(jax.tree_util.tree_leaves(s64.g_params))
    # round-trip exact up to the fp16 store cast
    for m, o in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(s32.g_params)):
        np.testing.assert_array_equal(
            np.asarray(m), np.asarray(o).astype(np.float16).astype(np.float32))


def test_bundle_warm_start_cli_wiring():
    """Flag exists, defaults off, and the upsample-mode guard is present (a
    mismatched bundle must fail loudly: both modes share one param tree, so
    it would otherwise load silently into the wrong op)."""
    import importlib.util
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "quality_train", os.path.join(repo, "examples", "quality_train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    a = mod.parse_args(["--phase", "gan"])
    assert a.init_from_bundle == ""
    a = mod.parse_args(["--phase", "gan", "--init_from_bundle", "x.msgpack"])
    assert a.init_from_bundle == "x.msgpack"
    src = open(os.path.join(repo, "examples", "quality_train.py")).read()
    assert "mutually exclusive" in src
    assert "upsample_mode to match" in src
