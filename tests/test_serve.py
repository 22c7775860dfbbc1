"""Tests for the batch inference engine (serving path)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import write_fixture_tree
from shmgan_tpu.serve import BatchInferenceEngine
from shmgan_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def engine():
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    return BatchInferenceEngine(cfg, state.g_params, state.specseg_vars,
                                batch_size=4)


class TestEngine:
    def test_exact_batch(self, engine):
        rgb = np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
        out = engine.process_images(rgb)
        assert out["gen_rgb"].shape == (4, 32, 32, 3)
        assert out["mask"].shape == (4, 32, 32, 1)

    def test_padding_partial_batch(self, engine):
        rgb = np.random.default_rng(1).uniform(0, 1, (6, 32, 32, 3)).astype(np.float32)
        out = engine.process_images(rgb)
        assert out["gen_rgb"].shape == (6, 32, 32, 3)

    def test_padding_preserves_values(self, engine):
        rgb = np.random.default_rng(2).uniform(0, 1, (5, 32, 32, 3)).astype(np.float32)
        full = engine.process_images(rgb)
        solo = engine.process_images(rgb[4:5])
        np.testing.assert_allclose(full["gen_rgb"][4], solo["gen_rgb"][0],
                                   rtol=1e-4, atol=1e-5)

    def test_process_folder(self, engine, tmp_path):
        root = str(tmp_path / "in")
        write_fixture_tree(root, n_images=3, image_size=32, seed=0)
        out_dir = str(tmp_path / "out")
        n = engine.process_folder(os.path.join(root, "I0"), out_dir)
        assert n == 3
        files = os.listdir(out_dir)
        assert sum(f.endswith("_specfree.png") for f in files) == 3
        assert sum(f.endswith("_mask.png") for f in files) == 3

    def test_watch_folder_bounded(self, engine, tmp_path):
        root = str(tmp_path / "watch_in")
        write_fixture_tree(root, n_images=2, image_size=32, seed=1)
        out_dir = str(tmp_path / "watch_out")
        engine.watch_folder(os.path.join(root, "I0"), out_dir, poll_s=0.01,
                            max_iterations=3)
        assert sum(f.endswith("_specfree.png") for f in os.listdir(out_dir)) == 2
