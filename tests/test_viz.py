"""Tests for visualization/artifact utilities and the SAGAN attention module."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from shmgan_tpu.utils.viz import (
    debug_plot, image_grid, model_summary, plot_single_image, rescale_for_display,
    save_dataset_hdf5, write_model_summaries,
)


class TestViz:
    def test_image_grid_writes_png(self, tmp_path):
        imgs = [np.random.rand(16, 16, 3) for _ in range(5)]
        p = str(tmp_path / "grid.png")
        image_grid(imgs, path=p)
        assert os.path.getsize(p) > 0

    def test_debug_plot(self, tmp_path):
        gen_input = np.random.rand(1, 16, 16, 10)
        p = str(tmp_path / "dbg.png")
        debug_plot(gen_input, path=p)
        assert os.path.getsize(p) > 0

    def test_plot_single_gray_and_rgb(self, tmp_path):
        plot_single_image(np.random.rand(1, 16, 16, 1), path=str(tmp_path / "g.png"))
        plot_single_image(np.random.rand(1, 16, 16, 3), path=str(tmp_path / "c.png"))
        assert os.path.getsize(str(tmp_path / "g.png")) > 0
        assert os.path.getsize(str(tmp_path / "c.png")) > 0

    def test_rescale_for_display(self):
        x = np.array([[-2.0, 2.0]])
        out = rescale_for_display(x)
        assert out.min() == 0.0 and out.max() == 1.0
        np.testing.assert_allclose(rescale_for_display(np.ones((2, 2))), 0.0)

    def test_save_hdf5(self, tmp_path):
        import h5py
        p = str(tmp_path / "d.hdf5")
        size = save_dataset_hdf5(np.random.rand(3, 8, 8, 3), path=p)
        assert size > 0
        with h5py.File(p) as f:
            assert f["default"].shape == (3, 8, 8, 3)

    def test_model_summary_counts(self):
        params = {"layer": {"kernel": jnp.zeros((3, 3, 4, 8)),
                            "bias": jnp.zeros((8,))}}
        s = model_summary(params, "m")
        assert "Total params: 296" in s
        assert "layer/kernel" in s

    def test_write_model_summaries(self, tmp_path):
        tree = {"w": jnp.zeros((4,))}
        write_model_summaries(tree, tree, tree, out_dir=str(tmp_path))
        for f in ("Generator_summary.txt", "Discriminator_summary.txt",
                  "SpecSeg_summary.txt"):
            assert os.path.getsize(str(tmp_path / f)) > 0


class TestSAGANAttention:
    def test_shapes_and_gamma_zero_init(self):
        from shmgan_tpu.models.blocks import SAGANAttention
        mod = SAGANAttention(features=16, pool=True, pool_size=2)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 16))
        params = mod.init(jax.random.PRNGKey(1), x)["params"]
        out, attn = mod.apply({"params": params}, x)
        assert out.shape == (2, 8, 8, 16)
        assert attn.shape == (2, 64, 64)
        # gamma initialized to 0 (ShmGANwithSSpecSeg.py:209): output == pooled input
        from shmgan_tpu.models.blocks import max_pool
        np.testing.assert_allclose(np.asarray(out), np.asarray(max_pool(x, 2)),
                                   atol=1e-6)

    def test_attention_rows_sum_to_one(self):
        from shmgan_tpu.models.blocks import SAGANAttention
        mod = SAGANAttention(features=8, pool=False)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 8))
        params = mod.init(jax.random.PRNGKey(1), x)["params"]
        _, attn = mod.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)
