"""SHIQ-style triplet adapter tests (data/triplets.py) — VERDICT r1 item #8.

Both on-disk layouts, mask synthesis from residue, the SpecSeg-pair and
GAN-pseudo-view consumers, and an end-to-end SpecSeg training step on triplet
data.
"""

import numpy as np
import pytest

from shmgan_tpu.data.synthetic import write_triplet_fixture_tree
from shmgan_tpu.data.triplets import (TripletDataset, specseg_pairs,
                                      triplet_to_views)


@pytest.fixture()
def folder_tree(tmp_path):
    root = str(tmp_path / "folder")
    write_triplet_fixture_tree(root, 6, 24, seed=0, layout="folder")
    return root


@pytest.fixture()
def shiq_tree(tmp_path):
    root = str(tmp_path / "shiq")
    write_triplet_fixture_tree(root, 6, 24, seed=1, layout="shiq")
    return root


class TestTripletDataset:
    def test_folder_layout(self, folder_tree):
        ds = TripletDataset(folder_tree, image_size=24, batch_size=3)
        assert len(ds) == 6 and ds.batches_per_epoch == 2
        batch = next(ds.iter_epoch())
        assert batch["image"].shape == (3, 24, 24, 3)
        assert batch["diffuse"].shape == (3, 24, 24, 3)
        assert batch["mask"].shape == (3, 24, 24, 1)
        assert set(np.unique(batch["mask"])) <= {0.0, 1.0}

    def test_shiq_suffix_layout(self, shiq_tree):
        ds = TripletDataset(shiq_tree, image_size=24, batch_size=2)
        assert len(ds) == 6
        batch = next(ds.iter_epoch())
        # diffuse must be <= image up to 8-bit quantization (specular additive)
        assert float((batch["image"] - batch["diffuse"]).min()) > -0.05

    def test_mask_synthesized_when_absent(self, tmp_path):
        root = str(tmp_path / "nomask")
        write_triplet_fixture_tree(root, 4, 24, seed=2, layout="folder",
                                   with_mask=False)
        ds = TripletDataset(root, image_size=24, batch_size=2)
        batch = next(ds.iter_epoch())
        assert batch["mask"].shape == (2, 24, 24, 1)
        assert batch["mask"].sum() > 0  # scenes have highlights

    def test_synth_mask_matches_written_mask(self, folder_tree, tmp_path):
        # residue-derived masks agree closely with the curriculum's GT masks
        root2 = str(tmp_path / "nomask2")
        write_triplet_fixture_tree(root2, 6, 24, seed=0, layout="folder",
                                   with_mask=False)
        with_mask = TripletDataset(folder_tree, image_size=24, batch_size=6)
        without = TripletDataset(root2, image_size=24, batch_size=6)
        a = next(with_mask.iter_epoch())["mask"]
        b = next(without.iter_epoch())["mask"]
        agreement = (a == b).mean()
        assert agreement > 0.95

    def test_process_slicing(self, folder_tree):
        ds = TripletDataset(folder_tree, image_size=24, batch_size=4)
        g = next(ds.iter_epoch(shuffle_seed=3))
        p0 = next(ds.iter_epoch(shuffle_seed=3, process_index=0, process_count=2))
        p1 = next(ds.iter_epoch(shuffle_seed=3, process_index=1, process_count=2))
        np.testing.assert_array_equal(
            g["image"], np.concatenate([p0["image"], p1["image"]], axis=0))


class TestConsumers:
    def test_specseg_pairs_domain(self, folder_tree):
        ds = TripletDataset(folder_tree, image_size=24, batch_size=4)
        y, m = specseg_pairs(next(ds.iter_epoch()))
        assert y.shape == (4, 24, 24, 1) and m.shape == (4, 24, 24, 1)
        assert float(y.min()) >= 0.0 and float(y.max()) > 1.5  # standardized

    def test_triplet_to_views_shape_and_ed(self, folder_tree):
        ds = TripletDataset(folder_tree, image_size=24, batch_size=2)
        batch = next(ds.iter_epoch())
        views = triplet_to_views(batch)
        assert views.shape == (5, 2, 24, 24, 3)
        np.testing.assert_array_equal(views[4], batch["diffuse"])
        for i in range(4):
            np.testing.assert_array_equal(views[i], batch["image"])

    def test_specseg_train_step_on_triplets(self, tmp_path):
        import jax

        from shmgan_tpu.config import Config
        from shmgan_tpu.train.specseg_train import (create_specseg_state,
                                                    make_specseg_train_step)
        import dataclasses as dc

        # SpecSeg's 4 pooling levels need image_size % 16 == 0
        root = str(tmp_path / "t32")
        write_triplet_fixture_tree(root, 4, 32, seed=5, layout="folder")
        cfg = Config()
        cfg.model = dc.replace(cfg.model, image_size=32, specseg_base_filters=4)
        ds = TripletDataset(root, image_size=32, batch_size=4)
        y, m = specseg_pairs(next(ds.iter_epoch()))
        state = create_specseg_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_specseg_train_step(cfg))
        new_state, metrics = step(state, y, m, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1


def test_empty_mask_dir_falls_back_to_residue(tmp_path):
    import os

    root = str(tmp_path / "emptymask")
    write_triplet_fixture_tree(root, 3, 24, seed=9, layout="folder",
                               with_mask=False)
    os.makedirs(os.path.join(root, "mask"))  # exists but empty
    ds = TripletDataset(root, image_size=24, batch_size=3)
    batch = next(ds.iter_epoch())
    assert batch["mask"].shape == (3, 24, 24, 1)
    assert batch["mask"].sum() > 0
