"""Tests for the OOD evaluation sources (data/ood.py — VERDICT r2: break the
synthetic-eval circularity)."""

import os

import numpy as np
import pytest

from shmgan_tpu.data.ood import (
    REFERENCE_RESULTS_PNG, reference_photo_crops, synth_ood_scene,
    synth_ood_set,
)
from shmgan_tpu.data.synthetic import synth_eval_set


class TestSynthOodFamily:
    def test_shapes_and_ranges(self):
        ins, gts, masks = synth_ood_set(3, 32, seed=1)
        assert ins.shape == (3, 32, 32, 3) and gts.shape == (3, 32, 32, 3)
        assert masks.shape == (3, 32, 32, 1)
        for arr in (ins, gts):
            assert arr.dtype == np.float32
            assert arr.min() >= 0.0 and arr.max() <= 1.0
        assert set(np.unique(masks)) <= {0.0, 1.0}

    def test_deterministic_per_seed(self):
        a = synth_ood_set(2, 32, seed=7)[0]
        b = synth_ood_set(2, 32, seed=7)[0]
        np.testing.assert_array_equal(a, b)
        c = synth_ood_set(2, 32, seed=8)[0]
        assert not np.array_equal(a, c)

    def test_input_brighter_than_gt_inside_mask(self):
        # speculars ADD light: inside the mask the camera image must exceed GT
        rng = np.random.default_rng(0)
        cam, diff, mask = synth_ood_scene(rng, 64, 64)
        m = mask[..., 0] > 0.5
        if m.any():
            assert (cam.mean(axis=-1)[m] - diff.mean(axis=-1)[m]).mean() > 0.05

    def test_statistics_differ_from_curriculum(self):
        # the OOD family is piecewise-flat: its gradient-magnitude histogram
        # is dominated by near-zero gradients with sparse hard edges, unlike
        # the curriculum's smooth value-noise textures. Compare the median
        # absolute spatial gradient of the diffuse layers.
        _, ood_gt, _ = synth_ood_set(6, 64, seed=3)
        _, cur_gt, _ = synth_eval_set(6, 64, seed=3)

        def med_grad(x):
            gx = np.abs(np.diff(x, axis=2)).mean(axis=-1)
            return float(np.median(gx))

        assert med_grad(ood_gt) < 0.5 * med_grad(cur_gt)


@pytest.mark.skipif(not os.path.exists(REFERENCE_RESULTS_PNG),
                    reason="reference results figure not mounted")
class TestReferencePhotoCrops:
    def test_extraction(self):
        crops = reference_photo_crops(64)
        assert crops is not None
        assert crops["inputs"].shape == (10, 64, 64, 3)
        assert crops["ref_masks"].shape == (10, 64, 64, 1)
        assert crops["ref_outputs"].shape == (10, 64, 64, 3)
        assert 0.0 <= crops["inputs"].min() and crops["inputs"].max() <= 1.0
        # masks are mostly black with sparse white highlight pixels
        assert crops["ref_masks"].mean() < 0.25
        # photos are real content, not blank cells
        assert crops["inputs"].std() > 0.1

    def test_missing_asset_returns_none(self, tmp_path):
        assert reference_photo_crops(64, path=str(tmp_path / "nope.png")) is None
