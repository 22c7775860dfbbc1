"""Unit tests for the loss zoo (train/losses.py) against hand computations and —
where the reference used a TF op directly — against TensorFlow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.train.losses import (
    binary_focal_loss, dice_loss, lsgan_to_target, lsgan_to_zero, masked_mse,
    nst_loss, softmax_ce, specseg_loss,
)

RNG = np.random.default_rng(7)


class TestLSGAN:
    def test_to_target(self):
        pred = jnp.asarray([[1.0, 0.5], [0.0, 2.0]])
        t = jnp.float32(0.9)
        expect = np.mean((np.asarray(pred) - 0.9) ** 2)
        np.testing.assert_allclose(float(lsgan_to_target(pred, t)), expect, rtol=1e-6)

    def test_to_zero(self):
        pred = jnp.asarray([2.0, -2.0])
        np.testing.assert_allclose(float(lsgan_to_zero(pred)), 4.0, rtol=1e-6)


class TestSoftmaxCE:
    def test_matches_tf_with_unnormalized_labels(self):
        # The reference feeds a SMOOTHED one-hot whose sum is t ~ U[0.8,1.2]
        # (ShmGANwithSSpecSeg.py:477,688,702) — tf.nn.softmax_cross_entropy_with_logits
        # accepts unnormalized labels; our implementation must agree.
        tf = pytest.importorskip("tensorflow")
        logits = RNG.normal(0, 2, (3, 5)).astype(np.float32)
        labels = np.zeros((3, 5), np.float32)
        labels[:, 4] = 1.13  # smoothed, unnormalized
        theirs = tf.nn.softmax_cross_entropy_with_logits(
            labels=labels, logits=logits).numpy().mean()
        ours = float(softmax_ce(jnp.asarray(labels), jnp.asarray(logits)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_hard_onehot(self):
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0, 0.0]])
        labels = jnp.asarray([[1.0, 0.0, 0.0, 0.0, 0.0]])
        assert float(softmax_ce(labels, logits)) < 1e-3


class TestMaskedAndNST:
    def test_masked_mse(self):
        a = jnp.ones((1, 4, 4, 3))
        b = jnp.zeros((1, 4, 4, 3))
        m = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)
        # half the pixels masked on: mean((1*mask - 0)^2) = mean(mask^2) = 0.5
        np.testing.assert_allclose(float(masked_mse(a, b, m)), 0.5, rtol=1e-6)

    def test_nst_identical_is_zero_style(self):
        x = jnp.asarray(RNG.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
        out = nst_loss(x, x, x, image_size=16)
        np.testing.assert_allclose(float(out["content"]), 0.0, atol=1e-8)
        np.testing.assert_allclose(float(out["style"]), 0.0, atol=1e-8)

    def test_nst_factor(self):
        # style factor = 1/(2*9*H*W)^2 (ShmGANwithSSpecSeg.py:817)
        a = jnp.ones((1, 8, 8, 3))
        b = jnp.zeros((1, 8, 8, 3))
        out = nst_loss(a, b, b, image_size=8)
        # gram(a) = ones(3,3) (normalized by H*W -> each entry 1); gram(b)=0
        factor = 1.0 / (2 * 9 * 8 * 8) ** 2
        np.testing.assert_allclose(float(out["style"]), factor * 1.0, rtol=1e-5)
        # content = mean((1-0)^2) = 1
        np.testing.assert_allclose(float(out["content"]), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(out["nst"]), 100 * factor + 1.0, rtol=1e-5)


class TestSegLosses:
    def test_dice_perfect(self):
        m = jnp.asarray(RNG.integers(0, 2, (1, 8, 8, 1)).astype(np.float32))
        assert float(dice_loss(m, m)) < 1e-4

    def test_dice_disjoint(self):
        a = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)
        b = jnp.zeros((1, 4, 4, 1)).at[0, 2:].set(1.0)
        assert float(dice_loss(a, b)) > 0.99

    def test_focal_confident_correct_is_small(self):
        t = jnp.ones((1, 4, 4, 1))
        p = jnp.full((1, 4, 4, 1), 0.99)
        assert float(binary_focal_loss(p, t)) < 1e-4

    def test_specseg_loss_composition(self):
        p = jnp.asarray(RNG.uniform(0.01, 0.99, (1, 8, 8, 1)).astype(np.float32))
        t = jnp.asarray(RNG.integers(0, 2, (1, 8, 8, 1)).astype(np.float32))
        total = float(specseg_loss(p, t))
        np.testing.assert_allclose(
            total, float(dice_loss(p, t)) + float(binary_focal_loss(p, t)),
            rtol=1e-6)
