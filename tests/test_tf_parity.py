"""Golden parity tests against TensorFlow — the reference's substrate.

The reference is TF2/Keras; TF is available in this image, so the rebuilt numerics
are validated DIRECTLY against the ops the reference calls:

  tf.image.rgb_to_yuv / yuv_to_rgb   (ShmGANwithSSpecSeg.py:480-484,550-553)
  tf.image.ssim(max_val=5)           (:759-763, test.py:336)
  tf.image.psnr(max_val=1)           (test.py:342)
  keras Conv2D(SAME, stride 2)       (discriminator blocks :385-389)
  keras Conv2DTranspose(SAME, s2)    (generator ups :298-323, SpecSeg ups :64-82)
  keras SpecSeg-topology h5 -> Flax converter, end-to-end functional equality

These are the heaviest tests in the suite; they pin the parity contract that the
pure-JAX unit tests then guard cheaply.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shmgan_tpu.ops.color import rgb_to_yuv, yuv_to_rgb  # noqa: E402
from shmgan_tpu.ops.ssim import psnr, ssim  # noqa: E402

RNG = np.random.default_rng(1234)


class TestColorParity:
    def test_rgb_to_yuv(self):
        x = RNG.uniform(0, 1, (2, 17, 23, 3)).astype(np.float32)
        ours = np.asarray(rgb_to_yuv(jnp.asarray(x)))
        theirs = tf.image.rgb_to_yuv(x).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_yuv_to_rgb(self):
        x = RNG.uniform(-0.5, 1.5, (2, 9, 11, 3)).astype(np.float32)
        ours = np.asarray(yuv_to_rgb(jnp.asarray(x)))
        theirs = tf.image.yuv_to_rgb(x).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestSSIMParity:
    def test_ssim_maxval_1(self):
        a = RNG.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
        b = np.clip(a + RNG.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
        ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
        theirs = tf.image.ssim(a, b, max_val=1.0).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_ssim_maxval_5_like_reference(self):
        # the reference's exact usage: rescaled-[0,1] YUV with max_val=5
        a = RNG.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        b = RNG.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), max_val=5.0))
        theirs = tf.image.ssim(a, b, max_val=5.0).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_psnr(self):
        a = RNG.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        b = RNG.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        ours = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
        theirs = tf.image.psnr(a, b, max_val=1.0).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


class TestConvParity:
    def test_conv2d_same_stride2(self):
        # Discriminator block conv: 3x3 stride-2 SAME, no bias (:385-389)
        x = RNG.uniform(-1, 1, (2, 16, 16, 4)).astype(np.float32)
        k = RNG.normal(0, 0.1, (3, 3, 4, 8)).astype(np.float32)
        theirs = tf.nn.conv2d(x, k, strides=2, padding="SAME").numpy()
        import flax.linen as nn

        class C(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME",
                               use_bias=False)(x)

        mod = C()
        variables = {"params": {"Conv_0": {"kernel": jnp.asarray(k)}}}
        ours = np.asarray(mod.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("ksize,stride", [(2, 2), (3, 2)])
    def test_conv2d_transpose_same(self, ksize, stride):
        # Generator up: ConvT 3x3 s2 SAME (:298); SpecSeg up: ConvT 2x2 s2 (:64)
        from shmgan_tpu.checkpoint import convert_keras_convt_kernel
        import flax.linen as nn

        x = RNG.uniform(-1, 1, (2, 8, 8, 4)).astype(np.float32)
        cin, cout = 4, 6
        k_tf = RNG.normal(0, 0.1, (ksize, ksize, cout, cin)).astype(np.float32)
        theirs = tf.nn.conv2d_transpose(
            x, k_tf, output_shape=(2, 8 * stride, 8 * stride, cout),
            strides=stride, padding="SAME").numpy()

        class CT(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.ConvTranspose(cout, (ksize, ksize),
                                        strides=(stride, stride), padding="SAME",
                                        use_bias=False)(x)

        k_flax = convert_keras_convt_kernel(k_tf)
        variables = {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(k_flax)}}}
        ours = np.asarray(CT().apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_avg_pool_same(self):
        # Generator downsampling: AveragePooling2D 2x2 SAME (:249)
        from shmgan_tpu.models.blocks import avg_pool_2x2
        x = RNG.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        theirs = tf.nn.avg_pool2d(x, 2, 2, "SAME").numpy()
        ours = np.asarray(avg_pool_2x2(jnp.asarray(x)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_max_pool_16(self):
        # Discriminator mask pooling: MaxPooling2D 16x16 SAME (:358)
        from shmgan_tpu.models.blocks import max_pool
        x = RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
        theirs = tf.nn.max_pool2d(x, 16, 16, "SAME").numpy()
        ours = np.asarray(max_pool(jnp.asarray(x), 16))
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    def test_leaky_relu(self):
        from shmgan_tpu.models.blocks import leaky_relu
        x = RNG.normal(0, 1, (100,)).astype(np.float32)
        theirs = tf.nn.leaky_relu(x).numpy()  # default alpha=0.2
        ours = np.asarray(leaky_relu(jnp.asarray(x)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def _build_keras_specseg(image_size: int, base: int = 16):
    """Keras model with the SpecSeg topology (SpecSeg.py:27-98 behavior): 4 down
    levels + bottom (Conv-Drop-Conv-BN), MaxPool down, ConvT(2,2,s2) up with skip
    concat, Conv-Drop-Conv per up level, 1x1 sigmoid head."""
    from tensorflow import keras
    from tensorflow.keras import layers

    inp = keras.Input((image_size, image_size, 1))
    widths = [base, base * 2, base * 4, base * 8, base * 16]
    drops = [0.1, 0.1, 0.2, 0.2, 0.3]
    x = inp
    skips = []
    for i, (wd, dr) in enumerate(zip(widths, drops)):
        x = layers.Conv2D(wd, 3, activation="relu", padding="same",
                          kernel_initializer="RandomNormal")(x)
        x = layers.Dropout(dr)(x)
        x = layers.Conv2D(wd, 3, activation="relu", padding="same",
                          kernel_initializer="RandomNormal")(x)
        x = layers.BatchNormalization(axis=-1)(x)
        if i < 4:
            skips.append(x)
            x = layers.MaxPooling2D((2, 2))(x)
    up_drops = [0.2, 0.2, 0.1, 0.1]
    for j, wd in enumerate(reversed(widths[:-1])):
        x = layers.Conv2DTranspose(wd, (2, 2), strides=(2, 2), padding="same")(x)
        x = layers.concatenate([x, skips[-(j + 1)]])
        x = layers.Conv2D(wd, 3, activation="relu", padding="same",
                          kernel_initializer="RandomNormal")(x)
        x = layers.Dropout(up_drops[j])(x)
        x = layers.Conv2D(wd, 3, activation="relu", padding="same",
                          kernel_initializer="RandomNormal")(x)
    out = layers.Conv2D(1, (1, 1), activation="sigmoid")(x)
    return keras.Model(inp, out)


class TestSpecSegH5Parity:
    def test_keras_h5_to_flax_end_to_end(self, tmp_path):
        from tensorflow import keras
        from shmgan_tpu.checkpoint import load_specseg_h5
        from shmgan_tpu.models import SpecSeg

        keras.backend.clear_session()  # reset layer-name counters (conv2d, ...)
        model = _build_keras_specseg(32, base=4)
        x = RNG.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
        theirs = model(x, training=False).numpy()

        path = str(tmp_path / "specseg.weights.h5")
        try:
            model.save_weights(path)
        except Exception:
            path = str(tmp_path / "specseg.h5")
            model.save(path)

        variables = load_specseg_h5(path)
        ours = np.asarray(SpecSeg(base_filters=4).apply(
            variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)

    def test_param_totals_match_keras(self):
        from tensorflow import keras
        keras.backend.clear_session()
        model = _build_keras_specseg(64, base=16)
        keras_total = model.count_params()
        # SpecSeg_summary.txt golden: 1,942,801
        assert keras_total == 1_942_801
