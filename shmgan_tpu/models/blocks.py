"""Shared model blocks (Flax linen, NHWC).

Rebuilt from the behaviors of the reference graph builders
(ShmGANwithSSpecSeg.py:227-450), not translated: every block is a pure function of
explicit inputs — in particular the specular mask is a real input tensor, fixing the
reference's build-time-capture quirk where the attention branch consumed a zeros
constant (ShmGANwithSSpecSeg.py:206,248-275,358; SURVEY.md §2 "mask-attention module").

Conventions shared with the reference:
  - leaky_relu with alpha=0.2 (tf.nn.leaky_relu default)
  - DCGAN init N(0, 0.02) for conv kernels (ShmGANwithSSpecSeg.py:200)
  - InstanceNormalization(axis=-1, eps=1e-6, center=True, scale=True) with the
    reference's quirky beta_initializer = N(0, 0.02) (ShmGANwithSSpecSeg.py:245)
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

INIT_STDDEV = 0.02


def w_init(stddev: float = INIT_STDDEV):
    return nn.initializers.normal(stddev=stddev)


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=slope)


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """AveragePooling2D(pool=2, padding='same') — H,W are even everywhere here."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")


def max_pool(x: jnp.ndarray, size: int) -> jnp.ndarray:
    return nn.max_pool(x, (size, size), strides=(size, size), padding="SAME")


class InstanceNorm(nn.Module):
    """Per-instance, per-channel normalization over spatial dims.

    Equivalent to tfa.layers.InstanceNormalization(axis=-1, epsilon=eps, center=True,
    scale=True). The reference passes beta_initializer=N(0,0.02); replicated. Note the
    reference's built Keras graphs did NOT actually track these gamma/beta variables
    (SURVEY.md §2 quirks; G/D summary param counts exclude them) — here they are real
    trainable parameters, matching the tfa layer's intent.

    use_pallas selects the fused single-read TPU kernel
    (ops/pallas/instance_norm.py) when the activation fits VMEM; identical math.
    """
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", w_init(), (c,), jnp.float32)
        if self.use_pallas:
            from shmgan_tpu.ops.pallas.instance_norm import (
                fits_vmem, instance_norm_pallas,
            )
            if fits_vmem(*x.shape[1:]):
                return instance_norm_pallas(x, gamma, beta, self.eps
                                            ).astype(self.dtype)
        # Normalize in f32 for stability regardless of compute dtype.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * gamma + beta
        return y.astype(self.dtype)


class ConvIN(nn.Module):
    """Conv3x3 stride-1 (leaky_relu) + InstanceNorm — the generator's inner block
    (ShmGANwithSSpecSeg.py:244-245 and every down/up level)."""
    features: int
    kernel: int = 3
    dtype: Dtype = jnp.float32
    slope: float = 0.2
    eps: float = 1e-6
    in_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=(1, 1),
                    padding="SAME", kernel_init=w_init(), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = leaky_relu(x, self.slope)
        x = InstanceNorm(eps=self.eps, dtype=self.dtype, name="inorm",
                         use_pallas=self.in_pallas)(x)
        return x


class ConvLReLUIN(nn.Module):
    """Conv3x3 stride-2, no bias, leaky_relu + InstanceNorm — the discriminator's
    strided block (ShmGANwithSSpecSeg.py:385-389)."""
    features: int
    dtype: Dtype = jnp.float32
    slope: float = 0.2
    eps: float = 1e-6
    in_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, kernel_init=w_init(), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = leaky_relu(x, self.slope)
        x = InstanceNorm(eps=self.eps, dtype=self.dtype, name="inorm",
                         use_pallas=self.in_pallas)(x)
        return x


class MaskAttention(nn.Module):
    """Two Conv3x3(leaky_relu) layers over a (pooled) specular mask
    (ShmGANwithSSpecSeg.py:403-412).

    Returns (attention features, pooled mask) so callers can chain progressively
    pooled masks down the U-Net levels, exactly like the reference's
    `attention_layer(spec=pooled, ...)` chain — but with the mask as a live input.
    """
    features: int
    pool: bool = True
    pool_size: int = 2
    dtype: Dtype = jnp.float32
    slope: float = 0.2

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pooled = max_pool(mask, self.pool_size) if self.pool else mask
        a = nn.Conv(self.features, (3, 3), padding="SAME", kernel_init=w_init(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv0")(pooled)
        a = leaky_relu(a, self.slope)
        a = nn.Conv(self.features, (3, 3), padding="SAME", kernel_init=w_init(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(a)
        a = leaky_relu(a, self.slope)
        return a, pooled


class ConvTransposeUp(nn.Module):
    """Conv2DTranspose kernel-3 stride-2 'same' with leaky_relu — the generator's
    upsampling step (ShmGANwithSSpecSeg.py:298,305,312,319).

    Keras Conv2DTranspose(padding='same', strides=2) produces exactly 2x spatial;
    flax nn.ConvTranspose with padding='SAME' matches for even sizes.
    """
    features: int
    dtype: Dtype = jnp.float32
    slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2), padding="SAME",
                             kernel_init=w_init(), dtype=self.dtype,
                             param_dtype=jnp.float32, name="convt")(x)
        return leaky_relu(x, self.slope)


class ResizeConvUp(nn.Module):
    """Nearest-resize 2x + Conv3x3 + leaky_relu — the checkerboard-free
    alternative to ConvTransposeUp (Odena et al., "Deconvolution and
    Checkerboard Artifacts", distill.pub/2016/deconv-checkerboard).

    The round-2 quality run showed residual ConvTranspose checkerboard inside
    reconstructed highlight regions; this block is the documented
    intent-over-accident alternative (model.upsample_mode="resize_conv",
    default stays "conv_transpose" = reference parity,
    ShmGANwithSSpecSeg.py:298-319). Parameter count is identical to the
    transposed conv (3x3xCinxCout + Cout), so the conv-core parity goldens
    hold under either mode.

    The inner conv is deliberately named "convt" (same as ConvTransposeUp's
    transposed conv): kernel shapes match (3,3,Cin,Cout), so the two modes
    share one param-tree structure and checkpoints are interchangeable — a
    conv_transpose-trained checkpoint can warm-start a resize_conv fine-tune.
    """
    features: int
    dtype: Dtype = jnp.float32
    slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        x = nn.Conv(self.features, (3, 3), padding="SAME", kernel_init=w_init(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="convt")(x)
        return leaky_relu(x, self.slope)


class SAGANAttention(nn.Module):
    """SAGAN-style spatial self-attention (ShmGANwithSSpecSeg.py:417-450).

    Defined-but-never-called in the reference's built models; provided here as a real,
    batch-aware module for parity of capability. Query/key at C/8, full-rank value,
    learnable scalar gamma initialized to 0 (the reference's `self.gamma` :209).
    The attention matmuls are (HW x HW) GEMMs — MXU-friendly at the pooled
    resolutions this is meant for.
    """
    features: int
    pool: bool = True
    pool_size: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.pool:
            x = max_pool(x, self.pool_size)
        b, h, w, _ = x.shape
        cq = max(self.features // 8, 1)
        f = nn.Conv(cq, (1, 1), kernel_init=w_init(), dtype=self.dtype,
                    param_dtype=jnp.float32, name="f")(x)
        g = nn.Conv(cq, (1, 1), kernel_init=w_init(), dtype=self.dtype,
                    param_dtype=jnp.float32, name="g")(x)
        hval = nn.Conv(self.features, (1, 1), kernel_init=w_init(), dtype=self.dtype,
                       param_dtype=jnp.float32, name="h")(x)
        fq = f.reshape(b, h * w, cq)
        gq = g.reshape(b, h * w, cq)
        hv = hval.reshape(b, h * w, self.features)
        energy = jnp.einsum("bic,bjc->bij", gq, fq)
        attention = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bij,bjc->bic", attention, hv).reshape(b, h, w, self.features)
        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        return gamma * out + x, attention
