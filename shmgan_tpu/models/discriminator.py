"""SHM Discriminator — PatchGAN with class head and mask attention (Flax, NHWC).

Capability parity with build_discriminator (ShmGANwithSSpecSeg.py:342-389):
  input : (B, H, W, 3) RGB
  mask  : (B, H, W, 1) specular mask (real input here; constant in the reference)
  out   : (patch real/fake map (B, H/32, W/32, 1), class logits (B, c_dim))

Pipeline: GaussianNoise(0.1) [train only] -> 5x [Conv3x3 s2 no-bias + leaky + IN]
with widths N..16N -> mask attention (mask pooled 16x16) added after the 8N block
(:358-359) -> Dropout(0.2) [train only] -> two heads: Conv3x3 no-bias leaky patch map
(:365-369) and Dense(c_dim) no-bias on the flattened 16N features (:371-375).

Conv/dense parameter count matches Discriminator_summary.txt = 6,359,744 exactly for
image_size=128 (tests/test_models.py); instance-norm and attention params are
additional (SURVEY.md §2 quirks).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from shmgan_tpu.models.blocks import (
    ConvLReLUIN, MaskAttention, leaky_relu, w_init,
)


class SHMDiscriminator(nn.Module):
    filter_size: int = 64
    c_dim: int = 5
    dtype: Any = jnp.float32
    instance_norm_eps: float = 1e-6
    slope: float = 0.2
    noise_stddev: float = 0.1
    dropout_rate: float = 0.2
    in_pallas: bool = False

    @nn.compact
    def __call__(self, img: jnp.ndarray, mask: jnp.ndarray, *,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = self.filter_size
        x = img.astype(self.dtype)

        if train and self.noise_stddev > 0:
            # GaussianNoise(0.1) — active only on training-mode calls (reference D1/D2
            # forwards use training=True; D3/D4 use training=False, :559-563,627-642).
            rng = self.make_rng("noise")
            x = x + self.noise_stddev * jax.random.normal(rng, x.shape, x.dtype)

        widths = (n, n * 2, n * 4, n * 8)
        for i, w in enumerate(widths):
            x = ConvLReLUIN(w, dtype=self.dtype, slope=self.slope,
                            eps=self.instance_norm_eps, name=f"block{i}",
                            in_pallas=self.in_pallas)(x)

        # Mask attention at the 8N feature resolution: the mask is pooled 16x16 from
        # full res (reference poolsize=(16,16), :358), matching H/16 == feature H/16?
        # After 4 stride-2 blocks the features are at H/16 — the pooled mask aligns.
        attn, _ = MaskAttention(n * 8, pool=True, pool_size=16, dtype=self.dtype,
                                slope=self.slope, name="attn")(mask.astype(self.dtype))
        x = x + attn

        x = ConvLReLUIN(n * 16, dtype=self.dtype, slope=self.slope,
                        eps=self.instance_norm_eps, name="block4",
                        in_pallas=self.in_pallas)(x)

        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)

        real_fake = nn.Conv(1, (3, 3), strides=(1, 1), padding="SAME", use_bias=False,
                            kernel_init=w_init(), dtype=self.dtype,
                            param_dtype=jnp.float32, name="out_realfake")(x)
        real_fake = leaky_relu(real_fake, self.slope)

        flat = x.reshape(x.shape[0], -1)
        logits = nn.Dense(self.c_dim, use_bias=False, kernel_init=w_init(),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="out_class")(flat)
        return real_fake.astype(jnp.float32), logits.astype(jnp.float32)
