"""SHM Generator — CollaGAN-style mask-attentive U-Net (Flax linen, NHWC).

Capability parity with the reference's build_generator (ShmGANwithSSpecSeg.py:227-327):
  input  : (B, H, W, 2*c_dim) = c_dim Y-channel planes + c_dim one-hot label planes
  mask   : (B, H, W, 1) specular-highlight probability from SpecSeg — a REAL input
           here (the reference baked a zeros constant at graph-build time; SURVEY.md §2)
  output : (B, H, W, 1) single generated Y channel (leaky_relu head, :326)

Topology (N = filter_size, default 64):
  4 down levels: 2x[Conv3x3 s1 + leaky + InstanceNorm], AvgPool 2x2; N: 64->128->256->512
  bottleneck:    2x[Conv1x1 + leaky + InstanceNorm] at N=512            (:280-282)
  mask attention at each level's skip: skip_i + attn_i                   (:290-293)
  4 up levels:   ConvT3x3 s2 + concat(skip) + 2x[Conv3x3 + leaky + IN]  (:298-323)
  head:          Conv1x1 -> 1 channel, leaky_relu                        (:326)

Conv-parameter core matches the reference's Generator_summary.txt count of 18,525,569
(see tests/test_models.py); the instance-norm scale/offset and attention convs are
additional real parameters here (the reference's were untracked/constant — SURVEY.md §2
quirks, implemented in the paper-intended direction).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from shmgan_tpu.models.blocks import (
    ConvIN, ConvTransposeUp, InstanceNorm, MaskAttention, ResizeConvUp,
    avg_pool_2x2, leaky_relu, w_init,
)


class SHMGenerator(nn.Module):
    filter_size: int = 64
    c_dim: int = 5
    levels: int = 4
    dtype: Any = jnp.float32
    instance_norm_eps: float = 1e-6
    slope: float = 0.2
    in_pallas: bool = False
    # "conv_transpose" = reference parity (ShmGANwithSSpecSeg.py:298-319);
    # "resize_conv" = checkerboard-free alternative (same param count)
    upsample_mode: str = "conv_transpose"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        n = self.filter_size
        kw = dict(dtype=self.dtype, slope=self.slope, in_pallas=self.in_pallas)

        skips = []
        pooled = mask.astype(self.dtype)
        for lvl in range(self.levels):
            feats = n * (2 ** lvl)
            x = ConvIN(feats, eps=self.instance_norm_eps, name=f"down{lvl}_0", **kw)(x)
            x = ConvIN(feats, eps=self.instance_norm_eps, name=f"down{lvl}_1", **kw)(x)
            # Mask attention at this level's resolution: level 0 uses the full-res
            # mask (reference pool=False first call, :248); deeper levels pool 2x2.
            attn, pooled = MaskAttention(feats, pool=(lvl > 0), name=f"attn{lvl}",
                                         dtype=self.dtype, slope=self.slope)(pooled)
            skips.append(x + attn)
            x = avg_pool_2x2(x)

        nb = n * (2 ** (self.levels - 1))  # bottleneck width = 512 at defaults
        for i in range(2):
            x = ConvIN(nb, kernel=1, eps=self.instance_norm_eps,
                       name=f"bottleneck_{i}", **kw)(x)

        up_block = ResizeConvUp if self.upsample_mode == "resize_conv" \
            else ConvTransposeUp
        for ulvl in range(self.levels):
            feats = n * (2 ** (self.levels - 1 - ulvl))  # 512, 256, 128, 64
            x = up_block(feats, name=f"up{ulvl}_t", dtype=self.dtype, slope=self.slope)(x)
            x = jnp.concatenate([x, skips[self.levels - 1 - ulvl]], axis=-1)
            x = ConvIN(feats, eps=self.instance_norm_eps, name=f"up{ulvl}_0", **kw)(x)
            x = ConvIN(feats, eps=self.instance_norm_eps, name=f"up{ulvl}_1", **kw)(x)

        y = nn.Conv(1, (1, 1), padding="SAME", kernel_init=w_init(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="head")(x)
        return leaky_relu(y, self.slope)


def make_generator_input(y_channels: jnp.ndarray, target_onehot_planes: jnp.ndarray
                         ) -> jnp.ndarray:
    """Concatenate c_dim Y planes with c_dim one-hot label planes along channels.

    y_channels:           (B, H, W, c_dim)
    target_onehot_planes: (B, H, W, c_dim)
    Mirrors the reference's tf.concat([...Y..., ...labels...], axis=3)
    (ShmGANwithSSpecSeg.py:531, 590-594).
    """
    return jnp.concatenate([y_channels, target_onehot_planes], axis=-1)
