"""SpecSeg — specular-highlight segmentation U-Net (Flax linen, NHWC).

Capability parity with SpecSeg.py:27-98: a 5-level U-Net (16->32->64->128->256
filters), each level = Conv3x3(relu) + Dropout + Conv3x3(relu) [+ BatchNorm on the
contracting path], MaxPool 2x2 down, Conv2DTranspose kernel-2 stride-2 up with skip
concats, 1x1 sigmoid head. 1,942,801 params (992 non-trainable BN stats) per
SpecSeg_summary.txt — golden-tested in tests/test_models.py.

In the SHMGAN pipeline SpecSeg runs FROZEN (weights from specsegv3_chkpt.h5,
ShmGANwithSSpecSeg.py:930-931): inference mode, running BN stats, no dropout. Both
modes are supported so the network can also be (re)trained standalone; the dice+focal
losses the reference constructs (SpecSeg.py:92-96) live in train/losses.py.

Keras defaults replicated: kernel_initializer='RandomNormal' = N(0, 0.05); BatchNorm
momentum 0.99, eps 1e-3.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_DROPOUT = (0.1, 0.1, 0.2, 0.2, 0.3)  # per contracting level (SpecSeg.py:35-59)
_UP_DROPOUT = (0.2, 0.2, 0.1, 0.1)    # per expanding level (SpecSeg.py:64-86)


def _kinit():
    return nn.initializers.normal(stddev=0.05)


class _DoubleConv(nn.Module):
    features: int
    dropout: float
    batch_norm: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), padding="SAME", kernel_init=_kinit(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv0")(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", kernel_init=_kinit(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32,
                             name="bn")(x)
        return x


class SpecSeg(nn.Module):
    base_filters: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        n = self.base_filters
        widths = [n, n * 2, n * 4, n * 8, n * 16]  # 16..256

        skips = []
        for i, w in enumerate(widths[:-1]):
            x = _DoubleConv(w, _DROPOUT[i], batch_norm=True, dtype=self.dtype,
                            name=f"down{i}")(x, train=train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = _DoubleConv(widths[-1], _DROPOUT[-1], batch_norm=True, dtype=self.dtype,
                        name="bottom")(x, train=train)

        for j, w in enumerate(reversed(widths[:-1])):  # 128, 64, 32, 16
            x = nn.ConvTranspose(w, (2, 2), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"up{j}_t")(x)
            x = jnp.concatenate([x, skips[-(j + 1)]], axis=-1)
            x = _DoubleConv(w, _UP_DROPOUT[j], batch_norm=False, dtype=self.dtype,
                            name=f"up{j}")(x, train=train)

        x = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="head")(x)
        return nn.sigmoid(x.astype(jnp.float32))
