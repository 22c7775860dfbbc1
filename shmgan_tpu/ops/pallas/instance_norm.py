"""Pallas TPU kernel: fused instance normalization.

Instance norm dominates the non-conv memory traffic of the SHMGAN models: the
generator applies it after every conv (18 sites), and XLA's lowering at the
dominant full-resolution shape measures ~4.3 ms for (8,128,128,64) on v5e — far
off the HBM roofline. This kernel brings it to ~0.4 ms (10x) by:

  * lane-dense layout: the (B, H*W, C) activation is viewed as (B, R, 128) with
    R = H*W*C/128, so VMEM holds dense 128-wide lanes (a (.., C=64) block would be
    lane-padded 2x and, worse, dynamic HBM slices of lane-padded memrefs fail to
    lower in Mosaic);
  * manual DMA: one program per batch element copies its slab HBM->VMEM once,
    accumulates sum/sum-of-squares in row chunks (f32), derives per-channel
    scale/shift by folding the 128-lane partial sums back to C channels, applies
    them in place, and DMAs the slab back — exactly one HBM read + one write.
    (The automatic block pipeline over-allocates revolving buffers at large batch
    grids and blows the 16 MB VMEM budget.)

Channel folding: with C <= 128 (128 % C == 0) each 128-lane row holds 128/C
pixels' channel vectors -> per-channel stats fold the row-sums. With C >= 128
(C % 128 == 0) each pixel spans C/128 consecutive rows cyclically -> stats come
from group-strided row sums. Both directions are pure reshapes of the partials.

A custom VJP makes it trainable: the backward uses the saved statistics (same
traffic as XLA's backward; the net win is the forward's saved passes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
_LANES = 128
_CHUNK_ROWS = 2048  # rows per accumulation chunk — bounds kernel temporaries


def fits_vmem(h: int, w: int, c: int) -> bool:
    # two double-buffered slabs must fit the scoped-VMEM budget
    return 2 * h * w * c * 4 <= _VMEM_BUDGET_BYTES


def pallas_profitable(b: int, h: int, w: int, c: int) -> bool:
    """Shape gate from v5e A/B measurements (see DESIGN.md §6): XLA's instance-norm
    lowering falls off a cliff (~10x) at small-batch/large-spatial/c<=128 shapes
    ((8,128,128,64): 4076us vs 428us; (8,64,64,128): 4444us vs 444us) but is at or
    near roofline for larger batches and c>128, where the streaming kernel's
    serial compute loses. Winners in the data: c <= 128 and total bytes <= 32 MB."""
    return c <= _LANES and b * h * w * c * 4 <= 32 * 1024 * 1024


def _supported(n: int, c: int) -> bool:
    dense = (n * c) % _LANES == 0
    foldable = (c <= _LANES and _LANES % c == 0) or (c > _LANES and c % _LANES == 0)
    return dense and foldable


def _pick_chunk(n: int, multiple: int = 1) -> int:
    """Largest divisor of n that is <= _CHUNK_ROWS and a multiple of `multiple`."""
    cap = min(_CHUNK_ROWS, n)
    for cand in range(cap, 0, -1):
        if n % cand == 0 and cand % multiple == 0:
            return cand
    return n


def _kernel(x_hbm, gamma_ref, beta_ref, out_hbm, *, eps: float, c: int, nb: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = x_hbm.shape[1]                      # rows of 128 lanes per batch element
    groups = max(c // _LANES, 1)            # rows per pixel when c >= 128
    chunk = _pick_chunk(r, multiple=groups)
    steps = r // chunk
    # gamma/beta arrive pre-shaped (groups, 128): channels tiled across the lanes
    # for c < 128, grouped rows for c > 128.

    def body(scratch, in_sems, out_sems):
        # Double-buffered pipeline over the batch (single kernel invocation,
        # fori_loop): while slab i computes, slab i+1 streams in and slab i-1
        # streams out.
        def in_dma(idx, sl):
            return pltpu.make_async_copy(x_hbm.at[pl.ds(idx, 1)],
                                         scratch.at[pl.ds(sl, 1)],
                                         in_sems.at[sl])

        def out_dma(idx, sl):
            return pltpu.make_async_copy(scratch.at[pl.ds(sl, 1)],
                                         out_hbm.at[pl.ds(idx, 1)],
                                         out_sems.at[sl])

        in_dma(0, 0).start()

        def step_fn(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            # before prefetching into the other slot, drain its prior out-DMA
            @pl.when(jnp.logical_and(i + 1 < nb, i >= 1))
            def _():
                out_dma(i - 1, nxt).wait()

            @pl.when(i + 1 < nb)
            def _():
                in_dma(i + 1, nxt).start()

            in_dma(i, slot).wait()

            def accum(j, carry):
                s, s2 = carry
                xb = scratch[slot, pl.ds(j * chunk, chunk), :].astype(jnp.float32)
                if groups > 1:
                    # rows cycle through the c/128 channel groups (sublane split)
                    xg = xb.reshape(chunk // groups, groups, _LANES)
                    return (s + jnp.sum(xg, axis=0), s2 + jnp.sum(xg * xg, axis=0))
                return (s + jnp.sum(xb, axis=0, keepdims=True),
                        s2 + jnp.sum(xb * xb, axis=0, keepdims=True))

            zeros = jnp.zeros((groups, _LANES), jnp.float32)
            s, s2 = jax.lax.fori_loop(0, steps, accum, (zeros, zeros))

            # Fold duplicated channel copies (c < 128) by roll-doubling along
            # lanes: after log2(128/c) steps every lane holds its channel's
            # total. Mosaic has no cross-lane reshape, so this replaces
            # s.reshape(fold, c).sum(0) — and leaves the result already
            # replicated in the row pattern.
            shift_amt = c
            while shift_amt < _LANES:
                s = s + pltpu.roll(s, shift_amt, 1)
                s2 = s2 + pltpu.roll(s2, shift_amt, 1)
                shift_amt *= 2

            n_pix = (r * _LANES) // c
            mean = s / n_pix                    # (groups, 128), lane-replicated
            var = jnp.maximum(s2 / n_pix - mean * mean, 0.0)
            inv = jax.lax.rsqrt(var + eps)
            scale_g = inv * gamma_ref[...]
            shift_g = beta_ref[...] - mean * scale_g

            if groups > 1:
                reps = chunk // groups
                scale_rows = jnp.tile(scale_g, (reps, 1))
                shift_rows = jnp.tile(shift_g, (reps, 1))
            else:
                scale_rows = jnp.broadcast_to(scale_g, (chunk, _LANES))
                shift_rows = jnp.broadcast_to(shift_g, (chunk, _LANES))

            def write(j, _):
                xb = scratch[slot, pl.ds(j * chunk, chunk), :].astype(jnp.float32)
                scratch[slot, pl.ds(j * chunk, chunk), :] = (
                    xb * scale_rows + shift_rows).astype(scratch.dtype)
                return 0

            jax.lax.fori_loop(0, steps, write, 0)

            out_dma(i, slot).start()
            return 0

        jax.lax.fori_loop(0, nb, step_fn, 0)

        # drain: the last out-DMA (and the other slot's, if it exists)
        out_dma(nb - 1, (nb - 1) % 2).wait()
        if nb >= 2:
            out_dma(nb - 2, nb % 2).wait()

    pl.run_scoped(
        body,
        pltpu.VMEM((2, r, _LANES), x_hbm.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    )


def _pallas_instance_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                          eps: float) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    n = h * w
    if not (_supported(n, c) and fits_vmem(h, w, c)
            and pallas_profitable(b, h, w, c)):
        return instance_norm_reference(x, gamma, beta, eps)

    r = n * c // _LANES
    flat = x.reshape(b, r, _LANES)
    groups = max(c // _LANES, 1)
    if c < _LANES:  # channels tiled across the 128 lanes (the kernel's row pattern)
        gshaped = jnp.tile(gamma, _LANES // c).reshape(1, _LANES)
        bshaped = jnp.tile(beta, _LANES // c).reshape(1, _LANES)
    else:
        gshaped = gamma.reshape(groups, _LANES)
        bshaped = beta.reshape(groups, _LANES)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, c=c, nb=b),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # stays in HBM; DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, r, _LANES), x.dtype),
    )(flat, gshaped, bshaped)
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
