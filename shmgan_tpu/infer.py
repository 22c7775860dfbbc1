"""Single-RGB specular-free inference — ONE compiled graph, zero host round-trips.

Capability parity with the reference test path (test.py:195-297), which per image:
standardizes on device, round-trips through keras SpecSeg.predict on the host
(test.py:221), builds the generator input, runs G, re-attaches the input's own CbCr,
converts back to RGB, then runs 5 diagnostic cyclic G passes (CONFIG B,
test.py:260-284). Here the whole chain — SpecSeg mask -> G -> (optionally 5 cyclic
passes batched as ONE (5B) G call) — is a single jit (BASELINE configs 1-2).

Input contract: RGB in [0,1], (B, H, W, 3). The input image plays the I0 role; the
remaining Y channels are zero and the target label is ED (test.py:227-235).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from shmgan_tpu.config import Config
from shmgan_tpu.ops.color import rgb_to_yuv, yuv_to_rgb
from shmgan_tpu.ops.specprior import (chroma_prior, fuse_mask_prior,
                                      specseg_net_input)
from shmgan_tpu.ops.standardize import per_image_standardization
from shmgan_tpu.train.state import build_models


def fit_affine_luma(gen_y: jnp.ndarray, y_ref: jnp.ndarray,
                    weight: jnp.ndarray):
    """Per-image weighted least-squares affine fit a*gen_y + b ~= y_ref.

    weight (B,H,W,1) in [0,1] selects the trustworthy pixels (non-specular,
    where the input equals the diffuse scene). Returns (a, b) of shape
    (B,1,1,1). Degenerate weights (everything masked, or constant gen_y)
    fall back to the identity fit (a=1, b=0); a drift-free generator fits
    (1, 0) exactly, so applying the fit is a no-op on perfect outputs.
    """
    sw = jnp.sum(weight, axis=(1, 2, 3), keepdims=True)
    sx = jnp.sum(weight * gen_y, axis=(1, 2, 3), keepdims=True)
    sy = jnp.sum(weight * y_ref, axis=(1, 2, 3), keepdims=True)
    sxx = jnp.sum(weight * gen_y * gen_y, axis=(1, 2, 3), keepdims=True)
    sxy = jnp.sum(weight * gen_y * y_ref, axis=(1, 2, 3), keepdims=True)
    det = sw * sxx - sx * sx
    ok = (det > 1e-6) & (sw > 1.0)
    a = jnp.where(ok, (sw * sxy - sx * sy) / jnp.where(ok, det, 1.0), 1.0)
    b = jnp.where(ok, (sy - a * sx) / jnp.where(ok, sw, 1.0), 0.0)
    return a, b


def _tta_views(x: jnp.ndarray) -> list:
    """Dihedral test-time-augmentation views of (B, H, W, C): the 4 flip
    combinations always, plus the 4 transposed ones when H == W (shapes are
    static under jit, so the branch resolves at trace time)."""
    views = [x, x[:, :, ::-1], x[:, ::-1], x[:, ::-1, ::-1]]
    if x.shape[1] == x.shape[2]:
        xt = jnp.swapaxes(x, 1, 2)
        views += [xt, xt[:, :, ::-1], xt[:, ::-1], xt[:, ::-1, ::-1]]
    return views


_TTA_INVERSES = (
    lambda v: v,
    lambda v: v[:, :, ::-1],
    lambda v: v[:, ::-1],
    lambda v: v[:, ::-1, ::-1],
    lambda v: jnp.swapaxes(v, 1, 2),
    lambda v: jnp.swapaxes(v[:, :, ::-1], 1, 2),
    lambda v: jnp.swapaxes(v[:, ::-1], 1, 2),
    lambda v: jnp.swapaxes(v[:, ::-1, ::-1], 1, 2),
)


def _specseg_mask(specseg, specseg_vars, y: jnp.ndarray,
                  tta: bool) -> jnp.ndarray:
    """Specular mask from standardized luma; tta averages the net's
    probabilities over the dihedral views (one k*B-batched forward — a single
    conv pass, not k dispatches). Standardization is flip/transpose-invariant,
    so augmenting after it is exact.

    Why: SpecSeg trained on the synthetic curriculum carries orientation-
    specific biases that show up on real photographs (round-3 OOD artifact:
    mask IoU 0.179 on the reference figure's photos); symmetrizing the
    predictor removes the orientation component of that error for ~k x the
    (tiny) SpecSeg forward cost."""
    if not tta:
        return specseg.apply(specseg_vars, y, train=False)
    views = _tta_views(y)
    b = y.shape[0]
    stacked = specseg.apply(specseg_vars, jnp.concatenate(views), train=False)
    parts = [inv(stacked[i * b:(i + 1) * b])
             for i, inv in enumerate(_TTA_INVERSES[:len(views)])]
    return sum(parts) / float(len(views))


def make_infer_fn(cfg: Config, with_cyclic: bool = False, outputs=None,
                  data_parallel: int = 1):
    """Build fn(g_params, specseg_vars, rgb) -> dict of outputs (jit-compiled).

    outputs: optional iterable of output keys to return. The graph only
    materializes what is returned — XLA dead-code-eliminates the pruned
    branches (e.g. serving asks for ("gen_rgb_calibrated", "mask") and never
    pays for denorm/composited HBM writes). None returns everything.

    data_parallel > 1 shards the BATCH axis over the first n devices of a
    1-D mesh (weights replicated, outputs batch-sharded) — the scale-out
    batch-serving path. Inference has no cross-image interaction, so DP is
    embarrassingly parallel: XLA inserts no collectives and per-chip work is
    exactly batch/n. The batch must divide data_parallel.

    Outputs:
      gen_rgb  : (B,H,W,3) specular-free RGB in standardized-YUV scale
                 (the reference's self.gen_rgb, test.py:250 — the tensor used for
                 metrics at test.py:336-347)
      gen_rgb_denorm : gen_rgb de-normalized by the per-image stddev scale and x255
                 (the reference's gen_rgb_output, test.py:249, which uses a running
                 MEAN of stddevs — here the image's own stddev: honest per-image
                 version, identical at the first image)
      gen_rgb_calibrated : luma-refit (affine fit to the input's non-specular
                 pixels) + exact inverse of the input standardization; [0,1] RGB
      gen_rgb_composited : mask-composited deliverable — input outside the
                 (dilated, softened) specular mask, calibrated reconstruction
                 inside it
      mask     : (B,H,W,1) SpecSeg specular mask
      gen_y    : (B,H,W,1) generated Y channel
      cyc_rgb  : (5,B,H,W,3) diagnostic cyclic reconstructions (CONFIG B) when
                 with_cyclic
    """
    gen, _disc, specseg = build_models(cfg)
    c_dim = cfg.model.c_dim
    known = {"gen_rgb", "gen_rgb_denorm", "gen_rgb_calibrated",
             "gen_rgb_composited", "mask", "gen_y"}
    if with_cyclic:
        known.add("cyc_rgb")
    if outputs is not None:
        outputs = tuple(outputs)
        unknown = set(outputs) - known
        if unknown:
            raise ValueError(f"unknown infer outputs {sorted(unknown)}; "
                             f"known: {sorted(known)}")

    jit_kwargs = {}
    if data_parallel > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        if data_parallel > len(devs):
            raise ValueError(f"data_parallel={data_parallel} but only "
                             f"{len(devs)} devices visible")
        mesh = Mesh(np.array(devs[:data_parallel]), ("dp",))
        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("dp"))
        final_keys = outputs if outputs is not None else tuple(sorted(known))
        out_sh = {k: (NamedSharding(mesh, P(None, "dp")) if k == "cyc_rgb"
                      else bsh) for k in final_keys}
        jit_kwargs = dict(in_shardings=(repl, repl, bsh), out_shardings=out_sh)

    @partial(jax.jit, **jit_kwargs)
    def infer(g_params, specseg_vars, rgb: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b, h, w, _ = rgb.shape
        yuv, stats = per_image_standardization(rgb_to_yuv(rgb))
        y = yuv[..., 0:1]
        cbcr = yuv[..., 1:]

        # in_channels=2 feeds the chroma prior as a learned input channel
        # (chroma-trained nets); independent of the output-mean fusion below
        net_in = specseg_net_input(y, rgb, cfg.model.specseg_in_channels)
        mask = _specseg_mask(specseg, specseg_vars, net_in, cfg.eval.mask_tta)
        if cfg.eval.mask_chroma_prior:
            # dichromatic physics cue the luma-only net cannot see
            # (ops/specprior.py; +26% real-photo mask IoU, no domain regressed)
            mask = fuse_mask_prior(mask, chroma_prior(rgb))

        zeros = jnp.zeros((b, h, w, 1), jnp.float32)
        y_planes = jnp.concatenate([y] + [zeros] * (c_dim - 1), axis=-1)
        labels = jnp.zeros((b, h, w, c_dim), jnp.float32).at[..., c_dim - 1].set(1.0)
        gen_input = jnp.concatenate([y_planes, labels], axis=-1)

        gen_y = gen.apply({"params": g_params}, gen_input, mask)
        gen_yuv = jnp.concatenate([gen_y, cbcr], axis=-1)
        gen_rgb = yuv_to_rgb(gen_yuv)
        scale = stats.stddev.reshape(-1, 1, 1, 1)
        denorm = yuv_to_rgb(gen_yuv * scale * 255.0)

        # dilated + softened specular mask (used by the luma refit below and
        # by the composited output)
        m = lax.reduce_window(mask, -jnp.inf, lax.max, (1, 5, 5, 1),
                              (1, 1, 1, 1), "SAME")        # 5x5 dilation
        m = lax.reduce_window(m, 0.0, lax.add, (1, 5, 5, 1),
                              (1, 1, 1, 1), "SAME") / 25.0  # box soften

        # Luma refit (round-3 calibration): outside the specular mask the input
        # already IS the diffuse scene, so any generator deviation there is pure
        # reconstruction drift (a global haze/brightness shift — measured in
        # round 2 as gen_calibrated deltaE76 7.26 vs identity 5.63). Fit the
        # per-image affine (a, b) minimizing sum_w |a*gen_y + b - y_in|^2 over
        # NON-mask pixels (closed form, in-graph, no ground truth used) and
        # apply it to the whole generated luma. A drift-free generator fits
        # a=1, b=0 exactly, so this is a no-op on perfect reconstructions.
        # The reference never closes this loop at all (its preview multiplies
        # by a global running-mean stddev x255, test.py:246-250).
        w_nm = jnp.clip(1.0 - m, 0.0, 1.0)
        a_fit, b_fit = fit_affine_luma(gen_y, y, w_nm)
        cal_y = a_fit * gen_y + b_fit
        cal_yuv = jnp.concatenate([cal_y, cbcr], axis=-1)

        # calibrated output: luma refit + exact inverse of the input
        # standardization (÷stddev) — lives in the input's [0,1] RGB domain and
        # is directly comparable to ground truth.
        calibrated = jnp.clip(yuv_to_rgb(cal_yuv * scale), 0.0, 1.0)

        # Mask-composited deliverable: copy the input verbatim outside the
        # specular regions and use the generated reconstruction inside them
        # (mask slightly dilated + softened so highlight skirts are covered).
        # Outside the highlights the input IS the diffuse image, so compositing
        # preserves it exactly — the practical specular-removal output the
        # reference's mask-attention design gestures at but never assembles
        # (its preview is the raw generator tensor, test.py:246-250).
        composited = m * calibrated + (1.0 - m) * rgb

        out = {"gen_rgb": gen_rgb, "gen_rgb_denorm": denorm,
               "gen_rgb_calibrated": calibrated,
               "gen_rgb_composited": composited, "mask": mask, "gen_y": gen_y}

        if with_cyclic:
            # CONFIG B (test.py:260-264): every non-target channel carries the
            # generated image's OWN Y channel (from gen_rgb), target channel zeroed.
            orig_y = gen_rgb[..., 0:1]
            cyc_inputs = []
            for i in range(c_dim):
                planes = jnp.concatenate([orig_y] * c_dim, axis=-1)
                planes = planes.at[..., i].set(0.0)
                onehot = jnp.zeros((b, h, w, c_dim), jnp.float32).at[..., i].set(1.0)
                cyc_inputs.append(jnp.concatenate([planes, onehot], axis=-1))
            cyc_stack = jnp.concatenate(cyc_inputs, axis=0)
            mask_v = jnp.tile(mask, (c_dim, 1, 1, 1))
            cyc_y = gen.apply({"params": g_params}, cyc_stack, mask_v)
            cyc_y = cyc_y.reshape(c_dim, b, h, w, 1)
            cyc_yuv = jnp.concatenate(
                [cyc_y, jnp.broadcast_to(cbcr, (c_dim, b, h, w, 2))], axis=-1)
            out["cyc_rgb"] = yuv_to_rgb(cyc_yuv)

        if outputs is not None:
            # returning a subset is what actually prunes the graph: XLA DCEs
            # every op feeding only the dropped keys
            out = {k: out[k] for k in outputs}
        return out

    return infer


def bucket_shape(h: int, w: int, multiple: int = 16, bucket: int = 64):
    """Round (h, w) up to the compile-cache bucket.

    SpecSeg's U-Net pools 2x2 four times, so spatial extents must be divisible
    by `multiple`=16 (the generator's two pools are subsumed). `bucket` rounds
    further up so arbitrary photo sizes land on a small set of padded shapes —
    each distinct shape is one XLA compilation (minutes over this deployment's
    relay), so a 1013x757 and a 1024x760 photo share one executable at
    bucket=64. bucket must itself be a multiple of `multiple`.
    """
    if bucket % multiple != 0:
        raise ValueError(f"bucket {bucket} must be a multiple of {multiple}")
    import math
    return (max(bucket, math.ceil(h / bucket) * bucket),
            max(bucket, math.ceil(w / bucket) * bucket))


def pad_to_bucket(rgb, multiple: int = 16, bucket: int = 64):
    """Reflect-pad (B, h, w, 3) up to its compile-cache bucket shape.

    Returns (rgb_padded, (h, w)). Reflection keeps the per-image
    standardization statistics representative (an edge smear or zero fill
    would bias stats.stddev, which scales the calibrated output). Shared by
    make_native_infer_fn and the HTTP front-end — the latter pads in the
    REQUEST thread so concurrent requests landing in the same bucket share
    one exact shape and can batch into a single device call."""
    import numpy as np

    rgb = np.asarray(rgb, np.float32)
    _, h, w, _ = rgb.shape
    ph, pw = bucket_shape(h, w, multiple=multiple, bucket=bucket)
    if (ph, pw) == (h, w):
        return rgb, (h, w)
    # numpy reflect requires pad < dim; fall back to edge replication for
    # the (tiny-image, big-bucket) corner
    mode = "reflect" if (ph - h) < h and (pw - w) < w else "edge"
    return np.pad(rgb, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)),
                  mode=mode), (h, w)


def make_native_infer_fn(cfg: Config, with_cyclic: bool = False,
                         multiple: int = 16, bucket: int = 64, outputs=None,
                         data_parallel: int = 1):
    """Arbitrary-resolution inference: fn(g_params, specseg_vars, rgb) with rgb
    (B, h, w, 3) at ANY h, w — no square resize.

    The reference's test path force-resizes every photograph to image_size
    (test.py:81-94 via its 256x256 dataset loader), destroying detail and
    aspect ratio. G and SpecSeg are fully convolutional (the 128->256 warm
    start transfers every conv leaf), so the only real constraint is
    divisibility for the U-Net's pooling — handled here by reflect-padding up
    to the bucketed shape and cropping every output back. Reflection keeps the
    per-image standardization statistics representative (an edge smear or zero
    fill would bias stats.stddev, which scales the calibrated output).

    Returns numpy arrays (host-side crop); batches must share one (h, w).
    """
    import numpy as np

    infer = make_infer_fn(cfg, with_cyclic=with_cyclic, outputs=outputs,
                          data_parallel=data_parallel)

    def run(g_params, specseg_vars, rgb) -> Dict[str, "np.ndarray"]:
        rgb_p, (h, w) = pad_to_bucket(rgb, multiple=multiple, bucket=bucket)
        out = infer(g_params, specseg_vars, jnp.asarray(rgb_p))
        cropped = {}
        for k, v in out.items():
            a = np.asarray(v)
            # spatial axes are always the two before the channel axis
            # ((B,H,W,C) and cyc's (5,B,H,W,C))
            cropped[k] = a[..., :h, :w, :]
        return cropped

    return run


def make_mask_fn(cfg: Config, tta: bool = False, prior: bool = None):
    """SpecSeg-only inference: RGB -> specular mask (BASELINE config 1).
    tta=True symmetrizes over the dihedral views (see _specseg_mask);
    prior fuses the dichromatic chroma prior (ops/specprior.py), defaulting
    to cfg.eval.mask_chroma_prior."""
    _gen, _disc, specseg = build_models(cfg)
    if prior is None:
        prior = cfg.eval.mask_chroma_prior

    @jax.jit
    def mask_fn(specseg_vars, rgb: jnp.ndarray) -> jnp.ndarray:
        yuv, _ = per_image_standardization(rgb_to_yuv(rgb))
        net_in = specseg_net_input(yuv[..., 0:1], rgb,
                                   cfg.model.specseg_in_channels)
        mask = _specseg_mask(specseg, specseg_vars, net_in, tta)
        if prior:
            mask = fuse_mask_prior(mask, chroma_prior(rgb))
        return mask

    return mask_fn
