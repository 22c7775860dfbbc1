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

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from shmgan_tpu.config import Config
from shmgan_tpu.ops.color import rgb_to_yuv, yuv_to_rgb
from shmgan_tpu.ops.standardize import per_image_standardization
from shmgan_tpu.train.state import build_models


def make_infer_fn(cfg: Config, with_cyclic: bool = False):
    """Build fn(g_params, specseg_vars, rgb) -> dict of outputs (jit-compiled).

    Outputs:
      gen_rgb  : (B,H,W,3) specular-free RGB in standardized-YUV scale
                 (the reference's self.gen_rgb, test.py:250 — the tensor used for
                 metrics at test.py:336-347)
      gen_rgb_denorm : gen_rgb de-normalized by the per-image stddev scale and x255
                 (the reference's gen_rgb_output, test.py:249, which uses a running
                 MEAN of stddevs — here the image's own stddev: honest per-image
                 version, identical at the first image)
      gen_rgb_calibrated : exact inverse of the input standardization; [0,1] RGB
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

    @jax.jit
    def infer(g_params, specseg_vars, rgb: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b, h, w, _ = rgb.shape
        yuv, stats = per_image_standardization(rgb_to_yuv(rgb))
        y = yuv[..., 0:1]
        cbcr = yuv[..., 1:]

        mask = specseg.apply(specseg_vars, y, train=False)

        zeros = jnp.zeros((b, h, w, 1), jnp.float32)
        y_planes = jnp.concatenate([y] + [zeros] * (c_dim - 1), axis=-1)
        labels = jnp.zeros((b, h, w, c_dim), jnp.float32).at[..., c_dim - 1].set(1.0)
        gen_input = jnp.concatenate([y_planes, labels], axis=-1)

        gen_y = gen.apply({"params": g_params}, gen_input, mask)
        gen_yuv = jnp.concatenate([gen_y, cbcr], axis=-1)
        gen_rgb = yuv_to_rgb(gen_yuv)
        scale = stats.stddev.reshape(-1, 1, 1, 1)
        denorm = yuv_to_rgb(gen_yuv * scale * 255.0)
        # exact inverse of the input standardization (÷stddev): the calibrated
        # output lives in the input's [0,1] RGB domain and is directly comparable
        # to ground truth — the reference never closes this loop (its metrics run
        # on the standardized-scale gen_rgb, test.py:336-347, and its preview
        # multiplies by a global running-mean stddev ×255, test.py:246-249).
        calibrated = jnp.clip(yuv_to_rgb(gen_yuv * scale), 0.0, 1.0)

        # Mask-composited deliverable: copy the input verbatim outside the
        # specular regions and use the generated reconstruction inside them
        # (mask slightly dilated + softened so highlight skirts are covered).
        # Outside the highlights the input IS the diffuse image, so compositing
        # preserves it exactly — the practical specular-removal output the
        # reference's mask-attention design gestures at but never assembles
        # (its preview is the raw generator tensor, test.py:246-250).
        m = lax.reduce_window(mask, -jnp.inf, lax.max, (1, 5, 5, 1),
                              (1, 1, 1, 1), "SAME")        # 5x5 dilation
        m = lax.reduce_window(m, 0.0, lax.add, (1, 5, 5, 1),
                              (1, 1, 1, 1), "SAME") / 25.0  # box soften
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

        return out

    return infer


def make_mask_fn(cfg: Config):
    """SpecSeg-only inference: RGB -> specular mask (BASELINE config 1)."""
    _gen, _disc, specseg = build_models(cfg)

    @jax.jit
    def mask_fn(specseg_vars, rgb: jnp.ndarray) -> jnp.ndarray:
        yuv, _ = per_image_standardization(rgb_to_yuv(rgb))
        return specseg.apply(specseg_vars, yuv[..., 0:1], train=False)

    return mask_fn
