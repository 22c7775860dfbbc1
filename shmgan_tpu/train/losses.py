"""The SHMGAN loss zoo (pure functions over batched arrays).

Replicates the loss block of the reference train_step (ShmGANwithSSpecSeg.py:653-844)
term by term, with identical weights and identical included/EXCLUDED terms:

  G adversarial (LSGAN)      :669-679   (sum of 5 cyclic + 1 generated, /6)
  G classification (CE)      :695-704
  D classification (CE)      :709-714
  D adversarial (LSGAN)      :721-728   (note D2 term double-counted into D4 sum :728)
  cyclic L1 (RGB)            :744-751   (ED term x10)
  cyclic SSIM log-loss (YUV) :759-779   (per-channel gated on the input-dropout draws,
                                         ED term x10 INSIDE the /5 — replicated)
  masked specular MSE        :792-806   (computed but EXCLUDED from totals :833,841)
  NST content+style          :814-826   (content vs I0 yuv; style grams vs ED yuv)
  totals                     :829-844

All reductions are means over full tensors (batch included), which equals the
reference exactly at batch=1 and generalizes to batch means for B>1.

Also provides dice / categorical-focal losses for standalone SpecSeg training
(SpecSeg.py:92-96 constructs these via segmentation_models and discards them).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from shmgan_tpu.ops.polar import gram_matrix
from shmgan_tpu.ops.ssim import ssim as ssim_fn
from shmgan_tpu.ops.standardize import rescale_01_per_image


def lsgan_to_target(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """mean((pred - target)^2) — LSGAN squared difference to a (smoothed) label."""
    return jnp.mean(jnp.square(pred - target))


def lsgan_to_zero(pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred))


def softmax_ce(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """tf.nn.softmax_cross_entropy_with_logits, meaned over batch.

    labels may be unnormalized (the reference feeds a smoothed one-hot whose sum is
    TARGET_LABELS ~ U[0.8,1.2]); replicated: CE = -sum(labels * log_softmax(logits)).
    """
    return jnp.mean(-jnp.sum(labels * jax.nn.log_softmax(logits, axis=-1), axis=-1))


def masked_mse(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean((a*mask - b*mask)^2) (ShmGANwithSSpecSeg.py:792-796)."""
    return jnp.mean(jnp.square(a * mask - b * mask))


def nst_loss(cyc_ed_yuv: jnp.ndarray, i0_yuv: jnp.ndarray, ed_yuv: jnp.ndarray,
             image_size: int, style_weight: float = 100.0,
             content_weight: float = 1.0) -> Dict[str, jnp.ndarray]:
    """Neural-style-transfer loss (ShmGANwithSSpecSeg.py:814-826).

    content = mean((cyc_ED - I0_yuv)^2); style = factor * mean((G(cyc_ED)-G(ED_yuv))^2)
    with factor = 1 / (2 * 9 * H * W)^2.
    """
    content = jnp.mean(jnp.square(cyc_ed_yuv - i0_yuv))
    factor = jnp.float32(1.0 / (2.0 * 9.0 * image_size * image_size) ** 2)
    style = factor * jnp.mean(jnp.square(gram_matrix(cyc_ed_yuv) - gram_matrix(ed_yuv)))
    total = style_weight * style + content_weight * content
    return {"content": content, "style": style, "nst": total}


class GanLossInputs(NamedTuple):
    """Everything the loss block consumes. Shapes: B=batch, V=c_dim views.

    rf_*   : discriminator patch outputs
    lbl_*  : discriminator class logits
    *_yuv  : standardized YUV tensors (B,H,W,3)
    *_rgb  : RGB tensors
    drop   : (V,) or (B,V) float 0/1 — 1 where the input channel was DROPPED
             (the reference's RNGi booleans, :509-521)
    target_label : scalar smoothed label t ~ U[0.8, 1.2]
    """
    rf_gen: jnp.ndarray            # D1 patch output on generated image
    lbl_gen: jnp.ndarray           # D1 class logits
    rf_target: jnp.ndarray         # D2 patch output on origED
    rf_cyc: jnp.ndarray            # (V,B,h,w,1) D3 patch outputs on cyclic fakes
    lbl_cyc: jnp.ndarray           # (V,B,c_dim) D3 class logits
    rf_orig: jnp.ndarray           # (V,B,h,w,1) D4 patch outputs on originals
    lbl_orig: jnp.ndarray          # (V,B,c_dim) D4 class logits
    gen_rgb: jnp.ndarray           # (B,H,W,3) generated RGB (standardized-YUV scale)
    cyc_rgb: jnp.ndarray           # (V,B,H,W,3)
    cyc_yuv: jnp.ndarray           # (V,B,H,W,3)
    orig_rgb: jnp.ndarray          # (V,B,H,W,3) raw [0,1] originals (I0..ED)
    ds_yuv: jnp.ndarray            # (V,B,H,W,3) standardized YUV of originals
    mask: jnp.ndarray              # (B,H,W,1) specular candidate
    drop: jnp.ndarray
    target_label: jnp.ndarray


def shmgan_losses(inp: GanLossInputs, image_size: int,
                  style_weight: float = 100.0, content_weight: float = 1.0
                  ) -> Dict[str, jnp.ndarray]:
    """All loss components + totals. See module docstring for the reference map."""
    v = inp.rf_cyc.shape[0]
    t = inp.target_label
    c_dim = inp.lbl_cyc.shape[-1]

    # ---- G adversarial (LSGAN) :669-679
    d3_rf_cyc = sum(lsgan_to_target(inp.rf_cyc[i], t) for i in range(v))
    d1_rf = lsgan_to_target(inp.rf_gen, t)
    g_gan = (d3_rf_cyc + d1_rf) / 6.0

    # ---- classification CE :683-714
    eye = jnp.eye(c_dim, dtype=jnp.float32)
    d3_cls = sum(softmax_ce(eye[i][None, :], inp.lbl_cyc[i]) for i in range(v))
    target_vec = (eye[c_dim - 1] * t)[None, :]  # smoothed ED one-hot (:477,688)
    d1_cls = softmax_ce(target_vec, inp.lbl_gen)
    g_clsf = (d3_cls + d1_cls) / 6.0
    d4_cls = sum(softmax_ce(eye[i][None, :], inp.lbl_orig[i]) for i in range(v))

    # ---- D adversarial (LSGAN) :721-728. D2_RealFake_target is ALSO summed into
    # D4_RealFake_cyc (:728) and then both appear in the total (:838) — the double
    # count is replicated faithfully.
    d2_rf_target = lsgan_to_target(inp.rf_target, t) + lsgan_to_zero(inp.rf_gen)
    d4_terms = sum(lsgan_to_target(inp.rf_orig[i], t) + lsgan_to_zero(inp.rf_cyc[i])
                   for i in range(v))
    d4_rf_cyc = d4_terms + d2_rf_target

    # ---- cyclic L1 :744-751 (first 4 cyclics + G1 term)/5 + 10*ED cyclic
    l1_g1 = jnp.mean(jnp.abs(inp.gen_rgb - inp.orig_rgb[v - 1]))
    l1_cyc = [jnp.mean(jnp.abs(inp.cyc_rgb[i] - inp.orig_rgb[i])) for i in range(v)]
    l1_total = (sum(l1_cyc[: v - 1]) + l1_g1) / 5.0 + 10.0 * l1_cyc[v - 1]

    # ---- cyclic SSIM log-loss :759-779, gated per channel by the dropout draws.
    # rescale_01 then SSIM with max_val=5 exactly as the reference.
    drop = inp.drop if inp.drop.ndim == 2 else inp.drop[None, :]  # (B,V) or (1,V)
    ssim_losses = []
    ssim_raw = []
    for i in range(v):
        s = ssim_fn(rescale_01_per_image(inp.cyc_yuv[i]),
                    rescale_01_per_image(inp.ds_yuv[i]), max_val=5.0)  # (B,)
        ssim_raw.append(jnp.mean(s))
        term = -jnp.log((1.0 + s) / 2.0)
        gated = jnp.where(drop[:, i] > 0.5, 0.0, term)  # tf.cond(RNGi, 0, loss)
        ssim_losses.append(jnp.mean(gated))
    ssim_total = (ssim_losses[0] + ssim_losses[1] + ssim_losses[2]
                  + ssim_losses[3] + ssim_losses[4] * 10.0) / 5.0

    # ---- masked specular MSE :792-806 — EXCLUDED from totals (:833,841)
    spec = [masked_mse(inp.cyc_yuv[i], inp.ds_yuv[i], inp.mask) for i in range(v)]
    spec_total = (spec[0] + spec[1] + spec[2] + spec[3]) / 5.0 + 5.0 * spec[4]

    # ---- NST :814-826 (content vs I0 yuv, style gram vs ED yuv)
    nst = nst_loss(inp.cyc_yuv[v - 1], inp.ds_yuv[0], inp.ds_yuv[v - 1],
                   image_size, style_weight, content_weight)

    # ---- totals :829-844
    total_g = (d1_rf + d3_rf_cyc) / 6.0 + 10.0 * l1_total + 10.0 * ssim_total \
        + 10.0 * nst["nst"]
    total_d = (d1_cls + d3_cls) / 6.0 + (d2_rf_target + d4_rf_cyc) / 6.0 \
        + 0.5 * d4_cls + 10.0 * nst["nst"]
    total_c = 10.0 * (d4_cls + nst["nst"])

    return {
        "total_G": total_g, "total_D": total_d, "total_C": total_c,
        "G_gan": g_gan, "G_clsf": g_clsf,
        "D1_rf": d1_rf, "D3_rf_cyc": d3_rf_cyc, "D2_rf_target": d2_rf_target,
        "D4_rf_cyc": d4_rf_cyc, "D1_cls": d1_cls, "D3_cls": d3_cls, "D4_cls": d4_cls,
        "L1": l1_total, "SSIM_loss": ssim_total, "Spec": spec_total,
        "NST": nst["nst"], "content": nst["content"], "style": nst["style"],
        "ssim_mean": jnp.mean(jnp.stack(ssim_raw)),
    }


# ---------------------------------------------------------------------------
# SpecSeg standalone training losses (capability parity with SpecSeg.py:92-96)
# ---------------------------------------------------------------------------

def dice_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Soft dice loss for binary masks in [0,1]."""
    num = 2.0 * jnp.sum(pred * target) + eps
    den = jnp.sum(pred) + jnp.sum(target) + eps
    return 1.0 - num / den


def binary_focal_loss(pred: jnp.ndarray, target: jnp.ndarray,
                      gamma: float = 2.0, alpha: float = 0.25,
                      eps: float = 1e-7) -> jnp.ndarray:
    """Focal loss on sigmoid probabilities."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    pos = -alpha * ((1.0 - p) ** gamma) * target * jnp.log(p)
    neg = -(1.0 - alpha) * (p ** gamma) * (1.0 - target) * jnp.log(1.0 - p)
    return jnp.mean(pos + neg)


def specseg_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """dice + 1*focal, the combination the reference constructs (SpecSeg.py:92-94)."""
    return dice_loss(pred, target) + binary_focal_loss(pred, target)
