"""The fused SHMGAN train step — ONE compiled XLA computation per batch.

This replaces the reference's eagerly-dispatched train_step
(ShmGANwithSSpecSeg.py:466-875: 6 G forwards + 12 D forwards + 1 SpecSeg forward + a
host round-trip for SpecSeg.predict + two tape backwards, all per-op Python dispatch)
with a single jit-compiled step containing:

  * fused preprocessing: RGB->YUV + per-image standardization over all 5 views at once
  * SpecSeg mask inference INSIDE the graph (stop_gradient; reference :492 leaves the
    tape and round-trips through keras .predict on the host)
  * batched model invocations shaped for the MXU:
      - G1 forward (stopped G params) on (B, H, W, 10)
      - ONE live D forward on the stacked (2B) [generated, target] batch
        (reference D1 + D2, :559-563)
      - ONE live G forward on the stacked (5B) cyclic batch (reference's 5 separate
        G calls, :603-607)
      - ONE stopped-params D forward on the stacked (10B) [5 cyclic, 5 orig] batch
        (reference D3 + D4, :627-642)
  * the full loss zoo (train/losses.py)
  * ONE backward producing both G and D gradients, then both Adam updates

Gradient-gating semantics (faithful to the reference's effective behavior): the
reference toggles keras `trainable` flags inside the tape, so D gets gradients only
through the D1/D2 calls and G only through the 5 cyclic calls (SURVEY.md §3.2; the
flags gate GradientTape variable watching). Here that is expressed functionally:
stop_gradient on G params for the G1 pass, stop_gradient on D params for the D3/D4
pass, and the combined scalar loss

    L = L_D(live D1/D2; everything else stop_grad) + L_G(live cyclic G)

whose single gradient yields exactly tape.gradient([total_D, total_C], D_vars) and
tape.gradient(total_G, G_vars) — in one fused forward+backward instead of two.

RNG semantics: per-step label smoothing U[0.8,1.2] (:986), 5 Bernoulli(randomness)
input-channel drops (:509-521), paired random up/down flip of all views (intent of
datasetLoader.py:61 — the reference's flip polarity/caching bug is documented in
config.py), D GaussianNoise + dropout on the live (training=True) D pass only.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from shmgan_tpu.config import Config
from shmgan_tpu.ops.color import rgb_to_yuv, yuv_to_rgb
from shmgan_tpu.ops.specprior import specseg_net_input
from shmgan_tpu.ops.ssim import ssim as ssim_fn
from shmgan_tpu.ops.standardize import per_image_standardization, rescale_01_per_image
from shmgan_tpu.train.losses import GanLossInputs, lsgan_to_target, shmgan_losses
from shmgan_tpu.train.state import TrainState, build_models


def preprocess_views(views: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(V,B,H,W,3) raw RGB [0,1] -> (standardized YUV (V,B,H,W,3), Y (B,H,W,V),
    average CbCr (B,H,W,2)).

    One fused pass over all V views (reference does 5 sequential conversions,
    :480-490). Standardization stats are per image per view.
    """
    v, b, h, w, _ = views.shape
    yuv = rgb_to_yuv(views)
    flat, _ = per_image_standardization(yuv.reshape(v * b, h, w, 3))
    ds_yuv = flat.reshape(v, b, h, w, 3)
    y_planes = jnp.moveaxis(ds_yuv[..., 0], 0, -1)          # (B,H,W,V)
    avg_cbcr = jnp.mean(ds_yuv[..., 1:], axis=0)            # (B,H,W,2)
    return ds_yuv, y_planes, avg_cbcr


def _onehot_planes(b: int, h: int, w: int, c_dim: int, idx: int) -> jnp.ndarray:
    """(B,H,W,c_dim) one-hot label planes: ones at channel idx, zeros elsewhere."""
    planes = jnp.zeros((b, h, w, c_dim), jnp.float32)
    return planes.at[..., idx].set(1.0)


def make_train_step(cfg: Config, debug_grads: bool = False):
    """Build the jitted train step closure for a given config.

    debug_grads: include the raw G/D gradient trees in the metrics dict (testing
    only — used by the gradient-gating equivalence test)."""
    gen, disc, specseg = build_models(cfg)
    c_dim = cfg.model.c_dim
    image_size = cfg.model.image_size
    randomness = cfg.train.randomness
    scalar_drop = cfg.train.scalar_channel_dropout
    do_flip = cfg.data.flip
    train_g_after = cfg.train.train_G_after
    live_g1 = cfg.train.live_g1
    g1_recon_weight = cfg.train.g1_recon_weight if live_g1 else 0.0
    single_input_prob = cfg.train.single_input_prob
    consistent_domains = cfg.train.consistent_domains

    # Rematerialized model forwards (config.py TrainConfig.remat): under
    # jax.checkpoint the backward pass re-runs each forward instead of storing
    # its ~50 intermediate activation tensors to HBM. The step is HBM-bound
    # with idle MXU (DESIGN.md roofline), so this converts the bottleneck
    # resource into the idle one. Numerics are unchanged — the same ops run in
    # the same order (tests/test_remat.py asserts step-for-step equality).
    # Granular policies (round-3 256px finding): remat is a pure throughput
    # loss when the step fits HBM (sweep_256.json: b12 27.1 -> 33.7 img/s
    # without it), so when a config almost fits, remat the cheapest-to-
    # recompute subgraph only — "disc" frees the D activations (4 batched D
    # calls) for a fraction of the "models" recompute bill.
    if cfg.train.remat not in ("none", "models", "disc", "gen"):
        raise ValueError(f"train.remat must be 'none'|'models'|'disc'|'gen', "
                         f"got {cfg.train.remat!r}")
    _remat_g = (jax.checkpoint if cfg.train.remat in ("models", "gen")
                else (lambda f: f))
    _remat_d = (jax.checkpoint if cfg.train.remat in ("models", "disc")
                else (lambda f: f))
    gen_fwd = _remat_g(lambda p, x, m: gen.apply({"params": p}, x, m))
    d_live_fwd = _remat_d(
        lambda p, x, m, kn, kd: disc.apply({"params": p}, x, m, train=True,
                                           rngs={"noise": kn, "dropout": kd}))
    d_frozen_fwd = _remat_d(
        lambda p, x, m: disc.apply({"params": p}, x, m, train=False))

    def step_fn(state: TrainState, views: jnp.ndarray, rng: jax.Array,
                epoch: jnp.ndarray) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """views: (V, B, H, W, 3) raw RGB in [0,1], V == c_dim (I0,I45,I90,I135,ED)."""
        v, b, h, w, _ = views.shape
        k_flip, k_label, k_drop, k_noise, k_dropout = jax.random.split(rng, 5)

        # ---- paired flip augmentation (applied identically to all views)
        if do_flip:
            flip = jax.random.uniform(k_flip, ()) >= 0.5
            views = jnp.where(flip, views[:, :, ::-1, :, :], views)

        # ---- per-step label smoothing t ~ U[0.8, 1.2] (train loop :986)
        t = jax.random.uniform(k_label, (), minval=cfg.train.target_label_low,
                               maxval=cfg.train.target_label_high)

        # ---- fused preprocessing
        ds_yuv, y_planes, avg_cbcr = preprocess_views(views)

        # ---- SpecSeg mask from the standardized I90 Y channel (:492), frozen.
        # in_channels=2 (chroma-trained nets) appends the dichromatic prior
        # computed from the SAME raw I90 RGB view the luma came from.
        i90_y = y_planes[..., 2:3]
        ss_in = specseg_net_input(i90_y, views[2],
                                  cfg.model.specseg_in_channels)
        specseg_vars = jax.tree_util.tree_map(lax.stop_gradient, state.specseg_vars)
        mask = specseg.apply(specseg_vars, ss_in, train=False)
        mask = lax.stop_gradient(mask)

        # ---- Bernoulli input-channel dropout (:509-521). drop[i]=1 -> channel i
        # replaced by zeros in G1 input and by gen_Y in the cyclic inputs.
        drop_shape = (1, v) if scalar_drop else (b, v)
        drop = (jax.random.uniform(k_drop, drop_shape) < randomness).astype(jnp.float32)
        if single_input_prob > 0.0:
            # replace some patterns with the single-input inference configuration:
            # exactly one polarized view kept (uniform over the 4), everything else
            # dropped (test.py:227-235 keeps only slot 0)
            k_single, k_keep = jax.random.split(jax.random.fold_in(k_drop, 1))
            kept = jax.random.randint(k_keep, (drop_shape[0],), 0, v - 1)
            single_pat = 1.0 - jax.nn.one_hot(kept, v, dtype=jnp.float32)
            use_single = jax.random.uniform(
                k_single, (drop_shape[0], 1)) < single_input_prob
            drop = jnp.where(use_single, single_pat, drop)
        drop_b = jnp.broadcast_to(drop[:, None, None, :], (b, h, w, v))

        rand_y = jnp.where(drop_b > 0.5, 0.0, y_planes)                  # (B,H,W,V)
        gen_input = jnp.concatenate(
            [rand_y, _onehot_planes(b, h, w, c_dim, c_dim - 1)], axis=-1)

        # ---- G1: always targets ED; stopped G params (no grad contribution, :538
        # with G.trainable=False inside the tape)
        g_params_stop = jax.tree_util.tree_map(lax.stop_gradient, state.g_params)

        # comparison/real-image domain: the reference feeds raw [0,1] originals to
        # the L1 and to D while the generated side is standardized-scale (a domain
        # mix, :745-750); consistent_domains uses the standardized originals on
        # both sides instead.
        views_cmp = yuv_to_rgb(ds_yuv) if consistent_domains else views

        def forward_losses(params):
            g_params, d_params = params["G"], params["D"]
            d_params_stop = jax.tree_util.tree_map(lax.stop_gradient, d_params)

            g1_params = g_params if live_g1 else g_params_stop
            gen_y = gen_fwd(g1_params, gen_input, mask)
            gen_yuv = jnp.concatenate([gen_y, avg_cbcr], axis=-1)
            gen_rgb = yuv_to_rgb(gen_yuv)

            # ---- live D pass on [generated, target] (reference D1+D2, training=True
            # -> GaussianNoise + Dropout active)
            live_in = jnp.concatenate([gen_rgb, views_cmp[v - 1]], axis=0)  # (2B,...)
            live_mask = jnp.concatenate([mask, mask], axis=0)
            rf_live, lbl_live = d_live_fwd(d_params, live_in, live_mask,
                                           k_noise, k_dropout)
            rf_gen, rf_target = rf_live[:b], rf_live[b:]
            lbl_gen = lbl_live[:b]

            # ---- cyclic inputs: dropped channels replaced by gen_Y (:576-594).
            # stop_gradient keeps the cyclic-pass gradient semantics identical to
            # the reference even when live_g1 trains G through the G1 pass itself.
            gen_y_sub = lax.stop_gradient(gen_y)
            cyc_base = jnp.where(drop_b > 0.5,
                                 jnp.broadcast_to(gen_y_sub, (b, h, w, v)),
                                 y_planes)
            cyc_inputs = []
            for i in range(v):
                ych = cyc_base.at[..., i].set(0.0)
                cyc_inputs.append(jnp.concatenate(
                    [ych, _onehot_planes(b, h, w, c_dim, i)], axis=-1))
            cyc_stack = jnp.concatenate(cyc_inputs, axis=0)                # (VB,...)
            mask_v = jnp.tile(mask, (v, 1, 1, 1))

            # ---- ONE live G forward over all cyclic targets (:603-607)
            cyc_y = gen_fwd(g_params, cyc_stack, mask_v)                   # (VB,H,W,1)
            cyc_y = cyc_y.reshape(v, b, h, w, 1)
            cyc_yuv = jnp.concatenate(
                [cyc_y, jnp.broadcast_to(avg_cbcr, (v, b, h, w, 2))], axis=-1)
            cyc_rgb = yuv_to_rgb(cyc_yuv)

            # ---- ONE stopped-params D pass on [cyclics, originals] (D3+D4,
            # training=False -> no noise/dropout, :627-642). With live_g1 the
            # generated image rides along too, giving G an adversarial gradient
            # through frozen D params (no D leak).
            frozen_parts = [cyc_rgb.reshape(v * b, h, w, 3),
                            views_cmp.reshape(v * b, h, w, 3)]
            n_frozen_masks = 2 * v
            if live_g1:
                frozen_parts.append(gen_rgb)
                n_frozen_masks += 1
            frozen_in = jnp.concatenate(frozen_parts, axis=0)
            frozen_mask = jnp.tile(mask, (n_frozen_masks, 1, 1, 1))
            rf_frozen, lbl_frozen = d_frozen_fwd(d_params_stop, frozen_in,
                                                 frozen_mask)
            rf_cyc = rf_frozen[: v * b].reshape(v, b, *rf_frozen.shape[1:])
            rf_orig = rf_frozen[v * b: 2 * v * b].reshape(v, b, *rf_frozen.shape[1:])
            lbl_cyc = lbl_frozen[: v * b].reshape(v, b, c_dim)
            lbl_orig = lbl_frozen[v * b: 2 * v * b].reshape(v, b, c_dim)

            losses = shmgan_losses(
                GanLossInputs(
                    rf_gen=rf_gen, lbl_gen=lbl_gen, rf_target=rf_target,
                    rf_cyc=rf_cyc, lbl_cyc=lbl_cyc, rf_orig=rf_orig,
                    lbl_orig=lbl_orig, gen_rgb=gen_rgb, cyc_rgb=cyc_rgb,
                    cyc_yuv=cyc_yuv, orig_rgb=views_cmp, ds_yuv=ds_yuv, mask=mask,
                    drop=drop, target_label=t),
                image_size=image_size, style_weight=cfg.train.style_weight,
                content_weight=cfg.train.content_weight)

            # L_D: total_D + total_C with every non-live-D dependency stopped, so its
            # gradient equals tape.gradient([total_D, total_C], D_vars).  Live terms:
            # D1_cls and D2_rf_target (which appears twice in the total via the
            # :728/:838 double count).
            sg = lax.stop_gradient
            loss_d = (losses["D1_cls"] + sg(losses["D3_cls"])) / 6.0 \
                + (losses["D2_rf_target"]
                   + (sg(losses["D4_rf_cyc"] - losses["D2_rf_target"])
                      + losses["D2_rf_target"])) / 6.0 \
                + 0.5 * sg(losses["D4_cls"]) + 10.0 * sg(losses["NST"]) \
                + 10.0 * (sg(losses["D4_cls"]) + sg(losses["NST"]))

            # L_G: total_G; its only live-G paths are the cyclic forwards (G1 used
            # stopped params), matching tape.gradient(total_G, G_vars). The D1_rf
            # term reads the LIVE D1 output, which would leak a spurious D gradient
            # out of total_G — the reference never requests D grads from total_G, so
            # swap it for its stopped value (same loss value, no D leak). With
            # live_g1 this swap also removes the G1 adversarial path (gen_rgb went
            # through live D); the frozen-D evaluation of gen_rgb re-injects it as
            # a value-neutral gradient-only term.
            loss_g = losses["total_G"] + (sg(losses["D1_rf"]) - losses["D1_rf"]) / 6.0
            if live_g1:
                rf_gen_frozen = rf_frozen[2 * v * b:]
                adv_g1 = lsgan_to_target(rf_gen_frozen, t)
                loss_g = loss_g + (adv_g1 - sg(adv_g1)) / 6.0
                losses["G1_adv_frozen"] = sg(adv_g1)
            if g1_recon_weight > 0.0:
                # direct single-image objective: G1 output vs ED in the
                # standardized domain (L1 in RGB + SSIM-log on YUV, the same forms
                # the cyclic losses use)
                ed_cmp = yuv_to_rgb(ds_yuv[v - 1]) if not consistent_domains \
                    else views_cmp[v - 1]
                g1_l1 = jnp.mean(jnp.abs(gen_rgb - ed_cmp))
                s = ssim_fn(rescale_01_per_image(gen_yuv),
                            rescale_01_per_image(ds_yuv[v - 1]), max_val=5.0)
                g1_ssim = jnp.mean(-jnp.log((1.0 + s) / 2.0))
                loss_g = loss_g + g1_recon_weight * (g1_l1 + g1_ssim)
                losses["G1_L1"] = g1_l1
                losses["G1_SSIM_loss"] = g1_ssim

            return loss_d + loss_g, losses

        grads, metrics = jax.grad(forward_losses, has_aux=True)(
            {"G": state.g_params, "D": state.d_params})

        # ---- D update always; G update gated by epoch >= train_G_after (:865)
        # updates apply dtype-preserving ((p+u).astype(p.dtype) — identity for
        # the f32 default): keeps the step polymorphic in param dtype, so a
        # bf16-params regime traces cleanly through the g_update/g_skip cond
        # (the bare p+u promotes bf16+f32 -> f32 and the branches disagree)
        d_updates, d_opt_state = state.d_tx.update(grads["D"], state.d_opt_state,
                                                   state.d_params)
        d_params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.d_params, d_updates)

        def g_update(_):
            g_updates, g_opt_state = state.g_tx.update(grads["G"], state.g_opt_state,
                                                       state.g_params)
            g_params = jax.tree_util.tree_map(
                lambda p, u: (p + u).astype(p.dtype),
                state.g_params, g_updates)
            return g_params, g_opt_state

        def g_skip(_):
            return state.g_params, state.g_opt_state

        g_params, g_opt_state = lax.cond(epoch >= train_g_after, g_update, g_skip, None)

        # Generator EMA (cfg.train.g_ema > 0): in-graph decay toward the fresh
        # params, fused into the same step — no extra dispatch or HBM pass
        # beyond the EMA tree itself. state.ema_g_params is None when disabled
        # (structural/static, so parity runs trace an unchanged graph).
        ema_g_params = state.ema_g_params
        if ema_g_params is not None:
            d_ = jnp.asarray(cfg.train.g_ema)
            ema_g_params = jax.tree_util.tree_map(
                lambda e, p: e * d_ + p.astype(e.dtype) * (1.0 - d_),
                state.ema_g_params, g_params)

        new_state = state.replace(step=state.step + 1, g_params=g_params,
                                  d_params=d_params, g_opt_state=g_opt_state,
                                  d_opt_state=d_opt_state,
                                  ema_g_params=ema_g_params)
        metrics = dict(metrics)
        metrics["target_label"] = t
        if debug_grads:
            metrics["_grads"] = grads
            metrics["_drop"] = drop
        return new_state, metrics

    return step_fn


def make_scan_train_steps(cfg: Config, unroll: int = 1):
    """K train steps as ONE device computation via lax.scan.

    fn(state, batches (K,V,B,H,W,3), rngs (K,2) uint32 keys, epoch) ->
    (state, stacked metrics). Removes the per-step host dispatch — on hosts that
    reach the TPU through a network relay (or any slow dispatch path) this turns K
    round-trips into one. Metrics come back stacked (K,) per entry.
    """
    step_fn = make_train_step(cfg)

    def scan_fn(state: TrainState, batches: jnp.ndarray, rngs: jax.Array,
                epoch: jnp.ndarray):
        def body(carry, xs):
            batch, rng = xs
            new_state, metrics = step_fn(carry, batch, rng, epoch)
            return new_state, metrics

        return lax.scan(body, state, (batches, rngs), unroll=unroll)

    return scan_fn


def train_step(cfg: Config):
    """Return a jitted (state, views, rng, epoch) -> (state, metrics) callable with
    donated state (in-place HBM reuse of params/opt buffers)."""
    return jax.jit(make_train_step(cfg), donate_argnums=(0,))
