"""Gradient-gating equivalence: the fused single-backward step must produce exactly
the gradients of the reference's two-tape scheme.

The reference (ShmGANwithSSpecSeg.py:495-872) computes
    D grads = tape.gradient([total_D, total_C], D_vars)   with D watched only during
                                                          the D1/D2 calls
    G grads = tape.gradient(total_G, G_vars)              with G watched only during
                                                          the 5 cyclic calls
This test builds a NAIVE functional transcription of that scheme — two separate
jax.grad calls, UNBATCHED per-view model invocations in the reference's call order —
and checks the fused step's gradients match leaf-for-leaf.

D noise/dropout are disabled (rate 0) so the naive separate D calls see the same
values as the fused step's concatenated batch; instance norm is per-instance, so
batching is otherwise semantics-preserving.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.ops.color import yuv_to_rgb
from shmgan_tpu.train.losses import GanLossInputs, shmgan_losses
from shmgan_tpu.train.state import build_models, create_train_state
from shmgan_tpu.train.step import make_train_step, preprocess_views, _onehot_planes


def cfg_nodropout() -> Config:
    cfg = Config()
    # strict-parity check: leaf-for-leaf gradient equality needs f32 compute
    # (bf16 is the production default; f32 is the documented parity mode)
    cfg.model = dataclasses.replace(cfg.model, image_size=32, filter_size=8,
                                    specseg_base_filters=4, d_input_noise=0.0,
                                    d_dropout=0.0, compute_dtype="float32")
    cfg.train = dataclasses.replace(cfg.train, batch_size=1)
    cfg.data = dataclasses.replace(cfg.data, flip=False)
    return cfg


def naive_reference_grads(cfg, state, views, rng):
    """Reference-order, unbatched, two-backward transcription of train_step."""
    gen, disc, specseg = build_models(cfg)
    v, b, h, w, _ = views.shape
    c_dim = cfg.model.c_dim
    # identical RNG schedule to the fused step
    k_flip, k_label, k_drop, k_noise, k_dropout = jax.random.split(rng, 5)
    t = jax.random.uniform(k_label, (), minval=cfg.train.target_label_low,
                           maxval=cfg.train.target_label_high)
    drop = (jax.random.uniform(k_drop, (1, v)) < cfg.train.randomness
            ).astype(jnp.float32)
    drop_b = jnp.broadcast_to(drop[:, None, None, :], (b, h, w, v))

    ds_yuv, y_planes, avg_cbcr = preprocess_views(views)
    mask = specseg.apply(state.specseg_vars, y_planes[..., 2:3], train=False)
    mask = jax.lax.stop_gradient(mask)

    rand_y = jnp.where(drop_b > 0.5, 0.0, y_planes)
    gen_input = jnp.concatenate(
        [rand_y, _onehot_planes(b, h, w, c_dim, c_dim - 1)], axis=-1)

    def full_losses(g_params_live, d_params_live, g_params_g1, d_params_frozen):
        # G1 (reference :538)
        gen_y = gen.apply({"params": g_params_g1}, gen_input, mask)
        gen_yuv = jnp.concatenate([gen_y, avg_cbcr], axis=-1)
        gen_rgb = yuv_to_rgb(gen_yuv)
        # D1, D2 — separate calls (:559-563)
        rf_gen, lbl_gen = disc.apply({"params": d_params_live}, gen_rgb, mask,
                                     train=True,
                                     rngs={"noise": k_noise, "dropout": k_dropout})
        rf_target, _ = disc.apply({"params": d_params_live}, views[v - 1], mask,
                                  train=True,
                                  rngs={"noise": k_noise, "dropout": k_dropout})
        # cyclic G passes — 5 separate calls (:603-607)
        cyc_base = jnp.where(drop_b > 0.5, jnp.broadcast_to(gen_y, (b, h, w, v)),
                             y_planes)
        cyc_y, cyc_yuv, cyc_rgb = [], [], []
        for i in range(v):
            ych = cyc_base.at[..., i].set(0.0)
            ci = jnp.concatenate([ych, _onehot_planes(b, h, w, c_dim, i)], axis=-1)
            yi = gen.apply({"params": g_params_live}, ci, mask)
            yuvi = jnp.concatenate([yi, avg_cbcr], axis=-1)
            cyc_y.append(yi)
            cyc_yuv.append(yuvi)
            cyc_rgb.append(yuv_to_rgb(yuvi))
        # D3 on cyclics, D4 on originals — 10 separate calls (:627-642)
        rf_cyc, lbl_cyc, rf_orig, lbl_orig = [], [], [], []
        for i in range(v):
            rf, lbl = disc.apply({"params": d_params_frozen}, cyc_rgb[i], mask,
                                 train=False)
            rf_cyc.append(rf)
            lbl_cyc.append(lbl)
        for i in range(v):
            rf, lbl = disc.apply({"params": d_params_frozen}, views[i], mask,
                                 train=False)
            rf_orig.append(rf)
            lbl_orig.append(lbl)

        return shmgan_losses(
            GanLossInputs(
                rf_gen=rf_gen, lbl_gen=lbl_gen, rf_target=rf_target,
                rf_cyc=jnp.stack(rf_cyc), lbl_cyc=jnp.stack(lbl_cyc),
                rf_orig=jnp.stack(rf_orig), lbl_orig=jnp.stack(lbl_orig),
                gen_rgb=gen_rgb, cyc_rgb=jnp.stack(cyc_rgb),
                cyc_yuv=jnp.stack(cyc_yuv), orig_rgb=views, ds_yuv=ds_yuv,
                mask=mask, drop=drop, target_label=t),
            image_size=cfg.model.image_size)

    # --- D backward: watch d_params only through the live D1/D2 calls; G1 params,
    # cyclic G params, and the frozen D3/D4 params are constants.
    def loss_for_d(d_params):
        losses = full_losses(state.g_params, d_params, state.g_params,
                             state.d_params)
        return losses["total_D"] + losses["total_C"]

    d_grads = jax.grad(loss_for_d)(state.d_params)

    # --- G backward: watch g_params only through the cyclic calls.
    def loss_for_g(g_params):
        losses = full_losses(g_params, state.d_params, state.g_params,
                             state.d_params)
        return losses["total_G"]

    g_grads = jax.grad(loss_for_g)(state.g_params)
    return g_grads, d_grads


@pytest.mark.slow
def test_fused_step_grads_match_naive_reference_scheme():
    cfg = cfg_nodropout()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    views = jax.random.uniform(jax.random.PRNGKey(1), (5, 1, 32, 32, 3))
    rng = jax.random.PRNGKey(42)

    step = jax.jit(make_train_step(cfg, debug_grads=True), donate_argnums=())
    _, metrics = step(state, views, rng, jnp.zeros((), jnp.int32))
    fused = metrics["_grads"]

    g_naive, d_naive = jax.jit(
        lambda s, v, r: naive_reference_grads(cfg, s, v, r))(state, views, rng)

    g_pairs = zip(jax.tree_util.tree_leaves_with_path(fused["G"]),
                  jax.tree_util.tree_leaves(g_naive))
    for (path, a), b in g_pairs:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6,
            err_msg=f"G grad mismatch at {jax.tree_util.keystr(path)}")

    d_pairs = zip(jax.tree_util.tree_leaves_with_path(fused["D"]),
                  jax.tree_util.tree_leaves(d_naive))
    for (path, a), b in d_pairs:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6,
            err_msg=f"D grad mismatch at {jax.tree_util.keystr(path)}")
