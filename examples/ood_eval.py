"""Out-of-distribution evaluation — breaks the synthetic-eval circularity
(VERDICT r2 missing #2 / next #4).

Two OOD sources (shmgan_tpu/data/ood.py):
  A. a second synthetic family (geometric backgrounds, super-Gaussian
     plateau + arc-glint highlights) with ground truth -> the full metric
     table (PSNR/SSIM/FID + reference-style deltaE), identity-baselined.
  B. the 10 real photographs inside the reference's results figure
     (/root/reference/assets/results.png) -> no ground truth exists; report
     honest no-reference diagnostics (specular-region luminance reduction,
     outside-mask fidelity, mask IoU vs the reference's own SpecSeg masks)
     and a gallery next to the reference's own outputs.

Usage: python examples/ood_eval.py --ckpt_dir /root/ckpt_quality_r3_256 \
           --image_size 256 --upsample_mode resize_conv --out benchmarks/quality_ood
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", type=str, default="")
    p.add_argument("--bundle", type=str, default="",
                   help="fp16 inference bundle (checkpoint.load_inference_bundle)"
                        " — the durable in-repo alternative to --ckpt_dir; the"
                        " bundle header overrides image_size/filter_size/"
                        "upsample_mode")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--out", type=str, default="benchmarks/quality_ood")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--filter_size", type=int, default=64)
    p.add_argument("--specseg_base_filters", type=int, default=16)
    p.add_argument("--specseg_weights", type=str, default="",
                   help="frozen SpecSeg msgpack (defaults to the checkpoint's)")
    p.add_argument("--specseg_in_channels", type=int, default=1,
                   choices=[1, 2],
                   help="input channels of the CHECKPOINT's frozen SpecSeg "
                        "(--ckpt_dir path only; bundles and --specseg_weights "
                        "auto-detect). Set 2 when the checkpoint's SpecSeg "
                        "was trained chroma-input — restoring it into a "
                        "1-channel graph fails with a conv kernel shape "
                        "error at apply time")
    p.add_argument("--upsample_mode", choices=["conv_transpose", "resize_conv"],
                   default="conv_transpose")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--mask_tta", action="store_true",
                   help="dihedral mask TTA in the inference graph")
    p.add_argument("--mask_chroma_prior", action="store_true",
                   help="fuse the dichromatic chroma prior into the "
                        "inference-path mask (ops/specprior.py)")
    p.add_argument("--eval_n", type=int, default=128)
    p.add_argument("--seed", type=int, default=4242)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from shmgan_tpu.checkpoint import (CheckpointManager,
                                       load_inference_bundle,
                                       load_specseg_weights)
    from shmgan_tpu.config import Config
    from shmgan_tpu.data.ood import reference_photo_crops, synth_ood_set
    from shmgan_tpu.eval.fid import frechet_distance, specseg_features
    from shmgan_tpu.eval.metrics import evaluate_pair
    from shmgan_tpu.infer import make_infer_fn
    from shmgan_tpu.ops.color import rgb_to_yuv
    from shmgan_tpu.ops.ssim import ssim as ssim_fn
    from shmgan_tpu.train.state import create_train_state

    if not a.ckpt_dir and not a.bundle:
        raise SystemExit("one of --ckpt_dir / --bundle is required")

    bundle = None
    if a.bundle:
        bundle = load_inference_bundle(a.bundle)
        hdr = bundle[2]
        a.image_size = hdr["image_size"]
        a.filter_size = hdr["filter_size"]
        a.specseg_base_filters = hdr["specseg_base_filters"]
        a.upsample_mode = hdr.get("upsample_mode", "conv_transpose")
        log(f"bundle {a.bundle}: step {hdr.get('step')} "
            f"@{a.image_size}px {a.upsample_mode}")

    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, image_size=a.image_size, filter_size=a.filter_size,
        specseg_base_filters=a.specseg_base_filters, compute_dtype="float32",
        upsample_mode=a.upsample_mode,
        specseg_in_channels=a.specseg_in_channels)
    if bundle is not None:
        cfg.model = dataclasses.replace(
            cfg.model,
            specseg_in_channels=bundle[2].get("specseg_in_channels", 1))
    if a.use_ema:
        cfg.train = dataclasses.replace(cfg.train, g_ema=0.999)
    if a.mask_tta:
        cfg.eval = dataclasses.replace(cfg.eval, mask_tta=True)
    if a.mask_chroma_prior:
        cfg.eval = dataclasses.replace(cfg.eval, mask_chroma_prior=True)
    log(f"backend: {jax.default_backend()}")

    specseg_vars = None
    if a.specseg_weights and os.path.exists(a.specseg_weights):
        specseg_vars = load_specseg_weights(
            a.specseg_weights, base_filters=a.specseg_base_filters,
            image_size=a.image_size)
        # chroma-input nets (ops/specprior.py) carry 2 input channels — the
        # inference graph must be built to feed them (read off the loaded
        # tree — no second parse of the file)
        from shmgan_tpu.checkpoint import specseg_in_channels_of
        in_ch = specseg_in_channels_of(specseg_vars)
        if in_ch != cfg.model.specseg_in_channels:
            cfg.model = dataclasses.replace(
                cfg.model, specseg_in_channels=in_ch)
            log(f"specseg in_channels={in_ch} (auto-detected)")
    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               specseg_vars=specseg_vars)
    if bundle is not None:
        g_params, bundle_specseg, hdr = bundle
        state = state.replace(g_params=g_params, specseg_vars=bundle_specseg,
                              step=int(hdr.get("step", 0)))
    else:
        ckpt = CheckpointManager(a.ckpt_dir)
        restored = ckpt.restore(state, step=a.step)
        if restored is None:
            raise SystemExit(f"no checkpoint under {a.ckpt_dir}")
        state = restored
    if specseg_vars is not None:
        # the checkpoint payload carries its own frozen specseg_vars, which
        # restore() just wrote over the injected tree — put the override back
        # (this is the whole point of --specseg_weights: A/B a different mask
        # net, e.g. the domain-randomized retrain, under the same generator)
        state = state.replace(specseg_vars=specseg_vars)
        log(f"specseg override: {a.specseg_weights}")
    # bundles already contain the deployed tree (EMA-substituted at export
    # time when the run used --g_ema), so --use_ema only applies to ckpt_dir
    eval_g = (state.ema_g_params
              if a.use_ema and bundle is None
              and state.ema_g_params is not None
              else state.g_params)
    log(f"restored checkpoint step {int(state.step)}")

    infer = make_infer_fn(cfg)
    os.makedirs(a.out, exist_ok=True)

    def batched_infer(rgb_np):
        outs = {}
        for i in range(0, rgb_np.shape[0], a.batch):
            out = infer(eval_g, state.specseg_vars,
                        jnp.asarray(rgb_np[i:i + a.batch]))
            for k in ("gen_rgb_calibrated", "gen_rgb_composited", "mask"):
                outs.setdefault(k, []).append(np.asarray(out[k]))
        return {k: np.concatenate(v) for k, v in outs.items()}

    def chunked_feats(x_np):
        fs = []
        for i in range(0, x_np.shape[0], a.batch):
            fs.append(np.asarray(specseg_features(
                state.specseg_vars, jnp.asarray(x_np[i:i + a.batch]),
                base_filters=cfg.model.specseg_base_filters)))
        return np.concatenate(fs)

    # ------------------------------------------------------------------ A
    log(f"[A] synthetic OOD family: {a.eval_n} scenes @ {a.image_size}px")
    ins_np, gts_np, _ = synth_ood_set(a.eval_n, a.image_size, seed=a.seed)
    out = batched_infer(ins_np)
    gt_feats = jnp.asarray(chunked_feats(gts_np))

    def metrics(x_np, name):
        psnr_i, ssim_i, ref_rows = [], [], []
        for i in range(0, x_np.shape[0], a.batch):
            x = jnp.asarray(x_np[i:i + a.batch])
            g = jnp.asarray(gts_np[i:i + a.batch])
            mse = jnp.mean((x - g) ** 2, axis=(1, 2, 3))
            psnr_i.append(np.asarray(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12))))
            ssim_i.append(np.asarray(ssim_fn(x, g, max_val=1.0)))
            ref_rows.append({k: np.asarray(v)
                             for k, v in evaluate_pair(x, g).items()})
        psnr = float(np.mean(np.concatenate(psnr_i)))
        ssim = float(np.mean(np.concatenate(ssim_i)))
        fid = float(frechet_distance(jnp.asarray(chunked_feats(x_np)), gt_feats))
        ref_style = {k: round(float(np.mean(np.concatenate(
            [r[k] for r in ref_rows]))), 4) for k in ref_rows[0]}
        log(f"  {name}: PSNR {psnr:.2f} SSIM {ssim:.4f} FID {fid:.4f} "
            f"deltaE76 {ref_style.get('deltaE76', float('nan')):.2f}")
        return {"psnr": round(psnr, 4), "ssim": round(ssim, 4),
                "fid": round(fid, 5), "reference_style": ref_style}

    part_a = {
        "eval_n": a.eval_n, "seed": a.seed,
        "identity_baseline": metrics(ins_np, "identity (input)"),
        "gen_calibrated": metrics(out["gen_rgb_calibrated"], "calibrated"),
        "gen_composited": metrics(out["gen_rgb_composited"], "composited"),
    }
    for key in ("gen_calibrated", "gen_composited"):
        base, m = part_a["identity_baseline"], part_a[key]
        m["beats_identity"] = bool(m["psnr"] > base["psnr"]
                                   and m["ssim"] > base["ssim"])

    from shmgan_tpu.utils.viz import image_grid
    for i in range(min(4, a.eval_n)):
        image_grid(
            [ins_np[i], out["mask"][i][..., 0], out["gen_rgb_calibrated"][i],
             out["gen_rgb_composited"][i], gts_np[i]],
            titles=["OOD input", "mask", "calibrated", "composited", "GT"],
            path=os.path.join(a.out, f"ood_synth_grid_{i}.png"))

    # ------------------------------------------------------------------ B
    part_b = None
    crops = reference_photo_crops(a.image_size)
    if crops is None:
        log("[B] reference results.png not available — skipping real-photo OOD")
    else:
        n = crops["inputs"].shape[0]
        log(f"[B] {n} real photo crops from the reference results figure")
        rb = batched_infer(crops["inputs"])

        def luma(x):
            return np.asarray(rgb_to_yuv(jnp.asarray(x)))[..., 0]

        ref_mask_bin = (crops["ref_masks"] > 0.5).astype(np.float32)
        our_mask_bin = (rb["mask"] > 0.5).astype(np.float32)
        inter = (ref_mask_bin * our_mask_bin).sum()
        union = np.maximum(ref_mask_bin, our_mask_bin).sum()
        mask_iou = float(inter / max(union, 1.0))
        # precision/recall against the reference masks diagnose the failure
        # direction: the base curriculum's net over-fires on bright diffuse
        # objects (low precision); a mask that misses true glints instead
        # shows as low recall.
        mask_precision = float(inter / max(our_mask_bin.sum(), 1.0))
        mask_recall = float(inter / max(ref_mask_bin.sum(), 1.0))
        mask_pred_frac = float(our_mask_bin.mean())
        mask_ref_frac = float(ref_mask_bin.mean())

        # no-reference diagnostics: inside OUR dilated mask, luma should drop
        # (highlight removed); outside it, the composited output preserves the
        # input by construction and the calibrated output should track it.
        m = our_mask_bin[..., 0]
        inside = m > 0.5
        outside = ~inside
        y_in = luma(crops["inputs"])
        stats = {}
        for name, img in (("calibrated", rb["gen_rgb_calibrated"]),
                          ("composited", rb["gen_rgb_composited"]),
                          ("reference_output", crops["ref_outputs"])):
            y_o = luma(img)
            drop = float((y_in[inside] - y_o[inside]).mean()) if inside.any() \
                else 0.0
            mse_out = float(((img - crops["inputs"]) ** 2)[outside].mean()) \
                if outside.any() else 0.0
            psnr_out = float(-10.0 * np.log10(max(mse_out, 1e-12)))
            stats[name] = {
                "specular_luma_drop": round(drop, 4),
                "outside_mask_psnr_vs_input": round(psnr_out, 2),
            }
            log(f"  {name}: luma drop in specular {drop:+.3f}, outside-mask "
                f"PSNR vs input {psnr_out:.1f} dB")
        log(f"  mask IoU vs reference SpecSeg masks: {mask_iou:.3f} "
            f"(precision {mask_precision:.3f}, recall {mask_recall:.3f}; "
            f"predicted frac {mask_pred_frac:.3f} vs ref {mask_ref_frac:.3f})")
        part_b = {"n": n, "mask_iou_vs_reference": round(mask_iou, 4),
                  "mask_precision_vs_reference": round(mask_precision, 4),
                  "mask_recall_vs_reference": round(mask_recall, 4),
                  "mask_predicted_fraction": round(mask_pred_frac, 4),
                  "mask_reference_fraction": round(mask_ref_frac, 4),
                  "per_output": stats,
                  "note": "no ground truth exists for these photographs; "
                          "specular_luma_drop should be positive (highlights "
                          "dimmed) and outside-mask PSNR high (scene "
                          "preserved). reference_output row measures the "
                          "reference's own published result crops the same "
                          "way."}
        for i in range(n):
            image_grid(
                [crops["inputs"][i], rb["mask"][i][..., 0],
                 crops["ref_masks"][i][..., 0], rb["gen_rgb_calibrated"][i],
                 rb["gen_rgb_composited"][i], crops["ref_outputs"][i]],
                titles=["photo", "our mask", "ref mask", "calibrated",
                        "composited", "ref output"],
                path=os.path.join(a.out, f"ood_photo_grid_{i}.png"))

    result = {"checkpoint_step": int(state.step),
              "image_size": a.image_size,
              "synthetic_ood": part_a,
              "reference_photos": part_b}
    path = os.path.join(a.out, "quality_ood.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {path}")
    return result


if __name__ == "__main__":
    main()
