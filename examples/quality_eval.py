"""Final quality evaluation against the identity baseline — the round artifact.

Restores a trained checkpoint (examples/quality_train.py) and evaluates the
full product surface on a FRESH held-out set (host numpy curriculum, a seed
never used in training or its periodic oracle):

  * gen_rgb_calibrated  — raw reconstruction in the input's [0,1] RGB domain
  * gen_rgb_composited  — input outside the dilated specular mask,
                          reconstruction inside (the product deliverable)
  * identity baseline   — the input itself

Metrics: PSNR, SSIM (max_val=1, honest), SpecSeg-embedding FID, plus the
reference-style table (eval/metrics.py::evaluate_pair — SSIM on rescaled
images at max_val 5, deltaE76/94; the skewed forms test.py:336-347 uses).
Writes JSON + PNG galleries under --out.

Usage: python examples/quality_eval.py --ckpt_dir /root/ckpt_quality_r2 \
           --out benchmarks/quality_r2 [--step N] [--eval_n 128]
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
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--out", type=str, default="benchmarks/quality_r2")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--filter_size", type=int, default=64)
    p.add_argument("--specseg_base_filters", type=int, default=16)
    p.add_argument("--upsample_mode", choices=["conv_transpose", "resize_conv"],
                   default="conv_transpose",
                   help="must match the mode the checkpoint was trained with "
                        "(the two modes share one param-tree structure, so a "
                        "mismatch restores silently but evaluates the wrong op)")
    p.add_argument("--use_ema", action="store_true",
                   help="evaluate the EMA generator tree saved by a --g_ema "
                        "training run (falls back to raw params if the "
                        "checkpoint predates EMA)")
    p.add_argument("--mask_tta", action="store_true",
                   help="dihedral mask TTA in the inference graph")
    p.add_argument("--eval_n", type=int, default=128)
    p.add_argument("--specseg_in_channels", type=int, default=1, choices=[1, 2],
                   help="2 when the checkpoint's SpecSeg is chroma-input "
                        "(ops/specprior.py) — the restore template must match")
    p.add_argument("--seed", type=int, default=999,
                   help="held-out scene seed (never used in training)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tag", type=str, default="final")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from shmgan_tpu.checkpoint import CheckpointManager
    from shmgan_tpu.config import Config
    from shmgan_tpu.data.synthetic import synth_eval_set
    from shmgan_tpu.eval.metrics import evaluate_pair
    from shmgan_tpu.infer import make_infer_fn
    from shmgan_tpu.ops.ssim import ssim as ssim_fn
    from shmgan_tpu.train.state import create_train_state

    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, image_size=a.image_size, filter_size=a.filter_size,
        specseg_base_filters=a.specseg_base_filters, compute_dtype="float32",
        specseg_in_channels=a.specseg_in_channels,
        upsample_mode=a.upsample_mode)
    if a.use_ema:
        # template needs the EMA slot for restore to pick it up (restore seeds
        # it from g_params when the checkpoint predates EMA)
        cfg.train = dataclasses.replace(cfg.train, g_ema=0.999)
    if a.mask_tta:
        cfg.eval = dataclasses.replace(cfg.eval, mask_tta=True)
    log(f"backend: {jax.default_backend()}")

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(a.ckpt_dir)
    restored = ckpt.restore(state, step=a.step)
    if restored is None:
        raise SystemExit(f"no checkpoint under {a.ckpt_dir}")
    state = restored
    eval_g = (state.ema_g_params if a.use_ema and state.ema_g_params is not None
              else state.g_params)
    log(f"restored checkpoint step {int(state.step)}"
        + (" (EMA generator)" if a.use_ema else ""))

    ins_np, gts_np, _ = synth_eval_set(a.eval_n, a.image_size, seed=a.seed)
    infer = make_infer_fn(cfg)

    def batched_infer(rgb_np):
        outs = {}
        for i in range(0, rgb_np.shape[0], a.batch):
            out = infer(eval_g, state.specseg_vars,
                        jnp.asarray(rgb_np[i:i + a.batch]))
            for k in ("gen_rgb_calibrated", "gen_rgb_composited", "mask"):
                outs.setdefault(k, []).append(np.asarray(out[k]))
        return {k: np.concatenate(v) for k, v in outs.items()}

    out = batched_infer(ins_np)

    # All metric terms are per-image, so the whole evaluation streams in
    # --batch chunks (numerically identical to one full-set call). One program
    # over eval_n 256px images would be a multi-GB SpecSeg-features allocation
    # and a long device program — both relay hazards (CLAUDE.md chunk rule).
    from shmgan_tpu.eval.fid import frechet_distance, specseg_features

    def chunked_feats(x_np):
        fs = []
        for i in range(0, x_np.shape[0], a.batch):
            fs.append(np.asarray(specseg_features(
                state.specseg_vars, jnp.asarray(x_np[i:i + a.batch]),
                base_filters=cfg.model.specseg_base_filters)))
        return np.concatenate(fs)

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
        m = {"psnr": round(psnr, 4), "ssim": round(ssim, 4),
             "fid": round(fid, 5), "reference_style": ref_style}
        log(f"{name}: PSNR {psnr:.2f} SSIM {ssim:.4f} FID {fid:.4f} "
            f"(ref-style: {ref_style})")
        return m

    result = {
        "checkpoint_step": int(state.step),
        "eval_n": a.eval_n,
        "heldout_seed": a.seed,
        "identity_baseline": metrics(ins_np, "identity (input)"),
        "gen_calibrated": metrics(out["gen_rgb_calibrated"], "calibrated"),
        "gen_composited": metrics(out["gen_rgb_composited"], "composited"),
    }
    for key in ("gen_calibrated", "gen_composited"):
        base = result["identity_baseline"]
        m = result[key]
        m["beats_identity"] = bool(m["psnr"] > base["psnr"]
                                   and m["ssim"] > base["ssim"])

    os.makedirs(a.out, exist_ok=True)
    path = os.path.join(a.out, f"quality_{a.tag}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {path}")

    from shmgan_tpu.utils.viz import image_grid
    for i in range(min(4, a.eval_n)):
        image_grid(
            [ins_np[i], out["mask"][i][..., 0], out["gen_rgb_calibrated"][i],
             out["gen_rgb_composited"][i], gts_np[i]],
            titles=["input", "mask", "calibrated", "composited", "diffuse GT"],
            path=os.path.join(a.out, f"{a.tag}_grid_{i}.png"))
    log("galleries written")
    return result


if __name__ == "__main__":
    main()
