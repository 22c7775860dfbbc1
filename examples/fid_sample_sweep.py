"""FID small-sample estimator sweep — the 256px "FID cliff" investigation
(VERDICT r3 weak #5).

quality_r3_256's oracle FID jumped 2.17 -> 15.15 between steps 17500 and
20000 while PSNR/SSIM moved by +0.003 on the SAME fixed eval set. The
checkpoints for a true bisect were destroyed by a VM reset, but the committed
step-20000 fp16 bundle allows testing the leading hypothesis: the oracle used
eval_n=64 samples against a D=256-dimensional embedding (SpecSeg bottleneck),
so both covariances have rank <= 63 and the Fréchet trace terms sit in the
estimator's strongly biased, unstable regime (a same-distribution draw at
n=64/D=256 with isotropic features measures FID ~308, not 0).

This sweep evaluates ONE fixed generator (the committed bundle) at several
eval-set sizes and seeds. If the generator had collapsed, FID stays high at
every n; if the cliff was estimator noise, FID falls sharply with n and
swings across seeds at n=64.

Usage: python examples/fid_sample_sweep.py \
         --bundle artifacts/shmgan_infer_256.msgpack \
         --out benchmarks/quality_r4_fidsweep/fid_sweep_256.json
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
    p.add_argument("--bundle", type=str,
                   default="artifacts/shmgan_infer_256.msgpack")
    p.add_argument("--sizes", type=str, default="64,128,256")
    p.add_argument("--seeds", type=str, default="1234,4321")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out", type=str,
                   default="benchmarks/quality_r4_fidsweep/fid_sweep_256.json")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from shmgan_tpu.checkpoint import load_inference_bundle
    from shmgan_tpu.config import Config
    from shmgan_tpu.data.synthetic import synth_eval_set
    from shmgan_tpu.eval.fid import frechet_distance, specseg_features
    from shmgan_tpu.infer import make_infer_fn

    g_params, specseg_vars, hdr = load_inference_bundle(a.bundle)
    size = hdr["image_size"]
    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, image_size=size, filter_size=hdr["filter_size"],
        specseg_base_filters=hdr["specseg_base_filters"],
        compute_dtype="float32",
        upsample_mode=hdr.get("upsample_mode", "conv_transpose"),
        specseg_in_channels=hdr.get("specseg_in_channels", 1))
    infer = make_infer_fn(cfg, outputs=("gen_rgb_calibrated",))
    log(f"bundle {a.bundle}: step {hdr.get('step')} @{size}px; "
        f"backend {jax.default_backend()}")

    @jax.jit
    def feats_of(rgb):
        return specseg_features(specseg_vars, rgb,
                                base_filters=cfg.model.specseg_base_filters)

    @jax.jit
    def gen_of(rgb):
        return infer(g_params, specseg_vars, rgb)["gen_rgb_calibrated"]

    sizes = [int(s) for s in a.sizes.split(",")]
    seeds = [int(s) for s in a.seeds.split(",")]
    n_max = max(sizes)

    rows = []
    for seed in seeds:
        ins_np, gts_np, _ = synth_eval_set(n_max, size, seed=seed)
        gen_feats, gt_feats = [], []
        for i in range(0, n_max, a.batch):
            ins_c = jnp.asarray(ins_np[i:i + a.batch])
            gts_c = jnp.asarray(gts_np[i:i + a.batch])
            gen_feats.append(np.asarray(feats_of(gen_of(ins_c))))
            gt_feats.append(np.asarray(feats_of(gts_c)))
        gen_feats = np.concatenate(gen_feats)
        gt_feats = np.concatenate(gt_feats)
        for n in sizes:
            fid = float(frechet_distance(jnp.asarray(gen_feats[:n]),
                                         jnp.asarray(gt_feats[:n])))
            rows.append({"seed": seed, "n": n, "fid": round(fid, 4)})
            log(f"seed {seed} n={n}: FID {fid:.4f}")

    # same-distribution control: GT-vs-GT on disjoint halves quantifies the
    # pure estimator floor at each n (a collapsed generator cannot hide here)
    controls = []
    for n in sizes:
        if 2 * n <= n_max:
            fid0 = float(frechet_distance(jnp.asarray(gt_feats[:n]),
                                          jnp.asarray(gt_feats[n:2 * n])))
            controls.append({"n": n, "gt_vs_gt_fid": round(fid0, 4)})
            log(f"control gt-vs-gt n={n}: FID {fid0:.4f}")

    out = {"bundle": a.bundle, "step": hdr.get("step"), "image_size": size,
           "feature_dim": 16 * cfg.model.specseg_base_filters,
           "rows": rows, "controls": controls}
    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {a.out}")
    return out


if __name__ == "__main__":
    main()
