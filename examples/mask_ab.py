"""A/B two frozen SpecSeg nets on the reference figure's real photographs.

The round-2 OOD artifact showed the base-curriculum SpecSeg transfers badly
to real photos (mask IoU 0.107 vs the reference's own masks, precision-limited
— it fires on bright diffuse regions). data/synthetic_dr.py is the attack;
this script measures whether a retrained net actually moves the needle,
WITHOUT needing a generator checkpoint (SpecSeg-only inference via
shmgan_tpu.infer.make_mask_fn).

Reference behavior being matched: the frozen specsegv3 mask stage of the
reference pipeline (ShmGANwithSSpecSeg.py:930-931, test.py:21-39) on
arbitrary single RGB photographs.

Usage:
  python examples/mask_ab.py \
      --nets base=benchmarks/quality_r2/specseg_synth.msgpack \
             dr=benchmarks/quality_r3_dr/specseg_dr.msgpack \
      --ensembles both=base+dr \
      --out benchmarks/quality_r3_dr/mask_ab.json

--ensembles rows average the nets' sigmoid probabilities before
thresholding — the standard variance-reduction move for a domain with the
high run-to-run transfer variance the dr/dr2/dr3/dr4 campaign measured.
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
    p.add_argument("--nets", nargs="*", default=[],
                   help="name=path.msgpack pairs")
    p.add_argument("--arms", nargs="*", default=[],
                   help="name=path1,path2,... multi-SEED arms (VERDICT r3 "
                        "next #3): each path is one seed's weights; every "
                        "seed is evaluated as its own row (name#i) and the "
                        "artifact adds per-arm mean+-sd over seeds for every "
                        "scalar metric — campaign verdicts must quote these, "
                        "not single-seed numbers (measured seed swing: 0.171 "
                        "vs 0.213 photo IoU on one curriculum)")
    p.add_argument("--ensembles", nargs="*", default=[],
                   help="name=netA+netB[+netC...] rows: mean of the named "
                        "nets' sigmoid probabilities (names from --nets)")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--specseg_base_filters", type=int, default=16)
    p.add_argument("--ood_n", type=int, default=64,
                   help="synthetic-OOD scenes for the GT-mask IoU column")
    p.add_argument("--out", type=str, default="benchmarks/quality_r3_dr/mask_ab.json")
    p.add_argument("--tta", action="store_true",
                   help="also report each net with dihedral mask TTA "
                        "(rows named '<name>+tta')")
    p.add_argument("--prior", action="store_true",
                   help="also report each net fused with the dichromatic "
                        "chroma prior (ops/specprior.py; rows named "
                        "'<name>+prior')")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        # env vars alone are NOT enough on this rig: sitecustomize imports
        # jax at interpreter startup with the axon (TPU) platform, so the
        # config update is what actually flips the backend (same pattern as
        # ood_eval.py; without it a --cpu run silently grabs the TPU relay)
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from shmgan_tpu.checkpoint import (load_specseg_weights,
                                       specseg_in_channels_of)
    from shmgan_tpu.config import Config
    from shmgan_tpu.data.ood import reference_photo_crops, synth_ood_set
    from shmgan_tpu.infer import make_mask_fn

    variants = {"": dict()}
    if a.tta:
        variants["+tta"] = dict(tta=True)
    if a.prior:
        variants["+prior"] = dict(prior=True)
        if a.tta:
            variants["+tta+prior"] = dict(tta=True, prior=True)

    # mask fns are built lazily per (variant, in_channels): 1-channel parity
    # nets and 2-channel chroma-input nets (auto-detected from the msgpack)
    # evaluate through the same rows
    _fn_cache = {}

    def mask_fn_for(suffix, in_ch):
        key = (suffix, in_ch)
        if key not in _fn_cache:
            cfg = Config()
            cfg.model = dataclasses.replace(
                cfg.model, image_size=a.image_size,
                specseg_base_filters=a.specseg_base_filters,
                specseg_in_channels=in_ch, compute_dtype="float32")
            _fn_cache[key] = make_mask_fn(cfg, **variants[suffix])
        return _fn_cache[key]
    log(f"backend: {jax.default_backend()}")

    crops = reference_photo_crops(a.image_size)
    ood_in, _, ood_mask = synth_ood_set(a.ood_n, a.image_size, seed=4242)

    def iou_pr(pred, ref, thresh=0.5):
        pb = (pred > thresh).astype(np.float32)
        rb = (ref > 0.5).astype(np.float32)
        inter = float((pb * rb).sum())
        union = float(np.maximum(pb, rb).sum())
        return {"iou": round(inter / max(union, 1.0), 4),
                "precision": round(inter / float(max(pb.sum(), 1.0)), 4),
                "recall": round(inter / float(max(rb.sum(), 1.0)), 4),
                "pred_fraction": round(float(pb.mean()), 4)}

    THRESH_GRID = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

    def make_row(ood_pred, ph_pred, meta):
        row = dict(meta)
        row["synthetic_ood_vs_gt"] = iou_pr(ood_pred, ood_mask)
        # PHOTO-FREE operating-point selection (VERDICT r4 next #4): pick the
        # threshold maximizing IoU on the synthetic-OOD probe (disjoint
        # family, GT masks — no real-photo leakage), then report the photo
        # metrics AT that threshold. The shipped default 0.5 was never
        # optimized; the r4 sweep showed photo IoU still rising at 0.7.
        ood_by_t = {str(t): iou_pr(ood_pred, ood_mask, t)["iou"]
                    for t in THRESH_GRID}
        best_t = float(max(ood_by_t, key=ood_by_t.get))
        row["ood_iou_by_threshold"] = ood_by_t
        row["ood_selected_threshold"] = best_t
        if ph_pred is not None:
            row["real_photos_vs_reference_masks"] = iou_pr(
                ph_pred, crops["ref_masks"])
            row["real_photos_at_ood_threshold"] = iou_pr(
                ph_pred, crops["ref_masks"], best_t)
            # operating-curve diagnostic: where does the IoU peak sit? (a
            # net whose best threshold is far from 0.5 is mis-calibrated,
            # one whose peak IoU is low is mis-shaped)
            row["photo_iou_by_threshold"] = {
                str(t): iou_pr(ph_pred, crops["ref_masks"], t)["iou"]
                for t in THRESH_GRID}
            # dilation diagnostic: if the net's hits sit INSIDE the
            # reference regions (adjacency-limited recall), growing the
            # prediction recovers IoU; if whole components are missed,
            # it can't. Separates "too tight" from "blind".
            row["photo_iou_by_dilation"] = {}
            for rad in (1, 2, 3):
                k = 2 * rad + 1
                pb = (ph_pred > 0.5).astype(np.float32)
                pad = np.pad(pb, ((0, 0), (rad, rad), (rad, rad), (0, 0)))
                dil = np.max(np.stack(
                    [pad[:, dy:dy + pb.shape[1], dx:dx + pb.shape[2]]
                     for dy in range(k) for dx in range(k)]), axis=0)
                row["photo_iou_by_dilation"][str(rad)] = iou_pr(
                    dil, crops["ref_masks"])["iou"]
        return row

    if not a.nets and not a.arms:
        raise SystemExit("at least one of --nets / --arms is required")

    results = {}
    preds = {}  # (net_name, suffix) -> (ood_pred, ph_pred)

    def eval_net(base_name, path):
        vars_ = load_specseg_weights(path, base_filters=a.specseg_base_filters,
                                     image_size=a.image_size)
        in_ch = specseg_in_channels_of(vars_)
        for suffix in variants:
            mask_fn = mask_fn_for(suffix, in_ch)
            name = base_name + suffix
            ood_pred = np.asarray(mask_fn(vars_, jnp.asarray(ood_in)))
            ph_pred = (np.asarray(mask_fn(vars_, jnp.asarray(crops["inputs"])))
                       if crops is not None else None)
            preds[(base_name, suffix)] = (ood_pred, ph_pred)
            row = make_row(ood_pred, ph_pred,
                           {"weights": path, "tta": "tta" in suffix,
                            "prior": "prior" in suffix,
                            "in_channels": in_ch})
            results[name] = row
            log(f"{name}: ood_iou={row['synthetic_ood_vs_gt']['iou']} "
                f"photo={row.get('real_photos_vs_reference_masks')}")

    for spec in a.nets:
        base_name, path = spec.split("=", 1)
        eval_net(base_name, path)

    # multi-seed arms: per-seed rows plus a mean+-sd aggregate per variant
    arm_stats = {}
    for spec in a.arms:
        arm_name, paths_s = spec.split("=", 1)
        paths = paths_s.split(",")
        for i, path in enumerate(paths):
            eval_net(f"{arm_name}#{i}", path)
        for suffix in variants:
            seed_rows = [results[f"{arm_name}#{i}{suffix}"]
                         for i in range(len(paths))]
            agg = {"n_seeds": len(paths), "tta": "tta" in suffix,
                   "prior": "prior" in suffix}
            for section in ("synthetic_ood_vs_gt",
                            "real_photos_vs_reference_masks",
                            "real_photos_at_ood_threshold"):
                if section not in seed_rows[0]:
                    continue
                agg[section] = {}
                for metric in seed_rows[0][section]:
                    vals = np.array([r[section][metric] for r in seed_rows],
                                    dtype=np.float64)
                    agg[section][metric] = {
                        "mean": round(float(vals.mean()), 4),
                        "sd": round(float(vals.std(ddof=1)), 4)
                        if len(vals) > 1 else 0.0,
                        "seeds": [round(float(v), 4) for v in vals]}
            arm_stats[arm_name + suffix] = agg
            if "real_photos_vs_reference_masks" in agg:
                m = agg["real_photos_vs_reference_masks"]["iou"]
                log(f"ARM {arm_name}{suffix}: photo IoU "
                    f"{m['mean']} +- {m['sd']} (n={agg['n_seeds']})")

    for spec in a.ensembles:
        ens_name, members_s = spec.split("=", 1)
        members = members_s.split("+")
        for suffix in variants:
            name = ens_name + suffix
            missing = [m for m in members if (m, suffix) not in preds]
            if missing:
                log(f"skip ensemble {name}: unknown nets {missing}")
                continue
            ood_pred = np.mean([preds[(m, suffix)][0] for m in members], axis=0)
            ph_pred = (np.mean([preds[(m, suffix)][1] for m in members], axis=0)
                       if crops is not None else None)
            row = make_row(ood_pred, ph_pred,
                           {"ensemble_of": members, "tta": "tta" in suffix,
                            "prior": "prior" in suffix})
            results[name] = row
            log(f"{name}: ood_iou={row['synthetic_ood_vs_gt']['iou']} "
                f"photo={row.get('real_photos_vs_reference_masks')}")

    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump({"image_size": a.image_size,
                   "ref_mask_fraction": (round(float(
                       (crops["ref_masks"] > 0.5).mean()), 4)
                       if crops is not None else None),
                   "nets": results, "arms": arm_stats}, f, indent=1)
    log(f"wrote {a.out}")
    return results


if __name__ == "__main__":
    main()
