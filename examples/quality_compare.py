"""Join two quality-run eval histories into one step-matched A/B artifact.

Both runs of examples/quality_train.py evaluate the SAME held-out oracle set
(synth_eval_set seed 1234) every --eval_every steps, so entries at equal step
counts are directly comparable. This joins the histories, reports per-step
deltas, and summarizes which arm wins at matched budget.

Usage:
  python examples/quality_compare.py \
      --a benchmarks/quality_r2/quality_history.json --a_name conv_transpose \
      --b benchmarks/quality_r3_resizeconv/quality_live.json --b_name resize_conv \
      --out benchmarks/quality_r3_resizeconv/ab_vs_r2.json
"""

from __future__ import annotations

import argparse
import json


def load_history(path: str):
    with open(path) as f:
        d = json.load(f)
    return d["history"]  # both quality_live.json and quality_history.json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--a", required=True)
    p.add_argument("--b", required=True)
    p.add_argument("--a_name", default="A")
    p.add_argument("--b_name", default="B")
    p.add_argument("--min_step", type=int, default=0,
                   help="ignore entries below this step (e.g. 40000 to skip "
                        "pre-SSIM-fix r2 entries)")
    p.add_argument("--out", default="")
    a = p.parse_args(argv)

    ha = {e["step"]: e for e in load_history(a.a) if e["step"] >= a.min_step}
    hb = {e["step"]: e for e in load_history(a.b) if e["step"] >= a.min_step}
    common = sorted(set(ha) & set(hb))
    if not common:
        raise SystemExit("no common eval steps between the two histories")

    rows, b_wins_psnr, b_wins_ssim = [], 0, 0
    for s in common:
        ea, eb = ha[s], hb[s]
        d_psnr = round(eb["gen_psnr"] - ea["gen_psnr"], 4)
        d_ssim = round(eb["gen_ssim"] - ea["gen_ssim"], 4)
        d_fid = round(eb.get("gen_fid", float("nan"))
                      - ea.get("gen_fid", float("nan")), 5)
        b_wins_psnr += d_psnr > 0
        b_wins_ssim += d_ssim > 0
        rows.append({"step": s,
                     f"{a.a_name}_psnr": ea["gen_psnr"],
                     f"{a.b_name}_psnr": eb["gen_psnr"],
                     "d_psnr": d_psnr,
                     f"{a.a_name}_ssim": ea["gen_ssim"],
                     f"{a.b_name}_ssim": eb["gen_ssim"],
                     "d_ssim": d_ssim, "d_fid": d_fid})

    last = rows[-1]
    summary = {
        "a": {"name": a.a_name, "path": a.a},
        "b": {"name": a.b_name, "path": a.b},
        "common_eval_steps": len(common),
        "matched_budget_step": last["step"],
        "b_minus_a_at_matched_budget": {
            "psnr": last["d_psnr"], "ssim": last["d_ssim"],
            "fid": last["d_fid"]},
        "b_win_fraction": {
            "psnr": round(b_wins_psnr / len(common), 3),
            "ssim": round(b_wins_ssim / len(common), 3)},
        "rows": rows,
    }

    hdr = (f"{'step':>8} {a.a_name + '_psnr':>16} {a.b_name + '_psnr':>16} "
           f"{'d_psnr':>8} {'d_ssim':>8}")
    print(hdr)
    for r in rows:
        print(f"{r['step']:>8} {r[f'{a.a_name}_psnr']:>16.2f} "
              f"{r[f'{a.b_name}_psnr']:>16.2f} {r['d_psnr']:>8.2f} "
              f"{r['d_ssim']:>8.4f}")
    print(f"\nAt matched budget (step {last['step']}): "
          f"{a.b_name} - {a.a_name} = {last['d_psnr']:+.2f} dB PSNR, "
          f"{last['d_ssim']:+.4f} SSIM, {last['d_fid']:+.4f} FID; "
          f"{a.b_name} wins PSNR at {summary['b_win_fraction']['psnr']:.0%} "
          f"of eval points")

    if a.out:
        with open(a.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"-> {a.out}")
    return summary


if __name__ == "__main__":
    main()
