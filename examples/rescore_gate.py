"""Re-score an existing run's eval history under the best-checkpoint gate.

VERDICT r4 weak #2 "Done" condition: one re-scored history demonstrating the
recalibrated gate's behavior on real artifacts. For each history row this
replays the sequential selection (best/min_fid evolve in step order) under
both the OLD (x1.5+2.0) and NEW (x4.0+2.0) tolerances and reports which
checkpoints each gate crowns/vetoes.

Usage: python examples/rescore_gate.py benchmarks/quality_r4_dr256 \
           benchmarks/quality_r3_256 --out benchmarks/quality_r5_fidgate/rescore.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.quality_train import is_better_checkpoint  # noqa: E402


def replay(history, tol_rel, tol_abs):
    best = {"psnr": -1.0}
    min_fid = float("inf")
    rows = []
    for e in history:
        psnr, fid = float(e["gen_psnr"]), float(e["gen_fid"])
        ok = is_better_checkpoint(best, psnr, fid, min_fid, tol_rel, tol_abs)
        vetoed_by_fid = (not ok) and psnr > best.get("psnr", -1.0)
        if ok:
            best = {"psnr": psnr, "fid": fid, "step": e["step"]}
        min_fid = min(min_fid, fid)
        rows.append({"step": e["step"], "psnr": psnr, "fid": fid,
                     "crowned": ok, "fid_vetoed": vetoed_by_fid})
    return {"selected": best, "rows": rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+",
                    help="run dirs containing quality_live.json")
    ap.add_argument("--out", default="benchmarks/quality_r5_fidgate/rescore.json")
    args = ap.parse_args()

    result = {}
    for run in args.runs:
        live = os.path.join(run, "quality_live.json")
        if not os.path.exists(live):
            print(f"skip {run}: no quality_live.json")
            continue
        with open(live) as f:
            hist = json.load(f)["history"]
        old = replay(hist, 1.5, 2.0)
        new = replay(hist, 4.0, 2.0)
        result[run] = {"old_gate_x1.5+2.0": old, "new_gate_x4.0+2.0": new}
        o_v = [r["step"] for r in old["rows"] if r["fid_vetoed"]]
        n_v = [r["step"] for r in new["rows"] if r["fid_vetoed"]]
        print(f"{run}:")
        print(f"  old gate: selected {old['selected']}, FID-vetoed steps {o_v}")
        print(f"  new gate: selected {new['selected']}, FID-vetoed steps {n_v}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
