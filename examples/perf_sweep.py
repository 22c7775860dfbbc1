"""Train-step throughput sweep over (dtype, batch, remat) on the real TPU.

Reuses bench.py's subprocess isolation, contention gate, and timing snippet so
numbers here are directly comparable to BENCH_r*.json. One variant at a time —
ONE TPU client rule (CLAUDE.md).

Usage:
  python examples/perf_sweep.py --out benchmarks/perf_sweep.json \
      --variants bf16:24:none bf16:24:models bf16:32:models bf16:48:models
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module)

_DTYPES = {"f32": "float32", "bf16": "bfloat16"}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variants", nargs="+",
                   default=["bf16:24:none", "bf16:24:models",
                            "bf16:32:models", "bf16:48:models"],
                   help="dtype:batch:remat[:image_size[:scanK[:pallas]]] "
                        "(dtype in f32|bf16; 'scan20' = 20 steps chained in "
                        "one lax.scan program, the production dispatch path; "
                        "trailing 'pallas' enables the fused instance-norm "
                        "kernel)")
    p.add_argument("--out", default="benchmarks/perf_sweep.json")
    a = p.parse_args(argv)

    if not bench._wait_for_exclusive():
        print("[sweep] another TPU client is live; aborting", file=sys.stderr)
        return 1

    rows = []
    for v in a.variants:
        parts = v.split(":")
        dt, batch, remat = parts[0], int(parts[1]), parts[2]
        image_size = int(parts[3]) if len(parts) > 3 else 128
        scan_k = 0
        if len(parts) > 4 and parts[4].startswith("scan"):
            scan_k = int(parts[4][4:] or "20")
        pallas = len(parts) > 5 and parts[5] == "pallas"
        if scan_k:
            code = bench._SCAN_TRAIN_SNIPPET.format(
                dtype=_DTYPES[dt], batch=batch, remat=remat,
                image_size=image_size, k=scan_k, pallas=pallas)
        else:
            code = bench._TRAIN_SNIPPET.format(
                dtype=_DTYPES[dt], batch=batch, remat=remat,
                image_size=image_size, iters=20)
        r = bench._run_section(f"train {v}", code)
        rows.append({"variant": v, "dtype": _DTYPES[dt], "batch": batch,
                     "remat": remat, "image_size": image_size,
                     "scan_k": scan_k,
                     "images_per_sec": round(r["images_per_sec"], 2) if r else None,
                     "step_ms": round(r["step_ms"], 2) if r else None})

    print(f"{'variant':>18} {'img/s':>9} {'step_ms':>9}")
    for r in rows:
        print(f"{r['variant']:>18} {r['images_per_sec'] or float('nan'):>9} "
              f"{r['step_ms'] or float('nan'):>9}")
    if a.out:
        os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
        with open(a.out, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
        print(f"-> {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
