"""Rebuild a clean eval history from the quality-training log.

The round-2 run was interrupted/resumed (relay wedge + an orphaned duplicate
process window); the authoritative record is the append-only training log, not
the last-writer-wins JSON. This parses '[gan eval @N]' lines, keeps the LAST
occurrence per step (the corrected-SSIM process wrote later), and rewrites the
history array of the live artifact.

Usage: python examples/rebuild_history.py <train_log> <out_json>
"""

import json
import re
import sys

PAT = re.compile(
    r"\[gan eval @(\d+)\] gen PSNR ([\d.]+) SSIM ([\d.]+) FID (-?[\d.]+) \| "
    r"input PSNR ([\d.]+) SSIM ([\d.]+) FID (-?[\d.]+) \| (BEATS|trails)")


def main(log_path: str, out_path: str):
    entries = {}
    for line in open(log_path):
        m = PAT.search(line)
        if not m:
            continue
        step = int(m.group(1))
        entries[step] = {
            "step": step,
            "gen_psnr": float(m.group(2)), "gen_ssim": float(m.group(3)),
            "gen_fid": float(m.group(4)),
            "input_psnr": float(m.group(5)), "input_ssim": float(m.group(6)),
            "input_fid": float(m.group(7)),
            "beats_identity": m.group(8) == "BEATS",
        }
    history = [entries[s] for s in sorted(entries)]
    # "best" only among entries whose SSIM was computed post-fix (>= 40000)
    # and that beat the identity baseline outright
    candidates = [e for e in history
                  if e["step"] >= 40000 and e["beats_identity"]] or history
    best = max(candidates, key=lambda e: e["gen_psnr"]) if history else None
    with open(out_path, "w") as f:
        json.dump({"note": "rebuilt from the append-only training log; "
                           "entries before step 40000 predate the SSIM "
                           "TPU-precision fix (commit 31e155e) and understate "
                           "SSIM by ~0.3 absolute",
                   "history": history,
                   "best_by_psnr": best}, f, indent=1)
    print(f"{len(history)} evals -> {out_path}; best {best}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
