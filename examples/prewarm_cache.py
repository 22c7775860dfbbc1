"""Pre-warm the persistent XLA compilation cache with every bench.py section.

The cache (JAX_COMPILATION_CACHE_DIR, default /root/.jax_comp_cache) lives
OUTSIDE the repo, and VM resets that wipe it are a proven recurring event
(CLAUDE.md round-3 sessions 3 and 6). A cold cache cost round 3 its driver
benchmark: every section paid a multi-minute remote compile and the driver's
kill budget expired (BENCH_r03.json rc=124). Run this script early in any
session after a reset — it executes each bench section once (exact same
shapes/programs, so the cache keys match) with a generous timeout, leaving
bench.py itself to start hot.

Usage (from the repo root, with the TPU idle):
    python examples/prewarm_cache.py [--timeout 900]
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: SECTIONS + _SECTION_ENV)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-section timeout in seconds (cold compiles are slow)")
    args = ap.parse_args()

    t_start = time.time()
    ok, failed = [], []
    for name, prefix, code, _fields in bench.SECTIONS:
        print(f"[prewarm] {name} ...", file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, text=True,
                                  env=bench._SECTION_ENV, timeout=args.timeout)
            status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            status = "timeout"
        dt = time.time() - t0
        print(f"[prewarm] {name}: {status} in {dt:.0f}s", file=sys.stderr,
              flush=True)
        (ok if status == "ok" else failed).append(name)
        if status != "ok":
            # a killed client needs a relay cool-down before the next section
            time.sleep(120)
    print(f"[prewarm] done in {time.time() - t_start:.0f}s: "
          f"{len(ok)} ok, {len(failed)} failed {failed}", file=sys.stderr,
          flush=True)
    return 0 if not failed else 1


if __name__ == "__main__":
    sys.exit(main())
