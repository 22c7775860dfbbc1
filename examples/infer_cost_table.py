"""Per-output-subset cost table for the single-RGB inference graph.

VERDICT r4 weak #1: the default `make_infer_fn(outputs=None)` scan-chained
measurement fell 1909 -> 864 img/s (b8) between rounds 2 and 4 with nobody
attributing it. This harness times the SAME scan-chained measurement
(bench.py's _INFER_SNIPPET shape) for every interesting `outputs=` subset so
the regressing subgraph is named by measurement, not guess.

Rows:
  - each single output alone (gen_rgb, mask, gen_y, denorm, calibrated,
    composited)
  - the r2 output set (gen_rgb, gen_rgb_denorm, mask, gen_y) — the graph the
    1909 img/s number was measured on
  - the serving tuple (gen_rgb_calibrated, mask)
  - the full default (outputs=None)
  - "inline" variants that chain the UN-jitted inner function, to separate
    "extra ops in the graph" from "nested-pjit boundary blocks XLA DCE of
    unconsumed outputs"

Writes benchmarks/infer_cost_table.json and prints the table.

Usage (real TPU, exclusive):  python examples/infer_cost_table.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import synth_polar_batch
from shmgan_tpu.infer import make_infer_fn
from shmgan_tpu.train.state import create_train_state


def chained_timer(infer_fn, key, rgb, g_params, specseg_vars, iters=50,
                  reps=3):
    """bench.py's scan-chained measurement: iterations inside ONE program so
    the relay's per-dispatch latency is off the measured path.

    Measures `reps` timed repetitions and returns (first_s, best_s) per
    iteration: the ROUND-5 FINDING (this file's artifact) is that the first
    timed repetition of the first program in a process runs ~2.4x slower
    than steady state on this deployment — bench rounds 3-4 reported exactly
    that cold number (864-941 img/s) while steady state is ~2050-2100, which
    manufactured the apparent 1909 -> 864 'regression' vs round 2 (measured:
    every output subset times within 4% of every other once warm)."""

    @jax.jit
    def chained(g_params, specseg_vars, rgb):
        def body(carry, _):
            out = infer_fn(g_params, specseg_vars, carry)
            nxt = rgb + 0.0 * out[key][..., :1].mean()
            return nxt, out[key][0, 0, 0, 0]
        _, ys = jax.lax.scan(body, rgb, None, length=iters)
        return ys

    ys = chained(g_params, specseg_vars, rgb)
    float(ys[0])  # compile + warm (value fetch = hard sync over the relay)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        ys = chained(g_params, specseg_vars, rgb)
        float(ys[-1])
        times.append(time.perf_counter() - t0)
    return times[0] / iters, min(times) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", default="benchmarks/infer_cost_table.json")
    args = ap.parse_args()

    cfg = Config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rgb = jnp.asarray(synth_polar_batch(args.batch, cfg.model.image_size,
                                        seed=1)[0])
    g_params, sv = state.g_params, state.specseg_vars

    rows = {}

    def run(name, outputs, key, inline=False):
        fn = make_infer_fn(cfg, outputs=outputs)
        if inline:
            fn = fn.__wrapped__  # the raw traceable body, no inner pjit
        first, best = chained_timer(fn, key, rgb, g_params, sv,
                                    iters=args.iters)
        rows[name] = {"ms_per_iter": best * 1e3,
                      "ms_per_iter_first_rep": first * 1e3,
                      "images_per_sec": args.batch / best}
        print(f"{name:42s} {best*1e3:8.3f} ms/iter (first {first*1e3:7.3f}) "
              f"{args.batch/best:10.1f} img/s", flush=True)
        # incremental write: a kill mid-run keeps every measured row
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"batch": args.batch, "iters": args.iters,
                       "rows": rows}, f, indent=1)

    # DECISIVE rows first (a timeout/kill still leaves the attribution):
    # pruned-to-one vs the r2 output set vs today's default.
    run("gen_rgb", ("gen_rgb",), "gen_rgb")
    run("default(outputs=None)", None, "gen_rgb")
    run("r2_set(rgb,denorm,mask,gen_y)",
        ("gen_rgb", "gen_rgb_denorm", "mask", "gen_y"), "gen_rgb")
    run("serving(calibrated,mask)",
        ("gen_rgb_calibrated", "mask"), "gen_rgb_calibrated")
    # inline variants: does the nested-pjit boundary block DCE?
    run("default_inline(outputs=None)", None, "gen_rgb", inline=True)
    run("gen_rgb_inline", ("gen_rgb",), "gen_rgb", inline=True)
    # per-output singles (attribution detail)
    run("mask", ("mask",), "mask")
    run("gen_rgb_calibrated", ("gen_rgb_calibrated",), "gen_rgb_calibrated")
    run("gen_rgb_composited", ("gen_rgb_composited",), "gen_rgb_composited")
    run("gen_rgb_denorm", ("gen_rgb_denorm",), "gen_rgb_denorm")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"batch": args.batch, "iters": args.iters, "rows": rows},
                  f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
