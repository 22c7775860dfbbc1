"""Round-5 train-perf experiment (VERDICT r4 weak #7 / next #7).

The headline has been flat for three rounds (202.7 -> 210.3 -> 210.4 img/s,
~73% of the HBM roofline) and the r3 attribution parks the residual behind
"layout copies (~7.6% of bytes) + schedule overlap". This sweep measures the
software levers testable WITHOUT xprof on this rig, on the production path
(scan-chained b24 bf16 + Pallas instance-norm):

  unroll2 / unroll4   lax.scan body unrolling — XLA sees 2/4 consecutive
                      steps in one loop body and can overlap the tail of one
                      step's backward with the next step's preprocessing
                      (schedule-overlap lever; costs compile time + code size)
  bf16_params         model params cast to bf16 ONCE per step before the
                      forwards (master copies stay f32 in Adam): every model
                      forward/backward re-reads its param tree, so this
                      halves ~10 param-tree reads/step (layout-copy lever —
                      param reads are where the transpose-copy fusions sit)
  both                unroll2 + bf16_params

Each arm = one subprocess (clean HBM), min of 2 timed scan programs, K=100
steps. Success = >215 img/s on any arm; a flat table is the measured negative
result that closes the "layout copies" line (ROADMAP #4).

Usage: python examples/sweep_r5_perf.py --out benchmarks/trace_r5/sweep_r5_perf.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_SNIPPET = """
import dataclasses, json, time
import jax, jax.numpy as jnp
from jax import lax
from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import synth_polar_batch
from shmgan_tpu.train.state import create_train_state
from shmgan_tpu.train.step import make_train_step

batch, k, unroll, bf16_params = {batch}, {k}, {unroll}, {bf16_params}
cfg = Config()
cfg.model = dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                image_size=128,
                                use_pallas_instance_norm=True)
cfg.train = dataclasses.replace(cfg.train, batch_size=batch, remat="none")
state = create_train_state(cfg, jax.random.PRNGKey(0))
step_fn = make_train_step(cfg)

def cast_tree(t):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 1 else x, t)

def one_step(carry, xs):
    bt, rg = xs
    new_st, m = step_fn(carry, bt, rg, jnp.zeros((), jnp.int32))
    if bf16_params:
        # keep the carry dtype stable: the Adam add promotes bf16 params +
        # f32 updates to f32, so cast the trees back (a cheap convert fused
        # into the update write; every next-step read stays half-width)
        new_st = new_st.replace(g_params=cast_tree(new_st.g_params),
                                d_params=cast_tree(new_st.d_params))
    return new_st, m["total_G"]

@jax.jit
def scan_fn(state, batches, rngs):
    return lax.scan(one_step, state, (batches, rngs), unroll=unroll)

if bf16_params:
    # THROUGHPUT probe of a bf16-params regime: cast the model params once
    # before the scan — every forward/backward and the Adam updates then
    # read/write the trees at half the bytes (param reads are where the r3
    # attribution's transpose-copy fusions sit). Opt-state mu/nu stay f32.
    # Numerics change (this arm measures speed, not convergence; a win here
    # would justify the mixed-precision engineering).
    state = state.replace(g_params=cast_tree(state.g_params),
                          d_params=cast_tree(state.d_params))

views = jnp.asarray(synth_polar_batch(batch, 128, seed=0))
batches = jnp.broadcast_to(views, (k,) + views.shape)
rngs = jax.random.split(jax.random.PRNGKey(1), k)
state, tg = scan_fn(state, batches, rngs)   # compile + warm
float(tg[-1])
times = []
for _ in range(2):
    t0 = time.perf_counter()
    state, tg = scan_fn(state, batches, rngs)
    float(tg[-1])
    times.append(time.perf_counter() - t0)
dt = min(times)
print(json.dumps({{"images_per_sec": batch * k / dt,
                   "step_ms": dt / k * 1e3}}))
"""

ARMS = {
    "baseline": dict(unroll=1, bf16_params=False),
    "unroll2": dict(unroll=2, bf16_params=False),
    "unroll4": dict(unroll=4, bf16_params=False),
    "bf16_params": dict(unroll=1, bf16_params=True),
    "unroll2_bf16_params": dict(unroll=2, bf16_params=True),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--arms", type=str, default="")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--out", type=str,
                    default="benchmarks/trace_r5/sweep_r5_perf.json")
    args = ap.parse_args(argv)

    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.environ.get(
                   "JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache"),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
    names = args.arms.split(",") if args.arms else list(ARMS)
    results = {"batch": args.batch, "k": args.k, "arms": {}}
    for name in names:
        code = _SNIPPET.format(batch=args.batch, k=args.k, **ARMS[name])
        print(f"[sweep] {name} ...", flush=True)
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, text=True, env=env,
                                  timeout=args.timeout)
            row = None
            for line in reversed(proc.stdout.strip().splitlines()):
                if line.startswith("{"):
                    row = json.loads(line)
                    break
            if row is None:
                row = {"error": "\n".join(
                    proc.stderr.strip().splitlines()[-4:])[:400]}
        except subprocess.TimeoutExpired:
            row = {"error": "timeout"}
        results["arms"][name] = row
        print(f"[sweep] {name}: {row}", flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        time.sleep(30)  # relay breathing room between clients
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
