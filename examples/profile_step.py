"""Profile the fused train step on the TPU: cost analysis + steady-state timing.

Produces the profiler artifact ROADMAP item 6 asks for. Default mode writes a
JSON with XLA's compiled cost analysis (FLOPs, HBM bytes accessed, peak
memory) and the measured steady-state step time — from which it derives
achieved TFLOPS, HBM bandwidth, and the compute-vs-memory roofline position.

--xprof additionally captures a TensorBoard/XProf device trace. WARNING: on
this deployment's TPU network relay, jax.profiler.trace WEDGES the relay (the
trace session never closes over the tunnel; measured: probe failures for ~10
minutes afterward) — use --xprof only on directly-attached TPUs.

Usage (TPU; counts as the one allowed TPU client):
  python examples/profile_step.py [--batch 16] [--dtype bfloat16] [--steps 6]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--remat", choices=["none", "models"], default="none")
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--out", type=str, default="benchmarks/trace_r2")
    p.add_argument("--xprof", action="store_true",
                   help="capture a real XProf device trace (WEDGES the TPU "
                        "relay on this deployment — see module docstring)")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from shmgan_tpu.config import Config
    from shmgan_tpu.data.synthetic import synth_polar_batch
    from shmgan_tpu.train.state import create_train_state
    from shmgan_tpu.train.step import make_train_step

    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=a.image_size,
                                    compute_dtype=a.dtype)
    cfg.train = dataclasses.replace(cfg.train, batch_size=a.batch,
                                    remat=a.remat)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg)
    views = jnp.asarray(synth_polar_batch(a.batch, a.image_size, seed=0))
    epoch = jnp.zeros((), jnp.int32)
    rngs = jax.random.split(jax.random.PRNGKey(1), a.steps + 3)

    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
        state, views, rngs[0], epoch).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0] if cost else {}
    mem = compiled.memory_analysis()

    step = jax.jit(step_fn, donate_argnums=(0,))
    # warm-up (donated-state chain), then timed steady-state steps
    for i in range(3):
        state, m = step(state, views, rngs[i], epoch)
    float(m["total_G"])
    t0 = time.perf_counter()
    for i in range(a.steps):
        state, m = step(state, views, rngs[3 + i], epoch)
    sync = float(m["total_G"])  # value fetch = hard sync
    dt = time.perf_counter() - t0

    step_s = dt / a.steps
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    sidecar = {
        "batch": a.batch, "image_size": a.image_size, "dtype": a.dtype,
        "steps_timed": a.steps,
        "step_ms": round(step_s * 1e3, 3),
        "images_per_sec": round(a.batch / step_s, 1),
        "xla_flops_per_step": flops,
        "achieved_tflops": round(flops / step_s / 1e12, 2),
        "xla_bytes_accessed_per_step": bytes_accessed,
        "achieved_hbm_gbps": round(bytes_accessed / step_s / 1e9, 1),
        "peak_memory_bytes": getattr(mem, "temp_size_in_bytes", None),
        "argument_memory_bytes": getattr(mem, "argument_size_in_bytes", None),
        "backend": jax.default_backend(),
        "final_total_G": round(sync, 4),
    }
    os.makedirs(a.out, exist_ok=True)
    with open(os.path.join(a.out, "trace_summary.json"), "w") as f:
        json.dump(sidecar, f, indent=1)
    print(json.dumps(sidecar))

    if a.xprof:
        t0 = time.perf_counter()
        with jax.profiler.trace(a.out):
            for i in range(a.steps):
                state, m = step(state, views, rngs[3 + i], epoch)
            float(m["total_G"])
        print(f"[profile] xprof trace -> {a.out} "
              f"({time.perf_counter() - t0:.1f}s under trace)")


if __name__ == "__main__":
    main()
