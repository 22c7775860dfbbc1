"""Capture an XProf/TensorBoard trace of the fused train step on the TPU.

Produces the profiler artifact ROADMAP item 6 asks for: a trace directory
(benchmarks/trace_r2/...) loadable in TensorBoard/XProf, plus a JSON sidecar
with the measured step time under trace and the devices profiled. The trace
covers K consecutive donated-state steps so the capture shows the steady-state
HBM-resident pipeline, not the warm-up.

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
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--out", type=str, default="benchmarks/trace_r2")
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
    cfg.train = dataclasses.replace(cfg.train, batch_size=a.batch)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    views = jnp.asarray(synth_polar_batch(a.batch, a.image_size, seed=0))
    epoch = jnp.zeros((), jnp.int32)
    rngs = jax.random.split(jax.random.PRNGKey(1), a.steps + 3)

    # warm-up/compile outside the trace
    for i in range(3):
        state, m = step(state, views, rngs[i], epoch)
    float(m["total_G"])

    os.makedirs(a.out, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(a.out):
        for i in range(a.steps):
            state, m = step(state, views, rngs[3 + i], epoch)
        sync = float(m["total_G"])  # value fetch = hard sync inside the trace
    dt = time.perf_counter() - t0

    sidecar = {
        "batch": a.batch, "image_size": a.image_size, "dtype": a.dtype,
        "steps_traced": a.steps,
        "step_ms_under_trace": round(dt / a.steps * 1e3, 3),
        "images_per_sec_under_trace": round(a.batch * a.steps / dt, 1),
        "backend": jax.default_backend(),
        "final_total_G": round(sync, 4),
    }
    with open(os.path.join(a.out, "trace_summary.json"), "w") as f:
        json.dump(sidecar, f, indent=1)
    print(json.dumps(sidecar))
    print(f"[profile] trace -> {a.out} (load with TensorBoard/XProf)")


if __name__ == "__main__":
    main()
