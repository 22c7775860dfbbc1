"""Benchmark: fused SHMGAN train-step throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": "train_step_images_per_sec", "value": N, "unit": "images/sec/chip",
   "vs_baseline": R, ...}

Headline = the fused train step in bf16 compute (f32 params/losses) at batch 24 —
the round-2 sweep's throughput sweet spot (DESIGN.md §6/§8; b32 regresses). bf16
convergence is validated against f32 (200-step trajectories match within noise).
Strict-parity f32 batch-8, bf16 batch-16, and single-RGB inference are reported
in `detail`.

Baseline note (BASELINE.md): the reference publishes NO numbers; its regime is an
RTX-3070 running the whole 6-G/12-D-forward step EAGERLY at batch 1 with a host
round-trip for SpecSeg per step (SURVEY.md §3.2). Such a step is dominated by
Python dispatch plus the keras .predict round-trip; 2 images/sec is a generous
estimate. The driver-set target is >=5x reference, so
vs_baseline = headline / (2 img/s * 5) — 1.0 means the 5x target is exactly met.

Robustness: this rig reaches its TPU through a network relay that (a) reports
readiness optimistically (so timing syncs on VALUE fetches, not block_until_ready)
and (b) occasionally wedges a client process. Each measurement therefore runs in
its own subprocess with a timeout and one retry; partial failures degrade the
detail dict instead of killing the benchmark. Benchmark data stays device-resident
so the tunnel is never on the measured path.
"""

import json
import os
import subprocess
import sys
import time

REF_EAGER_IMG_PER_SEC = 2.0     # estimated reference throughput (see docstring)
TARGET_MULTIPLIER = 5.0
SECTION_TIMEOUT_S = 600

# Persistent XLA compilation cache: each section subprocess would otherwise pay a
# full remote compile; with the cache, reruns (and later bench rounds) start hot.
_CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
_SECTION_ENV = dict(
    os.environ,
    JAX_COMPILATION_CACHE_DIR=_CACHE_DIR,
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
    JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0",
)

_TRAIN_SNIPPET = """
import dataclasses, json, time
import jax, jax.numpy as jnp
from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import synth_polar_batch
from shmgan_tpu.train.state import create_train_state
from shmgan_tpu.train.step import make_train_step

dtype, batch, iters, warmup = {dtype!r}, {batch}, {iters}, 3
cfg = Config()
cfg.model = dataclasses.replace(cfg.model, compute_dtype=dtype,
                                image_size={image_size})
cfg.train = dataclasses.replace(cfg.train, batch_size=batch, remat={remat!r})
state = create_train_state(cfg, jax.random.PRNGKey(0))
step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
views = jnp.asarray(synth_polar_batch(batch, cfg.model.image_size, seed=0))
epoch = jnp.zeros((), jnp.int32)
rngs = jax.random.split(jax.random.PRNGKey(1), iters + warmup)
for i in range(warmup):
    state, m = step(state, views, rngs[i], epoch)
float(m["total_G"])  # hard sync via value fetch
t0 = time.perf_counter()
for i in range(iters):
    state, m = step(state, views, rngs[warmup + i], epoch)
float(m["total_G"])  # donated-state chain serializes all steps
dt = time.perf_counter() - t0
print(json.dumps({{"images_per_sec": batch * iters / dt,
                   "step_ms": dt / iters * 1e3}}))
"""

_SCAN_TRAIN_SNIPPET = """
import dataclasses, json, time
import jax, jax.numpy as jnp
from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import synth_polar_batch
from shmgan_tpu.train.state import create_train_state
from shmgan_tpu.train.step import make_scan_train_steps

# The PRODUCTION training path (examples/quality_train.py): K steps chained
# inside one lax.scan program, one dispatch per chunk instead of per step.
# The per-step sections above pay ~18 ms of host/relay dispatch per step;
# real training does not (it scans 50-100 steps per program).
dtype, batch, k = {dtype!r}, {batch}, {k}
cfg = Config()
cfg.model = dataclasses.replace(cfg.model, compute_dtype=dtype,
                                image_size={image_size},
                                use_pallas_instance_norm={pallas})
cfg.train = dataclasses.replace(cfg.train, batch_size=batch, remat={remat!r})
state = create_train_state(cfg, jax.random.PRNGKey(0))
scan_fn = jax.jit(make_scan_train_steps(cfg), donate_argnums=(0,))
views = jnp.asarray(synth_polar_batch(batch, cfg.model.image_size, seed=0))
batches = jnp.broadcast_to(views, (k,) + views.shape)
rngs = jax.random.split(jax.random.PRNGKey(1), k)
epoch = jnp.zeros((), jnp.int32)
state, m = scan_fn(state, batches, rngs, epoch)   # compile + warm
float(m["total_G"][-1])
t0 = time.perf_counter()
state, m = scan_fn(state, batches, rngs, epoch)
float(m["total_G"][-1])  # value fetch = hard sync
dt = time.perf_counter() - t0
print(json.dumps({{"images_per_sec": batch * k / dt,
                   "step_ms": dt / k * 1e3}}))
"""

_INFER_SNIPPET = """
import json, time
import jax, jax.numpy as jnp
from shmgan_tpu.config import Config
from shmgan_tpu.data.synthetic import synth_polar_batch
from shmgan_tpu.infer import make_infer_fn
from shmgan_tpu.train.state import create_train_state

# Iterations are chained INSIDE one jit (lax.scan with the output feeding the next
# input) so the measurement excludes host dispatch entirely: this host reaches the
# TPU through a relay whose per-dispatch round-trip (~55ms) would otherwise swamp
# the ~1-2ms on-chip latency.
batch, iters, key = {batch}, 50, {key!r}
cfg = Config()
state = create_train_state(cfg, jax.random.PRNGKey(0))
infer = make_infer_fn(cfg, outputs={outputs!r})
rgb = jnp.asarray(synth_polar_batch(batch, cfg.model.image_size, seed=1)[0])

@jax.jit
def chained(g_params, specseg_vars, rgb):
    def body(carry, _):
        out = infer(g_params, specseg_vars, carry)
        nxt = rgb + 0.0 * out[key][..., :1].mean()
        return nxt, out[key][0, 0, 0, 0]
    _, ys = jax.lax.scan(body, rgb, None, length=iters)
    return ys

ys = chained(state.g_params, state.specseg_vars, rgb)
float(ys[0])  # warmup + compile
t0 = time.perf_counter()
ys = chained(state.g_params, state.specseg_vars, rgb)
float(ys[-1])
dt = time.perf_counter() - t0
print(json.dumps({{"images_per_sec": batch * iters / dt,
                   "latency_ms": dt / iters * 1e3}}))
"""


def _run_section(name: str, code: str, retries: int = 1):
    for attempt in range(retries + 1):
        print(f"[bench] {name} (attempt {attempt + 1}) ...", file=sys.stderr,
              flush=True)
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, text=True,
                                  env=_SECTION_ENV,
                                  timeout=SECTION_TIMEOUT_S)
            for line in reversed(proc.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    out = json.loads(line)
                    print(f"[bench] {name}: {out}", file=sys.stderr, flush=True)
                    return out
            tail = "\n".join(proc.stderr.strip().splitlines()[-6:])
            print(f"[bench] {name} produced no result (rc={proc.returncode}); "
                  f"stderr tail:\n{tail}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] {name} timed out", file=sys.stderr, flush=True)
        # the relay needs a cool-down after a killed/crashed client
        if attempt < retries:
            time.sleep(120)
    return None


def _other_tpu_clients() -> list:
    """PIDs of other python processes that look like TPU benchmark/training runs.
    Two clients sharing this rig's TPU relay silently corrupt each other's
    numbers (measured), so bench WAITS for them to exit before measuring."""
    import subprocess as sp
    me = str(os.getpid())
    # exclude the whole ancestor chain: drivers wrap bench in shell/timeout
    # layers whose command lines also contain "bench.py"
    ancestors = set()
    pid = os.getpid()
    for _ in range(16):
        ancestors.add(str(pid))
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split()[3])
        except (OSError, ValueError, IndexError):
            break
        if pid <= 1:
            break
    try:
        out = sp.run(["ps", "-eo", "pid,args"], capture_output=True, text=True).stdout
    except Exception:
        return []
    def on_cpu_backend(pid: str) -> bool:
        # env vars don't show in ps args (e.g. dryrun_multichip's clean-env CPU
        # child); /proc/<pid>/environ has the truth for same-user processes
        try:
            with open(f"/proc/{pid}/environ", "rb") as f:
                env_blob = f.read()
            return b"JAX_PLATFORMS=cpu" in env_blob
        except OSError:
            return False

    pids = []
    for line in out.splitlines():
        line = line.strip()
        if not line or line.startswith(me + " "):
            continue
        if ("bench.py" in line or "shmgan" in line or "quality_train" in line
                or "__graft_entry__" in line) and "python" in line \
                and "pytest" not in line and "claude" not in line \
                and "JAX_PLATFORMS=cpu" not in line:
            pid = line.split()[0]
            if pid not in ancestors and not on_cpu_backend(pid):
                pids.append(pid)
    return pids


# How long to wait for a competing TPU client (e.g. a still-running training
# job) to finish before measuring anyway. Capped well below the driver's own
# kill timeout: round 2 proved that waiting longer converts contention into a
# MISSING artifact (rc=124) — a contended-but-measured number beats no number,
# so after this budget bench measures anyway with the "contended" flag set.
CONTENTION_WAIT_S = int(os.environ.get("BENCH_CONTENTION_WAIT_S", "300"))


def _wait_for_exclusive() -> bool:
    """Block until no other TPU client is live (plus a relay cool-down), or the
    wait budget runs out. Returns True if exclusive access was obtained."""
    deadline = time.time() + CONTENTION_WAIT_S
    waited = False
    while True:
        others = _other_tpu_clients()
        if not others:
            if waited:
                # the relay needs a cool-down after another client exits
                print("[bench] contention cleared; cooling down 120s",
                      file=sys.stderr, flush=True)
                time.sleep(120)
            return True
        if time.time() >= deadline:
            print(f"[bench] ERROR: other TPU clients still live after "
                  f"{CONTENTION_WAIT_S}s wait ({others})", file=sys.stderr,
                  flush=True)
            return False
        print(f"[bench] waiting for other TPU clients to exit: {others}",
              file=sys.stderr, flush=True)
        waited = True
        time.sleep(30)


def main():
    exclusive = _wait_for_exclusive()
    results = {}
    if not exclusive:
        results["contended"] = 1.0

    t = _run_section("train f32 b8", _TRAIN_SNIPPET.format(
        dtype="float32", batch=8, remat="none", iters=20, image_size=128))
    if t:
        results["train_f32_b8_images_per_sec"] = t["images_per_sec"]
        results["train_f32_b8_step_ms"] = t["step_ms"]

    t2 = _run_section("train bf16 b16", _TRAIN_SNIPPET.format(
        dtype="bfloat16", batch=16, remat="none", iters=20, image_size=128))
    if t2:
        results["train_bf16_b16_images_per_sec"] = t2["images_per_sec"]
        results["train_bf16_b16_step_ms"] = t2["step_ms"]

    # round-2 batch sweep found b24 the throughput sweet spot (b32 regresses:
    # XLA's per-image HBM traffic grows and peak memory nearly doubles)
    t3 = _run_section("train bf16 b24", _TRAIN_SNIPPET.format(
        dtype="bfloat16", batch=24, remat="none", iters=20, image_size=128))
    if t3:
        results["train_bf16_b24_images_per_sec"] = t3["images_per_sec"]
        results["train_bf16_b24_step_ms"] = t3["step_ms"]

    # remat=models recomputes the heavy model forwards in the backward instead
    # of storing activations — trades idle MXU FLOPs for HBM traffic (the
    # bound resource; DESIGN.md roofline) and frees memory for larger batches.
    # Numerics identical (tests/test_remat.py). Headline takes the max.
    t4 = _run_section("train bf16 b32 remat", _TRAIN_SNIPPET.format(
        dtype="bfloat16", batch=32, remat="models", iters=20, image_size=128))
    if t4:
        results["train_bf16_b32_remat_images_per_sec"] = t4["images_per_sec"]
        results["train_bf16_b32_remat_step_ms"] = t4["step_ms"]

    # The PRODUCTION dispatch path: K steps chained in one lax.scan program
    # with the fused Pallas instance-norm kernel — exactly how
    # examples/quality_train.py trains on TPU (--pallas_in auto). Round-3
    # measurement note: scan K=100 vs per-step timing differ by <0.5% (the
    # relay pipelines per-step dispatch), so this section's edge over the b24
    # per-step row is the Pallas kernel (+2.2%) + scan (+1.3%); headline-
    # eligible because it IS the trainer's hot path, not a synthetic best case.
    t5 = _run_section("train bf16 b24 scan100 pallas", _SCAN_TRAIN_SNIPPET.format(
        dtype="bfloat16", batch=24, remat="none", image_size=128, k=100,
        pallas=True))
    if t5:
        results["train_bf16_b24_scan_images_per_sec"] = t5["images_per_sec"]
        results["train_bf16_b24_scan_step_ms"] = t5["step_ms"]

    # Flagship-resolution section (VERDICT r2 weak #7). The round-3 256px
    # sweeps (benchmarks/trace_r3/sweep_256.json, sweep_256_ext.json) found
    # remat a pure loss at 256 (b12: 27.1 -> 33.7 img/s without it) and the
    # batch frontier at b24 no-remat: 46.6 img/s (b16 39.4, b20 42.3;
    # b28+ exhausts HBM even with disc-only remat). Reported in detail; NOT
    # headline-eligible (the headline and vs_baseline stay defined at the
    # reference's 128px).
    t6 = _run_section("train256 bf16 b24", _TRAIN_SNIPPET.format(
        dtype="bfloat16", batch=24, remat="none", iters=10, image_size=256))
    if t6:
        results["train256_bf16_b24_images_per_sec"] = t6["images_per_sec"]
        results["train256_bf16_b24_step_ms"] = t6["step_ms"]

    inf1 = _run_section("infer b1", _INFER_SNIPPET.format(
        batch=1, key="gen_rgb", outputs=None))
    if inf1:
        results["infer_b1_images_per_sec"] = inf1["images_per_sec"]
        results["infer_b1_latency_ms"] = inf1["latency_ms"]

    inf8 = _run_section("infer b8", _INFER_SNIPPET.format(
        batch=8, key="gen_rgb", outputs=None))
    if inf8:
        results["infer_b8_images_per_sec"] = inf8["images_per_sec"]

    # The SERVING graph: only the keys the HTTP/folder paths consume, so XLA
    # prunes the denorm/composited branches (serve_http builds its engines
    # with exactly this outputs tuple).
    inf8s = _run_section("infer b8 serving outputs", _INFER_SNIPPET.format(
        batch=8, key="gen_rgb_calibrated",
        outputs=("gen_rgb_calibrated", "mask")))
    if inf8s:
        results["infer_b8_serving_images_per_sec"] = inf8s["images_per_sec"]

    candidates = [v for k, v in results.items() if k.startswith("train_")
                  and k.endswith("images_per_sec")]
    headline = max(candidates) if candidates else 0.0
    vs_baseline = headline / (REF_EAGER_IMG_PER_SEC * TARGET_MULTIPLIER)
    print(json.dumps({
        "metric": "train_step_images_per_sec",
        "value": round(headline, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {k: round(v, 3) for k, v in results.items()},
        "baseline_note": "reference eager RTX-3070 est. 2 img/s; vs_baseline is "
                         "headline / (2 img/s * 5x target); headline is the best "
                         "validated 128px train config incl. the scan-chained "
                         "production dispatch path (256px reported in detail, "
                         "not headline-eligible)",
    }))


if __name__ == "__main__":
    main()
