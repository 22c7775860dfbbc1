"""Benchmark: fused SHMGAN train-step throughput on the attached TPU chip.

Prints the summary JSON line
  {"metric": "train_step_images_per_sec", "value": N, "unit": "images/sec/chip",
   "vs_baseline": R, ...}
INCREMENTALLY — once after EVERY completed section (the last line on stdout is
always the most complete summary; a driver that kills this process mid-run
still gets every number measured up to that point). Sections are ordered
headline-first so even a single completed section yields the number that
matters.

Headline = the fused train step in bf16 compute (f32 params/losses) at batch 24
on the PRODUCTION dispatch path (K steps chained in one lax.scan program with
the Pallas instance-norm kernel — exactly how examples/quality_train.py
trains). Round-2/3 sweeps: b24 is the throughput sweet spot (b32 regresses),
bf16 convergence validated against f32. Strict-parity f32 batch-8, bf16
batch-16/24 per-step, 256px, and inference are reported in `detail`.

Baseline note (BASELINE.md): the reference publishes NO numbers; its regime is
an RTX-3070 running the whole 6-G/12-D-forward step EAGERLY at batch 1 with a
host round-trip for SpecSeg per step (SURVEY.md §3.2). Such a step is dominated
by Python dispatch plus the keras .predict round-trip; 2 images/sec is a
generous estimate. The driver-set target is >=5x reference, so
vs_baseline = headline / (2 img/s * 5) — 1.0 means the 5x target is exactly met.

Robustness (three rounds of driver artifacts shaped this design):
- Each measurement runs in its own subprocess with a timeout and one retry;
  partial failures degrade the detail dict instead of killing the benchmark.
- A persistent XLA compilation cache makes retries and reruns start hot; a
  timed-out first attempt still populates the cache, so the retry usually
  succeeds (BENCH_r03 tail shows exactly this pattern).
- The summary is re-emitted after every section because round 3 proved an
  end-only emit loses every measured number to a driver kill (rc=124,
  parsed=null despite two sections having succeeded).
- Benchmark data stays device-resident so the relay tunnel is never on the
  measured path; timing syncs on VALUE fetches (the relay acks
  block_until_ready optimistically).
- examples/prewarm_cache.py compiles all section shapes ahead of time after a
  VM reset (the cache lives outside the repo and resets are recurring).
"""

import json
import os
import subprocess
import sys
import time

REF_EAGER_IMG_PER_SEC = 2.0     # estimated reference throughput (see docstring)
TARGET_MULTIPLIER = 5.0
SECTION_TIMEOUT_S = 600

# Persistent XLA compilation cache: each section subprocess would otherwise pay
# a full remote compile; with the cache, reruns (and later bench rounds) start
# hot.
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

# One subprocess measures SEVERAL (dtype, batch, remat) rows back to back —
# the interpreter+relay startup (~15s) and the import cost amortize over the
# whole list instead of being paid per row (VERDICT r4 next #5: the 9-section
# suite outran the driver's budget at 7/9).
rows = {rows!r}
image_size, iters, warmup = {image_size}, {iters}, 2
out = {{}}
for name, dtype, batch, remat in rows:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, compute_dtype=dtype,
                                    image_size=image_size)
    cfg.train = dataclasses.replace(cfg.train, batch_size=batch, remat=remat)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    views = jnp.asarray(synth_polar_batch(batch, image_size, seed=0))
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
    out[name + "_images_per_sec"] = batch * iters / dt
    out[name + "_step_ms"] = dt / iters * 1e3
    del state, step, views  # free donated buffers before the next row
print(json.dumps(out))
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
# The per-step sections pay ~18 ms of host/relay dispatch per step;
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
# min of 2 timed reps: the round-5 infer attribution found the first timed
# repetition in a process can run slow on this deployment (the 11s program
# mostly amortizes the ramp, but the headline deserves the insurance)
times = []
for _ in range(2):
    t0 = time.perf_counter()
    state, m = scan_fn(state, batches, rngs, epoch)
    float(m["total_G"][-1])  # value fetch = hard sync
    times.append(time.perf_counter() - t0)
dt = min(times)
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

# Iterations are chained INSIDE one jit (lax.scan with the output feeding the
# next input) so the measurement excludes host dispatch entirely: this host
# reaches the TPU through a relay whose per-dispatch round-trip (~55ms) would
# otherwise swamp the ~1-2ms on-chip latency. All infer rows share one
# subprocess (startup amortization, VERDICT r4 next #5).
#
# Timing = MIN over 3 repetitions. Round-5 attribution
# (benchmarks/infer_cost_table.json): the FIRST timed repetition of the first
# program in a process runs ~2.4x slower than steady state on this
# deployment; the single-rep protocol of rounds 3-4 reported that cold number
# (infer b8 "regressed" 1909 -> 864 img/s while the steady-state graph never
# changed speed — every output subset measures 2040-2115 img/s warm).
rows = {rows!r}
cfg = Config()
state = create_train_state(cfg, jax.random.PRNGKey(0))
out = {{}}
def make_chained(infer, key, iters):
    @jax.jit
    def chained(g_params, specseg_vars, rgb):
        def body(carry, _):
            o = infer(g_params, specseg_vars, carry)
            nxt = rgb + 0.0 * o[key][..., :1].mean()
            return nxt, o[key][0, 0, 0, 0]
        _, ys = jax.lax.scan(body, rgb, None, length=iters)
        return ys
    return chained

for name, batch, key, outputs in rows:
    infer = make_infer_fn(cfg, outputs=outputs)
    rgb = jnp.asarray(synth_polar_batch(batch, cfg.model.image_size, seed=1)[0])
    iters = 50
    chained = make_chained(infer, key, iters)
    ys = chained(state.g_params, state.specseg_vars, rgb)
    float(ys[0])  # warmup + compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ys = chained(state.g_params, state.specseg_vars, rgb)
        float(ys[-1])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    out[name + "_images_per_sec"] = batch * iters / dt
    out[name + "_latency_ms"] = dt / iters * 1e3
    out[name + "_first_rep_latency_ms"] = times[0] / iters * 1e3
print(json.dumps(out))
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
    """PIDs of other python processes that look like TPU benchmark/training
    runs. Two clients sharing this rig's TPU relay silently corrupt each
    other's numbers (measured), so bench WAITS for them to exit before
    measuring."""
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


# Sections in HEADLINE-FIRST order: the first row is the production training
# path whose number is the benchmark's headline; everything after it only adds
# detail. A driver kill after any completed section still leaves a valid
# summary line on stdout. Each entry: (display name, result key prefix,
# snippet, result-field map | None). fields=None merges every key of the
# subprocess's JSON as-is (the folded multi-row sections emit pre-prefixed
# keys). Round-5 restructure (VERDICT r4 next #5): 9 sections -> 4
# subprocesses so interpreter+relay startup amortizes and the whole suite
# fits the driver's kill budget.
SECTIONS = [
    # The PRODUCTION dispatch path: K steps chained in one lax.scan program
    # with the fused Pallas instance-norm kernel — exactly how
    # examples/quality_train.py trains on TPU (--pallas_in auto). Round-3
    # measurement: scan K=100 vs per-step timing differ by <0.5% (the relay
    # pipelines per-step dispatch), so this section's edge over the b24
    # per-step row is the Pallas kernel (+2.2%) + scan (+1.3%); headline-
    # eligible because it IS the trainer's hot path, not a synthetic best case.
    ("train bf16 b24 scan100 pallas", "train_bf16_b24_scan",
     _SCAN_TRAIN_SNIPPET.format(dtype="bfloat16", batch=24, remat="none",
                                image_size=128, k=100, pallas=True),
     {"images_per_sec": "images_per_sec", "step_ms": "step_ms"}),
    # Per-step detail rows, ONE subprocess: b24 sweet spot (b32 regresses),
    # b16/f32 history rows, b32+remat (recomputes model forwards in the
    # backward — trades MXU FLOPs for HBM traffic; numerics identical,
    # tests/test_remat.py).
    ("train detail 128px (b24/b16/f32/b32r)", "train_detail",
     _TRAIN_SNIPPET.format(rows=[
         ("train_bf16_b24", "bfloat16", 24, "none"),
         ("train_bf16_b16", "bfloat16", 16, "none"),
         ("train_f32_b8", "float32", 8, "none"),
         ("train_bf16_b32_remat", "bfloat16", 32, "models"),
     ], iters=10, image_size=128),
     None),
    # Flagship-resolution section (VERDICT r2 weak #7). The round-3 256px
    # sweeps found remat a pure loss at 256 and the batch frontier at b24
    # no-remat. Reported in detail; NOT headline-eligible (the headline and
    # vs_baseline stay defined at the reference's 128px).
    ("train256 bf16 b24", "train256_bf16_b24",
     _TRAIN_SNIPPET.format(rows=[
         ("train256_bf16_b24", "bfloat16", 24, "none"),
     ], iters=8, image_size=256),
     None),
    # Inference rows, ONE subprocess. infer_b8_gen_rgb is the pruned
    # single-output graph (the r2-comparable row — VERDICT r4 weak #1's
    # regression tracker); infer_b8_serving is exactly the outputs tuple
    # serve_http compiles.
    ("infer suite (b1/b8/serving/gen_rgb)", "infer_suite",
     _INFER_SNIPPET.format(rows=[
         ("infer_b1", 1, "gen_rgb", None),
         ("infer_b8", 8, "gen_rgb", None),
         ("infer_b8_serving", 8, "gen_rgb_calibrated",
          ("gen_rgb_calibrated", "mask")),
         ("infer_b8_gen_rgb", 8, "gen_rgb", ("gen_rgb",)),
     ]),
     None),
]

# 256px rows are detail-only: headline/vs_baseline stay defined at the
# reference's 128px resolution.
_HEADLINE_EXCLUDE_PREFIXES = ("train256",)


def _has_headline(results: dict) -> bool:
    """True once at least one headline-eligible train number is measured."""
    return any(k.startswith("train_") and k.endswith("images_per_sec")
               for k in results)


def _emit_summary(results: dict, sections_done: int) -> None:
    """Print the full summary JSON line from everything measured so far.
    Called after EVERY section so the last stdout line is always the most
    complete summary a driver kill would leave behind (BENCH_r03 lesson)."""
    candidates = [v for k, v in results.items()
                  if k.startswith("train_") and k.endswith("images_per_sec")
                  and not k.startswith(_HEADLINE_EXCLUDE_PREFIXES)]
    headline = max(candidates) if candidates else 0.0
    vs_baseline = headline / (REF_EAGER_IMG_PER_SEC * TARGET_MULTIPLIER)
    print(json.dumps({
        "metric": "train_step_images_per_sec",
        "value": round(headline, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {k: round(v, 3) for k, v in results.items()},
        "sections_done": sections_done,
        "sections_total": len(SECTIONS),
        "baseline_note": "reference eager RTX-3070 est. 2 img/s; vs_baseline is "
                         "headline / (2 img/s * 5x target); headline is the best "
                         "validated 128px train config incl. the scan-chained "
                         "production dispatch path (256px reported in detail, "
                         "not headline-eligible)",
    }), flush=True)


def main():
    exclusive = _wait_for_exclusive()
    results = {}
    if not exclusive:
        results["contended"] = 1.0

    for i, (name, prefix, code, fields) in enumerate(SECTIONS):
        out = _run_section(name, code)
        if out:
            if fields is None:   # folded section: keys arrive pre-prefixed
                results.update(out)
            else:
                for src, dst in fields.items():
                    results[f"{prefix}_{dst}"] = out[src]
        # Emit the running summary only once a headline-eligible number
        # exists: a summary with value=0.0 would record a false measurement,
        # while no line at all is correctly treated as a failed bench.
        if _has_headline(results):
            _emit_summary(results, sections_done=i + 1)


if __name__ == "__main__":
    main()
