"""Serving A/B benchmark: request-batching window ON vs OFF under concurrent
clients (VERDICT r2 next #9 — the HTTP surface existed and was functionally
tested but never measured; the reference's only serving metric was per-image
wall time, test.py:299).

Spins up the real ThreadingHTTPServer (shmgan_tpu/serve_http.py) in-process on
an ephemeral port, fires N concurrent clients x R requests each at
POST /v1/specfree, and reports throughput + latency percentiles + the number
of device calls (batching efficiency) per configuration:

  A. batch_window_ms=0  (one device call per request — the naive path)
  B. batch_window_ms>0  (concurrent requests of one size aggregate into
     batched device calls, bounded by --batch_size)

Usage: python examples/serve_ab.py --out benchmarks/serve_ab.json
       (runs on whatever backend the environment provides; real numbers come
        from the TPU — keep the chip otherwise idle)
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _png_body(image_size: int, seed: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = (rng.uniform(0, 1, (image_size, image_size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _run_config(cfg, g_params, specseg_vars, *, window_ms, batch_size,
                clients, requests_per_client, image_size):
    import urllib.request

    from shmgan_tpu.serve_http import make_server

    srv = make_server(cfg, g_params, specseg_vars, host="127.0.0.1", port=0,
                      batch_size=batch_size, batch_window_ms=window_ms,
                      warm_sizes=(image_size,))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    bodies = [_png_body(image_size, s) for s in range(clients)]
    latencies = [[] for _ in range(clients)]
    errors = [0] * clients

    def client(ci):
        url = f"http://127.0.0.1:{port}/v1/specfree"
        for _ in range(requests_per_client):
            req = urllib.request.Request(url, data=bodies[ci], method="POST",
                                         headers={"Content-Type": "image/png"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=120) as resp:
                    resp.read()
                latencies[ci].append(time.perf_counter() - t0)
            except Exception:
                errors[ci] += 1

    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats",
                                timeout=30) as resp:
        stats = json.loads(resp.read())
    srv.shutdown()

    lat = np.array([l for ls in latencies for l in ls]) * 1e3
    total = int(lat.size)
    out = {
        "window_ms": window_ms,
        "batch_size": batch_size,
        "clients": clients,
        "requests": total,
        "errors": int(sum(errors)),
        "throughput_rps": round(total / wall, 2),
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 1) if total else None,
        "latency_ms_p95": round(float(np.percentile(lat, 95)), 1) if total else None,
        "latency_ms_mean": round(float(lat.mean()), 1) if total else None,
        "device_calls": stats.get("device_calls"),
        "requests_per_device_call": round(total / max(stats.get("device_calls", 1), 1), 2),
    }
    log(f"window={window_ms}ms b{batch_size}: {out['throughput_rps']} req/s, "
        f"p50 {out['latency_ms_p50']}ms p95 {out['latency_ms_p95']}ms, "
        f"{out['device_calls']} device calls ({out['requests_per_device_call']}"
        f" req/call), {out['errors']} errors")
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--filter_size", type=int, default=64)
    p.add_argument("--specseg_base_filters", type=int, default=16)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests_per_client", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--window_ms", type=float, default=25.0)
    p.add_argument("--bundle", type=str, default="",
                   help="inference bundle (--mode export); random weights if unset"
                        " (serving perf is weight-value independent)")
    p.add_argument("--out", type=str, default="benchmarks/serve_ab.json")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax

    from shmgan_tpu.config import Config

    cfg = Config()
    cfg.model = dataclasses.replace(
        cfg.model, image_size=a.image_size, filter_size=a.filter_size,
        specseg_base_filters=a.specseg_base_filters)
    log(f"backend: {jax.default_backend()}")

    if a.bundle:
        from shmgan_tpu.checkpoint import load_inference_bundle
        g_params, specseg_vars, header = load_inference_bundle(a.bundle)
        cfg.model = dataclasses.replace(
            cfg.model, image_size=header["image_size"],
            filter_size=header["filter_size"], c_dim=header["c_dim"],
            specseg_base_filters=header["specseg_base_filters"],
            upsample_mode=header.get("upsample_mode", "conv_transpose"))
    else:
        from shmgan_tpu.train.state import create_train_state
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        g_params, specseg_vars = state.g_params, state.specseg_vars

    result = {
        "image_size": cfg.model.image_size,
        "clients": a.clients,
        "requests_per_client": a.requests_per_client,
        "no_window_b1": _run_config(
            cfg, g_params, specseg_vars, window_ms=0.0, batch_size=1,
            clients=a.clients, requests_per_client=a.requests_per_client,
            image_size=cfg.model.image_size),
        "window_batched": _run_config(
            cfg, g_params, specseg_vars, window_ms=a.window_ms,
            batch_size=a.batch_size, clients=a.clients,
            requests_per_client=a.requests_per_client,
            image_size=cfg.model.image_size),
    }
    r0, r1 = result["no_window_b1"], result["window_batched"]
    if r0["throughput_rps"] and r1["throughput_rps"]:
        result["throughput_speedup"] = round(
            r1["throughput_rps"] / r0["throughput_rps"], 2)

    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {a.out}")
    return result


if __name__ == "__main__":
    main()
