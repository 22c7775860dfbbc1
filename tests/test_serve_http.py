"""HTTP serving front-end tests (serve_http.py): endpoints, engine pool,
error handling — all against a live ThreadingHTTPServer on an ephemeral port
with a tiny CPU model."""

import dataclasses
import io
import json
import threading
import urllib.request
import urllib.error

import jax
import numpy as np
import pytest

from shmgan_tpu.config import Config
from shmgan_tpu.serve_http import make_server
from shmgan_tpu.train.state import create_train_state


def tiny_cfg(size=32) -> Config:
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, image_size=size, filter_size=8,
                                    specseg_base_filters=4,
                                    compute_dtype="float32")
    return cfg


def png_bytes(size=32, seed=0) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = (rng.uniform(0, 1, (size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    cfg = tiny_cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    srv = make_server(cfg, state.g_params, state.specseg_vars)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": "image/png"})
    return urllib.request.urlopen(req, timeout=600)


class TestHTTPServing:
    def test_healthz(self, server):
        with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
            payload = json.loads(r.read())
        assert payload["status"] == "ok"
        assert payload["devices"] >= 1

    def test_specfree_image(self, server):
        from PIL import Image

        with _post(server + "/v1/specfree", png_bytes()) as r:
            assert r.headers["Content-Type"] == "image/png"
            img = Image.open(io.BytesIO(r.read()))
        assert img.size == (32, 32)

    def test_specfree_mask_and_json(self, server):
        from PIL import Image

        with _post(server + "/v1/specfree?output=mask", png_bytes(seed=1)) as r:
            mask = Image.open(io.BytesIO(r.read()))
        assert mask.size == (32, 32)

        with _post(server + "/v1/specfree?output=composited",
                   png_bytes(seed=1)) as r:
            comp = Image.open(io.BytesIO(r.read()))
        assert comp.size == (32, 32)

        with _post(server + "/v1/specfree?output=json", png_bytes(seed=2)) as r:
            payload = json.loads(r.read())
        assert 0.0 <= payload["mask_coverage"] <= 1.0
        import base64
        img = Image.open(io.BytesIO(base64.b64decode(payload["image_png_b64"])))
        assert img.size == (32, 32)

    def test_bad_body_is_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server + "/v1/specfree", b"this is not an image")
        assert exc.value.code == 400

    def test_unknown_path_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(server + "/nope", timeout=60)
        assert exc.value.code == 404

    def test_stats_counts(self, server):
        with urllib.request.urlopen(server + "/stats", timeout=60) as r:
            payload = json.loads(r.read())
        assert payload["requests"] >= 3
        assert payload["latency_ema_ms"] > 0

    def test_stats_reports_native_bucket_usage(self, server):
        """serve_native_ab.py reads compiled-bucket count vs budget off
        /stats; both keys must always be present (0 before any native
        request)."""
        with urllib.request.urlopen(server + "/stats", timeout=60) as r:
            payload = json.loads(r.read())
        assert payload["native_shape_budget"] >= 1
        assert 0 <= payload["native_shapes"] <= payload["native_shape_budget"]

    def test_engine_pool_second_size(self, server):
        # requesting a new size compiles a second engine in the pool
        from PIL import Image

        with _post(server + "/v1/specfree?size=16", png_bytes(size=48,
                                                              seed=3)) as r:
            img = Image.open(io.BytesIO(r.read()))
        assert img.size == (16, 16)
        with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
            payload = json.loads(r.read())
        assert sorted(payload["compiled_sizes"]) == [16, 32]


class TestBatchingWindow:
    """Request-batching frontend: concurrent same-size requests aggregate into
    fewer device calls (serve_http.BatchingFrontend)."""

    @pytest.fixture(scope="class")
    def batched_server(self):
        cfg = tiny_cfg()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        srv = make_server(cfg, state.g_params, state.specseg_vars,
                          batch_size=4, batch_window_ms=200.0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def test_concurrent_requests_share_device_calls(self, batched_server):
        from concurrent.futures import ThreadPoolExecutor

        from PIL import Image

        # warm the engine (compile) so the timed window isn't eaten by compile
        with _post(batched_server + "/v1/specfree", png_bytes(seed=10)) as r:
            assert r.status == 200
        with urllib.request.urlopen(batched_server + "/stats",
                                    timeout=60) as r:
            calls_before = json.loads(r.read())["device_calls"]

        def one(i):
            with _post(batched_server + "/v1/specfree",
                       png_bytes(seed=100 + i)) as r:
                return Image.open(io.BytesIO(r.read())).size

        with ThreadPoolExecutor(max_workers=8) as ex:
            sizes = list(ex.map(one, range(8)))
        assert all(s == (32, 32) for s in sizes)

        with urllib.request.urlopen(batched_server + "/stats",
                                    timeout=60) as r:
            calls_after = json.loads(r.read())["device_calls"]
        # 8 requests, batch_size 4, 200ms window -> strictly fewer device
        # calls than requests
        assert calls_after - calls_before < 8
        assert calls_after - calls_before >= 2


class TestRequestValidation:
    def test_out_of_range_size_is_400(self, server):
        for bad in ("17", "8", "4096", "-32", "narive"):
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(server + f"/v1/specfree?size={bad}", png_bytes())
            assert exc.value.code == 400


def rect_png_bytes(h, w, seed=0) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class TestNativeHTTP:
    """?size=native serves each photo at its own (h, w) via the shared
    native-resolution engine (reflect-pad to bucket + crop) instead of the
    square resize."""

    def test_native_request_keeps_shape(self, server):
        from PIL import Image

        with _post(server + "/v1/specfree?size=native",
                   rect_png_bytes(40, 56, seed=7)) as r:
            img = Image.open(io.BytesIO(r.read()))
        assert img.size == (56, 40)  # PIL size is (w, h)
        with _post(server + "/v1/specfree?size=native&output=mask",
                   rect_png_bytes(40, 56, seed=8)) as r:
            mask = Image.open(io.BytesIO(r.read()))
        assert mask.size == (56, 40)
        # the native engine shares the pool under the "native" key
        with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
            payload = json.loads(r.read())
        assert "native" in payload["compiled_sizes"]

    def test_native_oversize_is_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server + "/v1/specfree?size=native",
                  rect_png_bytes(16, 2064, seed=9))
        assert exc.value.code == 400

    def test_native_default_via_config(self):
        """--native_resolution true makes size-less HTTP requests native."""
        from PIL import Image

        cfg = tiny_cfg()
        cfg.eval = dataclasses.replace(cfg.eval, native_resolution=True)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        srv = make_server(cfg, state.g_params, state.specseg_vars)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            with _post(url + "/v1/specfree", rect_png_bytes(24, 48,
                                                            seed=11)) as r:
                img = Image.open(io.BytesIO(r.read()))
            assert img.size == (48, 24)
            # an explicit square size still works alongside the native default
            with _post(url + "/v1/specfree?size=32", png_bytes(seed=12)) as r:
                img = Image.open(io.BytesIO(r.read()))
            assert img.size == (32, 32)
        finally:
            srv.shutdown()

    def test_native_shape_compile_budget(self):
        """max_native_shapes bounds how many distinct bucketed shapes
        size=native may compile (each is an XLA compile a hostile client
        could otherwise farm)."""
        cfg = tiny_cfg()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        srv = make_server(cfg, state.g_params, state.specseg_vars,
                          max_native_shapes=1)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            with _post(url + "/v1/specfree?size=native",
                       rect_png_bytes(40, 56, seed=13)) as r:
                assert r.status == 200
            # same bucket (64, 64) -> still allowed
            with _post(url + "/v1/specfree?size=native",
                       rect_png_bytes(33, 60, seed=14)) as r:
                assert r.status == 200
            # new bucket (64, 128) -> budget exhausted
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(url + "/v1/specfree?size=native",
                      rect_png_bytes(40, 120, seed=15))
            assert exc.value.code == 400
        finally:
            srv.shutdown()

    def test_native_warm_sizes_cli_parsing(self):
        cfg = Config.from_args(["--mode", "serve",
                                "--serve_warm_sizes", "native, 128"])
        assert cfg.serve.warm_sizes == ("native", 128)

    def test_native_batching_window_aggregates(self):
        """Concurrent native requests of one exact (h, w) share device calls
        (queue keyed by ('native', h, w))."""
        from concurrent.futures import ThreadPoolExecutor

        from PIL import Image

        cfg = tiny_cfg()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        srv = make_server(cfg, state.g_params, state.specseg_vars,
                          batch_size=4, batch_window_ms=200.0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            # warm: pay the (40, 56)-bucket compile outside the timed window
            with _post(url + "/v1/specfree?size=native",
                       rect_png_bytes(40, 56, seed=20)) as r:
                assert r.status == 200
            with urllib.request.urlopen(url + "/stats", timeout=60) as r:
                before = json.loads(r.read())["device_calls"]

            def one(i):
                with _post(url + "/v1/specfree?size=native",
                           rect_png_bytes(40, 56, seed=30 + i)) as r:
                    return Image.open(io.BytesIO(r.read())).size

            with ThreadPoolExecutor(max_workers=8) as ex:
                sizes = list(ex.map(one, range(8)))
            assert all(s == (56, 40) for s in sizes)
            with urllib.request.urlopen(url + "/stats", timeout=60) as r:
                after = json.loads(r.read())["device_calls"]
            assert after - before < 8
        finally:
            srv.shutdown()


class TestWarmStart:
    def test_warm_sizes_precompile(self):
        """warm_sizes engines exist (and are compiled) before any request."""
        cfg = tiny_cfg()
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        srv = make_server(cfg, state.g_params, state.specseg_vars,
                          warm_sizes=(32,))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
                payload = json.loads(r.read())
            assert payload["compiled_sizes"] == [32]
            # the warmed engine serves a real request
            with _post(url + "/v1/specfree?size=32", png_bytes()) as r:
                assert r.status == 200
        finally:
            srv.shutdown()

    def test_warm_sizes_cli_parsing(self):
        cfg = Config.from_args(["--mode", "serve",
                                "--serve_warm_sizes", "128, 256"])
        assert cfg.serve.warm_sizes == (128, 256)
        cfg = Config.from_args(["--mode", "serve"])
        assert cfg.serve.warm_sizes == ()
