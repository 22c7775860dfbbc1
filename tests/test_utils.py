"""Tests for logging/progress/device utilities."""

import io
import json
import os
import time

import jax

from shmgan_tpu.utils.device import device_report
from shmgan_tpu.utils.logging import MetricsWriter, StepTimer, progress_bar


class TestMetricsWriter:
    def test_jsonl_rows(self, tmp_path):
        w = MetricsWriter(str(tmp_path))
        w.write(1, {"loss": 2.5, "note": "skipped-non-numeric"})
        w.write(2, {"loss": 1.5})
        w.close()
        rows = [json.loads(l) for l in open(w.path)]
        assert rows[0]["step"] == 1 and rows[0]["loss"] == 2.5
        assert "note" not in rows[0]  # non-numeric values skipped
        assert rows[1]["loss"] == 1.5

    def test_prefix(self, tmp_path):
        w = MetricsWriter(str(tmp_path))
        w.write(1, {"x": 1.0}, prefix="eval/")
        w.close()
        row = json.loads(open(w.path).readline())
        assert "eval/x" in row

    def test_jax_scalars_accepted(self, tmp_path):
        import jax.numpy as jnp
        w = MetricsWriter(str(tmp_path))
        w.write(1, {"loss": jnp.float32(3.0)})
        w.close()
        assert json.loads(open(w.path).readline())["loss"] == 3.0


class TestProgressBar:
    def test_render(self):
        buf = io.StringIO()
        progress_bar(5, 10, prefix="ep ", stream=buf)
        out = buf.getvalue()
        assert "50.00%" in out and "ep " in out

    def test_complete_newline(self):
        buf = io.StringIO()
        progress_bar(10, 10, stream=buf)
        assert buf.getvalue().endswith("\n")


class TestStepTimer:
    def test_rates(self):
        t = StepTimer()
        t.tick(images=4)
        t.tick(images=4)
        time.sleep(0.01)
        assert t.steps_per_sec > 0
        assert t.images_per_sec > t.steps_per_sec  # 4 img/step


class TestDeviceReport:
    def test_structure(self):
        rep = device_report()
        assert rep["device_count"] == len(jax.devices())
        assert rep["devices"][0]["platform"] == "cpu"


class TestTraceCapture:
    def test_trace_writes_files(self, tmp_path):
        import glob
        import jax.numpy as jnp
        from shmgan_tpu.utils.profiling import annotate, trace
        d = str(tmp_path / "trace")
        with trace(d):
            with annotate("matmul"):
                x = jnp.ones((64, 64))
                (x @ x).block_until_ready()
        files = glob.glob(d + "/**/*", recursive=True)
        assert any("xplane" in f or f.endswith(".pb") or ".trace" in f
                   for f in files), files
