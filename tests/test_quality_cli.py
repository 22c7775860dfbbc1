"""CLI wiring of examples/quality_train.py — the production trainer's config
construction (no jit, no device work; the heavy paths are exercised by the
CPU smoke in .claude/skills/verify and on TPU in the quality runs).
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_quality_train():
    spec = importlib.util.spec_from_file_location(
        "quality_train", os.path.join(REPO, "examples", "quality_train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestPallasInGating:
    """--pallas_in auto = fused instance-norm on TPU, XLA fallback on CPU
    (the kernel imports pallas.tpu at trace time, so CPU must never select
    it)."""

    def test_auto_is_on_for_tpu_runs(self):
        qt = _load_quality_train()
        a = qt.parse_args(["--phase", "gan"])
        assert a.pallas_in == "auto"
        cfg = qt.build_cfg(a)
        assert cfg.model.use_pallas_instance_norm is True

    def test_auto_is_off_under_cpu_flag(self):
        qt = _load_quality_train()
        a = qt.parse_args(["--phase", "gan", "--cpu"])
        cfg = qt.build_cfg(a)
        assert cfg.model.use_pallas_instance_norm is False

    def test_explicit_override_wins(self):
        qt = _load_quality_train()
        a = qt.parse_args(["--phase", "gan", "--cpu", "--pallas_in", "on"])
        assert qt.build_cfg(a).model.use_pallas_instance_norm is True
        a = qt.parse_args(["--phase", "gan", "--pallas_in", "off"])
        assert qt.build_cfg(a).model.use_pallas_instance_norm is False

    def test_eval_cfg_never_uses_pallas(self):
        """The held-out oracle evaluates in f32 through the plain XLA path
        regardless of the trainer's kernel selection (quality_train.py
        eval_cfg)."""
        import re
        src = open(os.path.join(REPO, "examples", "quality_train.py")).read()
        m = re.search(r"eval_cfg\.model = dataclasses\.replace\((.*?)\)",
                      src, re.S)
        assert m and "use_pallas_instance_norm=False" in m.group(1)


class TestBenchSnippetConfig:
    def test_scan_snippet_formats_with_pallas_key(self):
        sys.path.insert(0, REPO)
        import bench
        code = bench._SCAN_TRAIN_SNIPPET.format(
            dtype="bfloat16", batch=24, remat="none", image_size=128, k=100,
            pallas=True)
        assert "use_pallas_instance_norm=True" in code
        code = bench._SCAN_TRAIN_SNIPPET.format(
            dtype="bfloat16", batch=2, remat="none", image_size=32, k=2,
            pallas=False)
        assert "use_pallas_instance_norm=False" in code
