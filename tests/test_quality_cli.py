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


class TestSpecsegCurriculumFlag:
    def test_default_is_base(self):
        qt = _load_quality_train()
        a = qt.parse_args(["--phase", "specseg"])
        assert a.specseg_curriculum == "base"
        assert a.specseg_base_mix == 0.5

    def test_dr_selects_mixed_batch_fn(self):
        qt = _load_quality_train()
        a = qt.parse_args(["--phase", "specseg", "--specseg_curriculum", "dr",
                           "--specseg_base_mix", "0.25"])
        assert a.specseg_curriculum == "dr"
        assert a.specseg_base_mix == 0.25


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


class TestRelaySafeSegmenting:
    """--max_segment splits a chunk into short device programs (the relay
    kills ~50s programs; scan(200) at 256px crashes the TPU worker while
    scan(50) is fine — bisected 2026-08-17 via examples/step_probe.py)."""

    def test_plan_covers_chunk_contiguously(self):
        qt = _load_quality_train()
        plan = qt.segment_plan(1000, 200, 50)
        assert plan == [(1000, 50), (1050, 50), (1100, 50), (1150, 50)]

    def test_plan_remainder_is_single_extra_length(self):
        qt = _load_quality_train()
        plan = qt.segment_plan(0, 130, 50)
        assert plan == [(0, 50), (50, 50), (100, 30)]
        # at most two distinct lengths -> at most one extra scan compile
        assert len({k for _, k in plan}) <= 2

    def test_plan_off_and_small_chunks_are_unsegmented(self):
        qt = _load_quality_train()
        assert qt.segment_plan(7, 40, 0) == [(7, 40)]
        assert qt.segment_plan(7, 40, 50) == [(7, 40)]
        assert qt.segment_plan(7, 40, 40) == [(7, 40)]

    def test_auto_rule_matches_the_bisected_256px_limit(self):
        qt = _load_quality_train()
        assert qt.resolve_segment(-1, 256) == 50
        assert qt.resolve_segment(-1, 512) == 50
        assert qt.resolve_segment(-1, 128) == 0
        # explicit values win over auto
        assert qt.resolve_segment(25, 256) == 25
        assert qt.resolve_segment(0, 256) == 0

    def test_flag_default_is_bisected_table(self):
        qt = _load_quality_train()
        # string-typed since 'auto' (AdaptiveSegmenter) became a value;
        # the default stays the bisected static table
        assert qt.parse_args(["--phase", "gan"]).max_segment == "-1"


class TestBestCheckpointGate:
    """Multi-metric best-checkpoint selection (VERDICT r3 weak #5): PSNR must
    improve AND FID must stay within tolerance of the lowest FID seen — the
    PSNR-only rule crowned a checkpoint whose FID had jumped 2.17 -> 15.15.

    Round-5 recalibration (VERDICT r4 weak #2): the default tolerance is
    x4.0 + 2.0, sized to the MEASURED 3.7x scene-draw swing of a fixed
    healthy checkpoint (benchmarks/quality_r4_fidsweep) — the old x1.5+2.0
    vetoed healthy checkpoints by estimator luck."""

    def test_first_eval_always_wins(self):
        qt = _load_quality_train()
        assert qt.is_better_checkpoint({"psnr": -1.0}, 20.0, 40.0,
                                       float("inf"))

    def test_psnr_regression_rejected(self):
        qt = _load_quality_train()
        assert not qt.is_better_checkpoint({"psnr": 30.0}, 29.5, 1.0, 2.0)

    def test_fid_cliff_rejected_even_with_better_psnr(self):
        # the quality_r3_256 scenario: PSNR inches up, FID collapses 2.17->15
        # (15.15 > 2.17*4 + 2 = 10.68 — still outside the recalibrated gate)
        qt = _load_quality_train()
        assert not qt.is_better_checkpoint({"psnr": 33.1}, 33.2, 15.15, 2.17)

    def test_small_fid_noise_tolerated(self):
        # absolute term: 2.17 -> 3.5 is noise at this scale, not a collapse
        qt = _load_quality_train()
        assert qt.is_better_checkpoint({"psnr": 33.1}, 33.2, 3.5, 2.17)

    def test_measured_scene_draw_swing_accepted(self):
        # the r4 dr256 history: FID 8.5 at min 3.07 is INSIDE the measured
        # 3.7x scene-draw swing of a fixed checkpoint; the old x1.5+2.0 gate
        # (tolerance 6.6) vetoed it — the recalibrated gate must not
        qt = _load_quality_train()
        assert qt.is_better_checkpoint({"psnr": 33.1}, 33.7, 8.5, 3.07)
        # but the same ratio at collapse scale still fails via the rel term
        assert not qt.is_better_checkpoint({"psnr": 33.1}, 33.7, 15.0, 3.07)

    def test_relative_term_scales_with_large_fid(self):
        # early training: FID 40 -> 50 while PSNR climbs is normal progress;
        # a 4.2x jump is outside even the measured swing
        qt = _load_quality_train()
        assert qt.is_better_checkpoint({"psnr": 20.0}, 22.0, 50.0, 40.0)
        assert not qt.is_better_checkpoint({"psnr": 20.0}, 22.0, 170.0, 40.0)


class TestResumeGateSeeding:
    """ADVICE r4 medium: resume must seed best/min_fid from the prior run's
    quality_live.json, or the FID-collapse gate silently resets exactly in
    the documented long-run resume workflow."""

    def _live(self, tmp_path, history, best):
        import json
        p = tmp_path / "quality_live.json"
        p.write_text(json.dumps({"history": history, "best": best}))
        return str(p)

    def test_seeds_best_and_min_fid(self, tmp_path):
        qt = _load_quality_train()
        hist = [{"step": 2500, "gen_psnr": 33.6, "gen_fid": 3.07},
                {"step": 5000, "gen_psnr": 33.5, "gen_fid": 8.5}]
        live = self._live(tmp_path, hist, {"psnr": 33.6, "step": 2500})
        h, best, min_fid = qt.seed_gate_from_live(
            live, 5000, [], {"psnr": -1.0}, float("inf"))
        assert len(h) == 2
        assert best["psnr"] == 33.6 and best["step"] == 2500
        assert min_fid == 3.07
        # the seeded gate now actually guards the first post-resume eval:
        # a collapsed-FID checkpoint with better PSNR is rejected
        assert not qt.is_better_checkpoint(best, 34.0, 20.0, min_fid)
        # and a healthy one is accepted
        assert qt.is_better_checkpoint(best, 34.0, 4.0, min_fid)

    def test_drops_history_beyond_restored_step(self, tmp_path):
        # restoring ckpt 2500 after evals ran to 7500: the 5000/7500 rows
        # belong to a timeline the restored checkpoint never saw
        qt = _load_quality_train()
        hist = [{"step": 2500, "gen_fid": 3.0},
                {"step": 5000, "gen_fid": 1.0},
                {"step": 7500, "gen_psnr": 40.0, "gen_fid": 1.0}]
        live = self._live(tmp_path, hist, {"psnr": 40.0, "step": 7500})
        h, best, min_fid = qt.seed_gate_from_live(
            live, 2500, [], {"psnr": -1.0}, float("inf"))
        assert [e["step"] for e in h] == [2500]
        assert min_fid == 3.0
        assert best == {"psnr": -1.0}   # the 7500 best is not on this timeline

    def test_missing_file_is_noop(self, tmp_path):
        qt = _load_quality_train()
        h, best, min_fid = qt.seed_gate_from_live(
            str(tmp_path / "nope.json"), 100, [], {"psnr": -1.0}, float("inf"))
        assert h == [] and best == {"psnr": -1.0} and min_fid == float("inf")


class TestEvalProtocolFlags:
    """Round-5 eval-FID protocol (VERDICT r4 weak #2) + plateau stopping
    (weak #4) flag wiring."""

    def test_fid_draw_and_tolerance_defaults(self):
        qt = _load_quality_train()
        a = qt.parse_args(["--phase", "gan"])
        assert a.fid_draws == 3
        assert a.fid_tol_rel == 4.0 and a.fid_tol_abs == 2.0
        assert a.plateau_evals == 0

    def test_plateau_flag_parses(self):
        qt = _load_quality_train()
        a = qt.parse_args(["--phase", "gan", "--plateau_evals", "3"])
        assert a.plateau_evals == 3
