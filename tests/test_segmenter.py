"""AdaptiveSegmenter: relay-safe device-program sizing from measured time.

The reference has no analogue (it dispatches one eager step at a time,
ShmGANwithSSpecSeg.py:466-875); this guards the framework's scan-chaining
against the relay's program-duration kill threshold (CLAUDE.md incident log
2026-08-17: scan(200) at 256px crashes the worker, scan(50) is fine).
"""

import pytest

from shmgan_tpu.train.segmenter import (DEFAULT_LADDER, AdaptiveSegmenter,
                                        segment_plan)


def _covers(plan, start, k):
    pos = start
    for s0, kk in plan:
        assert s0 == pos and kk > 0
        pos += kk
    assert pos == start + k


class TestSegmentPlan:
    def test_unsegmented_when_off_or_fits(self):
        assert segment_plan(7, 40, 0) == [(7, 40)]
        assert segment_plan(7, 40, 50) == [(7, 40)]
        assert segment_plan(7, 40, 40) == [(7, 40)]

    def test_splits_contiguously_with_remainder(self):
        plan = segment_plan(0, 130, 50)
        assert plan == [(0, 50), (50, 50), (100, 30)]
        _covers(plan, 0, 130)


class TestAdaptivePlan:
    def test_plan_covers_range_with_ladder_lengths(self):
        seg = AdaptiveSegmenter(init_steps=50)
        plan = seg.plan(1000, 137)
        _covers(plan, 1000, 137)
        # every piece is a ladder rung except at most one sub-ladder tail
        tails = [kk for _, kk in plan if kk not in DEFAULT_LADDER]
        assert len(tails) <= 1
        assert all(t < DEFAULT_LADDER[0] for t in tails)
        assert all(kk <= 50 for _, kk in plan)

    def test_init_snaps_down_to_ladder(self):
        assert AdaptiveSegmenter(init_steps=60).current == 50
        assert AdaptiveSegmenter(init_steps=3).current == 5
        assert AdaptiveSegmenter(init_steps=400).current == 400

    def test_tiny_chunk_passes_through(self):
        assert AdaptiveSegmenter(init_steps=50).plan(0, 3) == [(0, 3)]


class TestAdaptation:
    def test_first_sample_per_length_is_compile_warmup(self):
        seg = AdaptiveSegmenter(budget_s=25.0, init_steps=25)
        seg.observe(25, 600.0)  # first execution: compile-dominated
        # neither the estimate nor the sizing reacted
        assert seg.per_step_s is None
        assert seg.current == 25

    def test_grows_one_rung_per_clean_observation(self):
        seg = AdaptiveSegmenter(budget_s=25.0, init_steps=10)
        seg.observe(10, 0.1)  # warm-up (compile)
        # 0.01 s/step: even 400 steps fit the budget, but growth is rung-wise
        # and each new rung pays one warm-up sample first
        for expected in (25, 50, 100, 200, 400, 400):
            seg.observe(seg.current, seg.current * 0.01)  # warm-up at rung
            seg.observe(seg.current, seg.current * 0.01)  # clean -> grow
            assert seg.current == expected

    def test_shrinks_immediately_to_fit_budget(self):
        seg = AdaptiveSegmenter(budget_s=25.0, init_steps=200)
        seg.observe(200, 31.0)  # warm-up
        seg.observe(200, 30.0)  # 0.15 s/step -> only <=100 fits 25s
        assert seg.current == 100

    def test_hard_cap_pins_ceiling_forever(self):
        seg = AdaptiveSegmenter(budget_s=25.0, hard_cap_s=40.0, init_steps=100)
        # a warmed-up 100-step program ran hot (45 s) even though a clean
        # 50-step observation suggests 0.01 s/step — the ceiling must stick
        seg.observe(50, 5.0)
        seg.observe(50, 0.5)
        seg.observe(100, 50.0)  # warm-up at 100
        seg.observe(100, 45.0)  # hot DEVICE program -> ceiling below 100
        assert seg.current <= 50
        for _ in range(10):
            seg.observe(seg.current, seg.current * 0.01)
        assert seg.current <= 50  # never climbs over a length that ran hot

    def test_run_threads_results_and_observes(self):
        clock = {"t": 0.0}
        seg = AdaptiveSegmenter(budget_s=25.0, init_steps=25,
                                clock=lambda: clock["t"])
        calls = []

        def program(s0, kk):
            calls.append((s0, kk))
            clock["t"] += kk * 0.1  # 0.1 s/step
            return (s0, kk)

        last = seg.run(0, 60, program, sync=lambda r: None)
        _covers(calls, 0, 60)
        assert last == calls[-1]
        assert seg.observations == len(calls)
        assert seg.per_step_s == pytest.approx(0.1)

    def test_validation(self):
        with pytest.raises(ValueError):
            AdaptiveSegmenter(budget_s=0)
        with pytest.raises(ValueError):
            AdaptiveSegmenter(budget_s=30, hard_cap_s=20)
        with pytest.raises(ValueError):
            AdaptiveSegmenter(ladder=())


class TestTrainerWiring:
    def test_quality_train_accepts_auto(self):
        import examples.quality_train as qt
        a = qt.parse_args(["--max_segment", "auto"])
        assert a.max_segment == "auto"
        assert a.segment_budget_s == 25.0
        # legacy int forms still parse and resolve
        a = qt.parse_args(["--max_segment", "-1"])
        assert qt.resolve_segment(int(a.max_segment), 256) == 50
        assert qt.resolve_segment(int(a.max_segment), 128) == 0
