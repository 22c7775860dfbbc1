"""Relay-safe adaptive device-program sizing.

Why this exists: the TPU relay on this rig kills device programs that run
too long — at 256px a ``lax.scan``(200) train chunk (~50s wall) reliably
crashes the TPU worker, while scan(50) (~12s) is fine (bisected 2026-08-17
via examples/step_probe.py). Until now the operator had to size
``--chunk``/``--max_segment`` by hand against a constant that is only
correct for one (resolution, batch, model-width) point. This module learns
the per-step wall time from value-fetch-synced measurements and sizes every
subsequent program to fit a wall-clock budget, so any configuration is safe
without manual bisection.

The reference trainer has no analogue — it dispatches one eager step at a
time (ShmGANwithSSpecSeg.py:466-875), paying a host round-trip per step. We
chain steps into one compiled program for throughput (train/step.py
``make_scan_train_steps``), which is exactly what creates the
program-duration hazard this module manages.

Design constraints:

* **Compile economy.** Every distinct scan length is a separate XLA
  compile (minutes over the relay for the full-width step). Segment lengths
  are therefore quantized to a fixed ladder, bounding the number of
  executables at ``len(ladder)`` (+ at most one sub-ladder tail per odd
  chunk remainder).
* **Compile spikes must not poison the estimate.** The first execution at
  a new length pays the XLA compile (minutes over the relay) inside its
  wall clock, and the relay hazard is DEVICE program duration, not compile
  — so the first sample at each length is discarded outright. On top of
  that the per-step estimate is the MINIMUM observed seconds/step, which
  converges to the true steady-state rate from above.
* **Grow slowly, shrink instantly.** Moving up the ladder risks crossing
  the relay's kill threshold, so growth is one rung per observation and
  only when the predicted time fits the budget. Any observation exceeding
  ``hard_cap_s`` immediately pins a ceiling below that length — the
  estimator is never trusted to climb back over a length that has actually
  run hot.
"""

from __future__ import annotations

import time
from typing import Callable, List, Sequence, Tuple

DEFAULT_LADDER: Tuple[int, ...] = (5, 10, 25, 50, 100, 200, 400)


def segment_plan(start: int, k: int, seg: int) -> List[Tuple[int, int]]:
    """Split the chunk [start, start+k) into programs of <= seg steps.

    Returns [(step0, length), ...] covering the range contiguously. At most
    two distinct lengths occur (seg and one remainder), so fixed segmenting
    costs at most one extra scan compile. seg <= 0 disables splitting.
    """
    if seg <= 0 or k <= seg:
        return [(start, k)]
    return [(s0, min(seg, start + k - s0))
            for s0 in range(start, start + k, seg)]


class AdaptiveSegmenter:
    """Sizes scan programs to a wall-clock budget from measured step time.

    Usage::

        seg = AdaptiveSegmenter(budget_s=25.0, init_steps=50)
        for s0, kk in seg.plan(done, chunk):
            t0 = time.perf_counter()
            state, metrics = chunk_fn(state, steps[s0:s0+kk])
            float(metrics[...][-1])          # value fetch = hard sync
            seg.observe(kk, time.perf_counter() - t0)

    ``plan`` quantizes segment lengths to the ladder (greedy descending
    decomposition), so the set of compiled scan lengths stays bounded no
    matter how the estimate moves.
    """

    def __init__(self, budget_s: float = 25.0, hard_cap_s: float = 40.0,
                 init_steps: int = 50,
                 ladder: Sequence[int] = DEFAULT_LADDER,
                 clock: Callable[[], float] = time.perf_counter):
        if budget_s <= 0 or hard_cap_s < budget_s:
            raise ValueError("need 0 < budget_s <= hard_cap_s")
        self.budget_s = float(budget_s)
        self.hard_cap_s = float(hard_cap_s)
        self.ladder = tuple(sorted(set(int(x) for x in ladder)))
        if not self.ladder or self.ladder[0] < 1:
            raise ValueError("ladder must contain positive ints")
        self._clock = clock
        self._per_step: float | None = None   # min observed seconds/step
        self._ceiling: int | None = None      # hard cap from a hot program
        self._seen: set = set()               # lengths that have compiled
        self._current = self._snap_down(max(1, int(init_steps)))
        self.observations = 0

    # -- sizing ------------------------------------------------------------

    def _snap_down(self, n: int) -> int:
        """Largest ladder rung <= n (ladder[0] if n is below the ladder)."""
        best = self.ladder[0]
        for rung in self.ladder:
            if rung <= n:
                best = rung
        return best

    @property
    def current(self) -> int:
        return self._current

    @property
    def per_step_s(self) -> float | None:
        return self._per_step

    def plan(self, start: int, k: int) -> List[Tuple[int, int]]:
        """Contiguous (step0, length) programs for [start, start+k).

        Lengths are ladder rungs <= current, except at most one final tail
        shorter than the smallest rung.
        """
        out: List[Tuple[int, int]] = []
        pos, end = start, start + k
        while pos < end:
            remaining = end - pos
            if remaining < self.ladder[0]:
                out.append((pos, remaining))
                break
            out.append((pos, self._snap_down(min(self._current, remaining))))
            pos += out[-1][1]
        return out

    def observe(self, length: int, wall_s: float) -> None:
        """Record one synced program execution of `length` steps."""
        if length <= 0 or wall_s <= 0:
            return
        self.observations += 1
        if length not in self._seen:
            # The first execution at a new scan length pays the XLA compile
            # (minutes over the relay) inside its wall clock. The relay
            # hazard is DEVICE program duration, so neither the estimate nor
            # the hard cap may react to a compile-dominated sample.
            self._seen.add(length)
            return
        rate = wall_s / length
        if self._per_step is None or rate < self._per_step:
            self._per_step = rate
        if wall_s > self.hard_cap_s:
            # This length has actually run hot: never schedule it (or
            # anything longer) again, regardless of what the estimate says.
            below = [r for r in self.ladder if r < length]
            pinned = below[-1] if below else self.ladder[0]
            self._ceiling = (pinned if self._ceiling is None
                             else min(self._ceiling, pinned))
        # Largest rung whose predicted wall time fits the budget.
        fit = self.ladder[0]
        for rung in self.ladder:
            if rung * self._per_step <= self.budget_s:
                fit = rung
        if self._ceiling is not None:
            fit = min(fit, self._ceiling)
        if fit > self._current:
            # grow one rung at a time; shrink is immediate
            idx = self.ladder.index(self._current)
            fit = min(fit, self.ladder[min(idx + 1, len(self.ladder) - 1)])
        self._current = fit

    # -- convenience -------------------------------------------------------

    def run(self, start: int, k: int, program, sync):
        """Dispatch [start, start+k) through `program`, timing each segment.

        ``program(step0, length)`` runs one device program and returns its
        result; ``sync(result)`` must force completion (a value fetch).
        Returns the result of the LAST segment (matching the unsegmented
        contract: the newest step's metrics feed the caller's logging).
        """
        result = None
        for s0, kk in self.plan(start, k):
            t0 = self._clock()
            result = program(s0, kk)
            sync(result)
            self.observe(kk, self._clock() - t0)
        return result

    def summary(self) -> str:
        est = (f"{self._per_step * 1e3:.1f} ms/step"
               if self._per_step is not None else "unmeasured")
        cap = f", ceiling {self._ceiling}" if self._ceiling is not None else ""
        return (f"segment={self._current} ({est}, budget {self.budget_s:.0f}s"
                f"{cap})")
