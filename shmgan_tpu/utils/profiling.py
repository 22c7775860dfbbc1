"""Profiling + debugging hooks (SURVEY.md §5 tracing/race-detection analogues).

The reference's observability is TensorBoard summaries plus eager/debug-mode toggles
(tf.config.run_functions_eagerly, grappler knobs — utils.py:53-64,
ShmGANwithSSpecSeg.py:79-80). TPU-native equivalents:

  trace(log_dir)        — jax.profiler trace context (view in TensorBoard/XProf or
                          Perfetto)
  annotate(name)        — named TraceAnnotation for step phases
  debug_mode(...)       — the jax debug switches as one context: nan-checking
                          (jax_debug_nans), jit disable (the eager-mode analogue),
                          and x64 for numeric triage
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Deterministic debugging context: raise on NaN production, optionally run
    op-by-op (the honest version of the reference's global eager switch,
    ShmGANwithSSpecSeg.py:79-80 — scoped instead of process-wide)."""
    ctxs = []
    if nans:
        ctxs.append(jax.debug_nans(True))
    if disable_jit:
        ctxs.append(jax.disable_jit())
    with contextlib.ExitStack() as stack:
        for c in ctxs:
            stack.enter_context(c)
        yield


def device_memory_stats() -> dict:
    """Best-effort live/peak HBM bytes for device 0."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
