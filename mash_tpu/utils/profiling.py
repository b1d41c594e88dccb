"""Tracing and per-stage timing.

The reference has no profiling support beyond stderr progress lines
(SURVEY §5); on TPU, knowing where device time goes is essential, so
every CLI invocation can capture a full XLA/JAX profiler trace and a
per-stage wall-clock report:

- ``MASH_TPU_TRACE=<dir>``: write a TensorBoard-loadable JAX profiler
  trace of the whole command to ``<dir>`` (view with
  ``tensorboard --logdir <dir>`` or xprof).
- ``MASH_TPU_TIMINGS=1``: print a per-stage wall-clock summary to
  stderr at command exit.

Stages are annotated in library code with the :func:`stage` context
manager, which is a no-op (one perf_counter call) unless timing or
tracing is enabled.
"""

from __future__ import annotations

import atexit
import contextlib
import os
import sys
import time
from collections import defaultdict

_TIMINGS_ENABLED = bool(os.environ.get("MASH_TPU_TIMINGS"))
_ACC: dict = defaultdict(lambda: [0.0, 0])
_REPORT_REGISTERED = False


def stage_report(out=None):
    """Print accumulated per-stage timings (stderr by default)."""
    out = out or sys.stderr
    if not _ACC:
        return
    width = max(len(k) for k in _ACC)
    out.write("-- mash-tpu stage timings --\n")
    for name, (total, calls) in sorted(
        _ACC.items(), key=lambda kv: -kv[1][0]
    ):
        out.write(
            "%-*s  %9.3f s  (%d call%s)\n"
            % (width, name, total, calls, "s" if calls != 1 else "")
        )


@contextlib.contextmanager
def stage(name: str):
    """Accumulate wall-clock for a named stage (cheap when disabled)."""
    global _REPORT_REGISTERED
    if not _TIMINGS_ENABLED:
        yield
        return
    if not _REPORT_REGISTERED:
        _REPORT_REGISTERED = True
        atexit.register(stage_report)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        cell = _ACC[name]
        cell[0] += time.perf_counter() - t0
        cell[1] += 1


@contextlib.contextmanager
def maybe_trace():
    """JAX profiler trace of the enclosed block if MASH_TPU_TRACE is set.

    Only the trace machinery itself is guarded — exceptions raised by
    the traced body must propagate unchanged (a try around the yield
    would swallow user errors and re-yield, which breaks the generator
    protocol).
    """
    trace_dir = os.environ.get("MASH_TPU_TRACE")
    if not trace_dir:
        yield
        return

    ctx = None
    try:
        import jax

        ctx = jax.profiler.trace(trace_dir)
        ctx.__enter__()
        sys.stderr.write(
            "Writing JAX profiler trace to %s\n" % trace_dir
        )
    except Exception as e:  # tracing must never break the command
        sys.stderr.write("WARNING: profiler trace failed: %s\n" % e)
        ctx = None
    try:
        yield
    finally:
        if ctx is not None:
            try:
                ctx.__exit__(None, None, None)
            except Exception as e:
                sys.stderr.write(
                    "WARNING: profiler trace failed: %s\n" % e
                )
