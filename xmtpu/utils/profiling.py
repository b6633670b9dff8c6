"""Tracing / profiling hooks (SURVEY.md §5 "Tracing / profiling").

Reference analogue: none beyond timestamped logging [upstream]. Here:
``jax.profiler`` traces (XProf/Perfetto-compatible) around pipeline
runs, per-stage ``jax.named_scope`` annotation, and a ``--profile``
CLI flag writing a trace directory.
"""

from __future__ import annotations

import contextlib
import time

from xmtpu.utils.logging import get_logger

# get_logger attaches the package handler — a bare getLogger left the
# "trace written to ..." confirmation on a handlerless INFO logger that
# the root lastResort (WARNING) dropped, so `--profile DIR` printed
# nothing (review find, verified live)
log = get_logger("xmtpu.profile")


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """Profile the enclosed block to ``trace_dir`` (no-op when None)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profile trace written to %s (%.2fs)", trace_dir,
                 time.perf_counter() - t0)


def stage(name: str):
    """Per-stage named scope (shows up in XProf timelines)."""
    import jax

    return jax.named_scope(f"xmtpu.{name}")
