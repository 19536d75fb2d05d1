"""Profiling hooks (SURVEY §5.1: the reference has none; we wire
``jax.profiler`` traces into the train/eval loops behind a flag)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def maybe_profile(enabled: bool, log_dir: str):
    """Capture a jax profiler trace (TensorBoard-compatible) when enabled."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region for step-level attribution."""
    import jax

    return jax.profiler.TraceAnnotation(name)
