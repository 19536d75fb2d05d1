"""Deferred preemption signalling shared by the train and eval loops.

SIGTERM/SIGINT handlers must not touch training state directly: the signal
can land while a jitted step holds DONATED buffers, and a save from signal
context then crashes on deleted arrays (caught by ``tests/test_preemption.py``).
The handler therefore only records the signal; loops poll :func:`requested`
(or call :func:`check`) at safe boundaries — after a train step, between
eval batches, between epoch phases — and perform the save themselves.

The flag is module-level so that ALL loops of a process observe one
preemption request: the stage-1 trainer installs the handler, and the
LookTwice/CORAL evaluation loops it calls poll the same flag per batch,
raising :class:`Preempted` so a minutes-long validation cannot swallow the
platform's grace period (SURVEY §5.3 — the reference has no preemption
story at all).  Processes that never call :func:`install` (the eval CLIs)
keep default signal behavior and the polls are no-ops.
"""

from __future__ import annotations

import signal
from typing import Optional

_signum: Optional[int] = None


class Preempted(Exception):
    """Raised by cooperative poll points after a preemption signal."""

    def __init__(self, signum: int):
        super().__init__(f"preemption signal {signum}")
        self.signum = signum


def install() -> None:
    """Install the deferred SIGTERM/SIGINT handler and clear any stale flag."""
    global _signum
    _signum = None

    def handler(signum, frame):
        global _signum
        _signum = signum

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, handler)
        except ValueError:  # non-main thread (e.g. under a test runner)
            pass


def requested() -> Optional[int]:
    """The pending preemption signal number, or None."""
    return _signum


def check() -> None:
    """Raise :class:`Preempted` if a preemption signal is pending (no-op in
    processes that never installed the handler)."""
    if _signum is not None:
        raise Preempted(_signum)


def clear() -> None:
    global _signum
    _signum = None
