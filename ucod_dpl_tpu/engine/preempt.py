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


def requested_global() -> Optional[int]:
    """Cluster-agreed preemption signal: the MAX of every process's local
    flag.

    In a multi-process run the local flags race batch boundaries — the
    platform delivers SIGTERM to each process independently, so rank A can
    see the flag at boundary k while rank B first sees it at k+1.  If each
    rank exited on its own flag, the collective checkpoint save would mix
    steps (rank A writes step-k shards, rank B step-k+1 shards of the SAME
    orbax save — silent corruption), or the early-exiting rank would leave
    the others deadlocked in the next train step's gradient psum.  All
    ranks call this at the same safe boundary (the train/dis phases run in
    collective lockstep on wrap-padded equal shard counts), so every rank
    sees the same answer and takes the same action at the same step.

    Single-process: identical to :func:`requested` (no collective).

    NOT safe in loops whose per-rank iteration counts differ (the RAGGED
    eval shards) — a rank that polls fewer times would desynchronise the
    allgather; the eval loops therefore poll only in single-process runs
    (see eval_loop.py / coral_loop.py).
    """
    import jax

    if jax.process_count() == 1:
        return requested()
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.int32(_signum or 0))
    m = int(np.max(flags))
    return m or None


def check() -> None:
    """Raise :class:`Preempted` if a preemption signal is pending (no-op in
    processes that never installed the handler)."""
    if _signum is not None:
        raise Preempted(_signum)


class GlobalPoll:
    """Collective-consistent preemption polling for RAGGED per-rank loops
    (the eval sweeps: per-rank batch counts differ).

    A naive per-batch :func:`check` is unsound in multi-process runs — a
    one-rank raise strands the other ranks in the final metric allgather —
    but *disabling* polling would let a minutes-long validation swallow the
    platform's grace period.  This polls the CLUSTER-agreed flag on a fixed
    schedule every rank executes identically: ``ceil(max_rank_count /
    every)`` allgather rounds, fired every ``every`` local batches during
    iteration and drained in :meth:`finish` by ranks with fewer batches.
    All ranks observe the flag at the same round index, so either every
    rank raises :class:`Preempted` (the trainer catches it and runs the
    collective checkpoint in lockstep) or none does.

    Single-process: plain per-batch :func:`check` (no collectives, raise at
    the first polled batch — the behavior the bitwise preemption tests pin).
    """

    def __init__(self, local_batches: int, every: int = 8):
        import jax

        self.single = jax.process_count() == 1
        self.every = max(int(every), 1)
        self.i = 0
        self.rounds_done = 0
        if self.single:
            self.rounds_total = 0
            return
        import numpy as np
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(np.int32(local_batches))
        self.rounds_total = -(-int(np.max(counts)) // self.every)  # ceil

    def _round(self) -> None:
        self.rounds_done += 1
        s = requested_global()
        if s is not None:
            raise Preempted(s)

    def step(self) -> None:
        """Call once per local batch (before or after processing it)."""
        if self.single:
            check()
            return
        self.i += 1
        if self.i % self.every == 0 and self.rounds_done < self.rounds_total:
            self._round()

    def finish(self) -> None:
        """Drain the remaining collective rounds after the local loop ends —
        ranks with shorter shards keep participating so the schedule stays
        identical on every rank.  Call BEFORE any end-of-sweep collective
        (the metric allgather)."""
        while not self.single and self.rounds_done < self.rounds_total:
            self._round()


def clear() -> None:
    global _signum
    _signum = None
