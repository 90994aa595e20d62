"""Graceful preemption handling (SURVEY.md §6.3 failure recovery).

The reference's Lightning lineage checkpoints on KeyboardInterrupt; on
cloud TPU VMs preemption/maintenance arrives as SIGTERM with a short
grace window.  ``GracefulStop`` converts the FIRST SIGTERM/SIGINT into
a flag the training loops poll at step boundaries — the trainer then
saves a resumable checkpoint, flushes the async checkpointer, and
returns cleanly, so a preempted run loses at most one step of work
instead of everything since the last periodic save.

A SECOND signal restores the original disposition and re-raises, so an
operator can still hard-kill a run that hangs during the graceful save
(ctrl-C twice behaves like a plain ctrl-C did).

Multi-host note: preemption signals every host of a slice; each process
polls its own flag.  The trainers poll through
:func:`stop_requested_global`, which on multi-process jobs reaches
cross-host agreement (a tiny flag all-gather every step boundary), so
even a MANUAL SIGINT/SIGTERM delivered to only ONE host makes EVERY
process leave the SPMD loop at the same step — no peer is left issuing
collectives against a departed rank (the r3 single-signal hang).  Only
process 0 performs the checkpoint IO, same as every other save.
"""

from __future__ import annotations

import signal
import threading


class GracefulStop:
    """Context manager turning the first SIGTERM/SIGINT into a poll flag.

    Signal handlers can only be installed from the Python main thread;
    anywhere else (worker threads, embedded executors) this degrades to
    a never-set flag instead of failing, so library callers can wrap
    training unconditionally.
    """

    SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self) -> None:
        self._event = threading.Event()
        self._prev: dict = {}

    # -- context protocol ---------------------------------------------------
    def __enter__(self) -> "GracefulStop":
        try:
            for sig in self.SIGNALS:
                self._prev[sig] = signal.signal(sig, self._handle)
        except ValueError:  # not the main thread: poll-only mode
            self._prev.clear()
        return self

    def __exit__(self, *exc) -> bool:
        for sig, prev in self._prev.items():
            # signal.signal returns None when the prior handler was installed
            # from C (embedded interpreters) — restore SIG_DFL then, same as
            # _handle's fallback
            signal.signal(sig, prev if prev is not None else signal.SIG_DFL)
        self._prev.clear()
        return False

    # -- signal path ----------------------------------------------------------
    def _handle(self, signum, frame) -> None:
        if self._event.is_set():
            # second signal: put the original handler back and re-deliver,
            # so "twice" means whatever it meant before this context
            prev = self._prev.get(signum)
            signal.signal(signum, prev if prev is not None else signal.SIG_DFL)
            signal.raise_signal(signum)
            return
        self._event.set()

    # -- poll API -------------------------------------------------------------
    @property
    def stop_requested(self) -> bool:
        return self._event.is_set()

    def request_stop(self) -> None:
        """Programmatic trigger (tests; cooperative shutdown from another
        thread) — identical effect to the first signal."""
        self._event.set()


def stop_requested_global(stop, step: int = 0, every: int = 1) -> bool:
    """Cross-host agreement on the stop flag.

    Single-process (the common case): just the local flag, no device
    work, polled every step.  Multi-process: every rank all-gathers its
    local flag and the result is the OR — all processes see True at the
    same step boundary even when the signal reached only one host, so
    nobody keeps issuing collectives against a departed peer.  Must be
    called by EVERY process at the SAME loop point with the SAME
    ``step``/``every`` (the poll itself is a collective).

    The all-gather forces a host↔device sync, which would defeat async
    dispatch overlap if issued per step (ADVICE r4), so multi-process
    agreement is only polled when ``(step + 1) % every == 0`` — the
    trainers pass their logging cadence.  Between agreement boundaries
    NO process stops (the local flag alone must never break the loop on
    multi-process jobs, or peers hang in collectives), so a preemption
    signal is acted on at the next shared boundary — at most ``every``
    steps late, still well inside cloud-TPU grace windows.
    """
    local = bool(getattr(stop, "stop_requested", False))
    import jax

    if jax.process_count() == 1:
        return local
    if (step + 1) % max(every, 1) != 0:
        return False
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([local], dtype=np.bool_))
    return bool(np.any(flags))
