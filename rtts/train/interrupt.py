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
polls its own flag, and all of them leave the (collective-free) Python
loop at the same step boundary, so no collective is left half-joined.
Only process 0 performs the checkpoint IO, same as every other save.

Operator caveat: a MANUAL SIGINT/SIGTERM delivered to only ONE host of a
multi-host job makes that process break out of the SPMD loop while its
peers keep issuing collectives — the job then hangs until hard-killed.
Always signal every host (``scripts/run_multihost.sh`` kill does), or
use ``request_stop()`` behind your own cross-host agreement.
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
