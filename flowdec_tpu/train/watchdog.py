"""Hang watchdog: failure detection for wedged device calls.

The remote-TPU runtime can hang a device call indefinitely rather than
raise: observed live during the campaign25 run (CAMPAIGN.md) — at step
~11550 every thread parked in futex/epoll wait, no exception, no progress.
Two properties of that failure mode shape this design:

* a supervisor (SLURM requeue, k8s restart, the reference's auto-requeue at
  train.py:155-186) only acts on process EXIT — a silently wedged trainer
  burns the whole allocation;
* the SIGTERM checkpoint path is useless once wedged: the handler runs but
  its checkpoint write blocks on the same hung RPC (also observed). The
  cadence checkpoint written by `CheckpointManager.maybe_save` BEFORE the
  hang is the recovery point, so the correct reaction is stack-dump +
  hard-exit, not "checkpoint and stop".

So: a daemon thread watches a heartbeat the train loop touches after every
completed step. If no beat lands within `timeout` seconds it dumps ALL
thread stacks (faulthandler — works even when the main thread is stuck in
a C extension) and `os._exit(HANG_EXIT_CODE)`, letting the supervisor
requeue; rerunning the identical command auto-resumes from the newest
checkpoint. Known-long phases (first-step compile can take 15-25 min on
this runtime; validation runs many graphs) either get the longer
`first_beat_grace` or a `suspended()` block.
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time
from contextlib import contextmanager

from flowdec_tpu.utils.logging import log

# Distinct from common exit codes so supervisors can tell "hung device"
# from OOM-kills (137) or SIGTERM (143).
HANG_EXIT_CODE = 113


class HangWatchdog:
    """Heartbeat-based hang detector.

    Usage::

        wd = HangWatchdog(timeout=900, first_beat_grace=2400)
        with wd:
            for batch in loader:
                train_step(batch)
                wd.beat()

    on_hang: "abort" (default) dumps stacks and os._exit(HANG_EXIT_CODE);
    "log" only logs + dumps (for tests / best-effort monitoring); or any
    callable, invoked as on_hang(seconds_since_last_beat).
    """

    def __init__(
        self,
        timeout: float = 900.0,
        *,
        first_beat_grace: float | None = None,
        max_suspend: float | None = None,
        on_hang="abort",
        poll_interval: float | None = None,
    ):
        if timeout <= 0:
            raise ValueError("timeout must be positive (use enabled=False "
                             "at the call site to disable)")
        self.timeout = float(timeout)
        # first interval covers jit compile of the train step; this runtime's
        # remote compiles have taken 15-25 min cold (PERF.md).
        self.first_beat_grace = float(
            first_beat_grace if first_beat_grace is not None else max(timeout, 2400.0)
        )
        # Suspensions exempt known-long phases, but a device call can wedge
        # INSIDE one (observed live at r5 step 15075: the async Orbax save of
        # a cadence checkpoint hung on a dead tunnel while maybe_save sat in
        # suspended() — the watchdog never fired and the stage burned its
        # whole wall budget). Bound them: a suspension older than max_suspend
        # is itself treated as a hang.
        self.max_suspend = float(
            max_suspend if max_suspend is not None else max(4 * timeout, 3600.0)
        )
        self.on_hang = on_hang
        self.poll_interval = float(
            poll_interval if poll_interval is not None else min(5.0, self.timeout / 4)
        )
        self._lock = threading.Lock()
        self._last_beat = time.monotonic()
        self._beats = 0
        self._suspended = 0
        self._suspend_start = 0.0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.fired = False  # visible to tests / callers after "log" mode

    # -- heartbeat API ------------------------------------------------------

    def beat(self) -> None:
        """Mark progress; called by the loop after each completed step."""
        with self._lock:
            self._last_beat = time.monotonic()
            self._beats += 1

    @contextmanager
    def suspended(self):
        """Exempt a known-long phase (validation, checkpoint write) from the
        timeout — bounded by `max_suspend` (see __init__: hangs happen inside
        these phases too). Re-arms with a fresh beat on exit. Reentrant."""
        with self._lock:
            if self._suspended == 0:
                self._suspend_start = time.monotonic()
            self._suspended += 1
        try:
            yield
        finally:
            with self._lock:
                self._suspended -= 1
                self._last_beat = time.monotonic()

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "HangWatchdog":
        if self._thread is not None:
            return self
        self._stop.clear()
        with self._lock:
            self._last_beat = time.monotonic()
        self._thread = threading.Thread(
            target=self._watch, name="flowdec-hang-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self.poll_interval)
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
        return False

    # -- internals ----------------------------------------------------------

    def _watch(self) -> None:
        while not self._stop.wait(self.poll_interval):
            with self._lock:
                if self._suspended:
                    idle = time.monotonic() - self._suspend_start
                    limit = self.max_suspend
                else:
                    idle = time.monotonic() - self._last_beat
                    limit = self.timeout if self._beats else self.first_beat_grace
            if idle > limit:
                self._fire(idle)
                if self.on_hang == "abort":
                    return  # not reached (process exited) — for "log"/callable
                with self._lock:  # re-arm instead of firing every poll
                    self._last_beat = time.monotonic()
                    self._suspend_start = time.monotonic()

    def _fire(self, idle: float) -> None:
        self.fired = True
        log.error(
            f"HangWatchdog: no progress for {idle:.0f}s "
            f"(timeout {self.timeout:.0f}s) — dumping all thread stacks"
        )
        try:
            faulthandler.dump_traceback(file=sys.stderr, all_threads=True)
        except Exception:
            pass
        if callable(self.on_hang):
            self.on_hang(idle)
        elif self.on_hang == "abort":
            log.error(
                f"HangWatchdog: exiting with code {HANG_EXIT_CODE} so the "
                "supervisor can requeue; rerun resumes from the newest "
                "cadence checkpoint"
            )
            # flush what we can; os._exit skips atexit/finalizers on purpose —
            # they would block on the same wedged device call.
            for stream in (sys.stderr, sys.stdout):
                try:
                    stream.flush()
                except Exception:
                    pass
            os._exit(HANG_EXIT_CODE)
