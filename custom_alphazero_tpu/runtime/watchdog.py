"""Stall watchdog: restartable failure detection for the training loop.

The reference has no failure handling beyond client-side HTTP fallbacks
(SURVEY.md §5); its processes hang forever if a dependency wedges. On TPU
the equivalent hazard is a wedged device stream or tunnel: the host
blocks inside a device call and no Python-level timeout can fire. The
only reliable recovery is process exit + supervisor restart — which is
cheap here because training checkpoint-resumes exactly (steps, replay,
optimizer state, best-model lineage; io/checkpoint.py).

``Heartbeat`` is plain logic (injectable clock, unit-testable);
``start_watchdog`` runs it on a daemon thread and hard-exits the process
with :data:`STALL_EXIT_CODE` when the heartbeat goes stale. ``os._exit``
is deliberate: a wedged device call holds locks that would deadlock any
graceful shutdown path.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Callable, Optional

STALL_EXIT_CODE = 42


class Heartbeat:
    """Tracks liveness: ``beat()`` on progress, ``stalled()`` to check."""

    def __init__(self, timeout_s: float,
                 clock: Callable[[], float] = time.monotonic):
        self.timeout_s = timeout_s
        self._clock = clock
        self._last = clock()
        self._lock = threading.Lock()

    def beat(self) -> None:
        with self._lock:
            self._last = self._clock()

    def age(self) -> float:
        with self._lock:
            return self._clock() - self._last

    def stalled(self) -> bool:
        return self.age() > self.timeout_s


def start_watchdog(
    heartbeat: Heartbeat,
    poll_s: float = 15.0,
    on_stall: Optional[Callable[[], None]] = None,
) -> threading.Thread:
    """Start a daemon thread that exits the process when the heartbeat
    stalls. ``on_stall`` (tests) replaces the default exit action."""

    def action():
        print(
            f"[watchdog] no progress for {heartbeat.age():.0f}s "
            f"(limit {heartbeat.timeout_s:.0f}s); exiting "
            f"{STALL_EXIT_CODE} for supervisor restart",
            file=sys.stderr,
            flush=True,
        )
        os._exit(STALL_EXIT_CODE)

    def run():
        while True:
            time.sleep(poll_s)
            if heartbeat.stalled():
                (on_stall or action)()
                return

    thread = threading.Thread(target=run, name="stall-watchdog", daemon=True)
    thread.start()
    return thread
