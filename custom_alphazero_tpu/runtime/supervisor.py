"""Supervisor: restart the training loop when the stall watchdog fires.

The reference has no supervision at all — its three processes hang forever
when a dependency wedges (SURVEY.md §5 failure-detection notes). Here the
loop detects its own stalls (a wedged device tunnel blocks the host inside
a device call, runtime/watchdog.py) and hard-exits with STALL_EXIT_CODE;
this supervisor completes the story by relaunching it, which resumes
exactly from the latest checkpoint (steps, optimizer state, replay,
best-model lineage — io/checkpoint.py, tested in tests/test_loop.py).

Restart policy: only the watchdog's exit code triggers a relaunch (crashes
and clean exits propagate), with linear backoff and a restart budget.

Run:  python -m custom_alphazero_tpu.runtime.supervisor \
          --supervise.max_restarts=10 --supervise.backoff_s=30 \
          <runtime.loop args...>
"""

from __future__ import annotations

import subprocess
import sys
import time
from typing import List, Optional, Sequence

from custom_alphazero_tpu.runtime.watchdog import STALL_EXIT_CODE


def supervise(
    loop_args: Sequence[str],
    max_restarts: int = 10,
    backoff_s: float = 30.0,
    cmd: Optional[List[str]] = None,
    sleep=time.sleep,
) -> int:
    """Run the loop command until it exits for a non-stall reason.

    Returns the final exit code: 0 on clean completion, the child's code on
    a non-stall failure, or STALL_EXIT_CODE when the restart budget is
    exhausted. `cmd` overrides the launched command (tests)."""
    base = cmd if cmd is not None else [
        sys.executable, "-u", "-m", "custom_alphazero_tpu.runtime.loop",
    ]
    restarts = 0
    while True:
        code = subprocess.run(base + list(loop_args)).returncode
        if code != STALL_EXIT_CODE:
            return code
        restarts += 1
        if restarts > max_restarts:
            print(f"[supervisor] stall persisted through {max_restarts} "
                  "restarts; giving up", flush=True)
            return STALL_EXIT_CODE
        delay = backoff_s * restarts
        print(f"[supervisor] stall exit ({STALL_EXIT_CODE}); restart "
              f"{restarts}/{max_restarts} in {delay:.0f}s "
              "(training resumes from the latest checkpoint)", flush=True)
        sleep(delay)


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    max_restarts, backoff = 10, 30.0
    passthrough = []
    for a in args:
        if a.startswith("--supervise.max_restarts="):
            max_restarts = int(a.split("=", 1)[1])
        elif a.startswith("--supervise.backoff_s="):
            backoff = float(a.split("=", 1)[1])
        else:
            passthrough.append(a)
    return supervise(passthrough, max_restarts, backoff)


if __name__ == "__main__":
    raise SystemExit(main())
