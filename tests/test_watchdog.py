"""Stall watchdog (runtime/watchdog.py): heartbeat logic with an injected
clock, thread trigger behavior, and loop integration plumbing."""

import threading
import time

from custom_alphazero_tpu.runtime.watchdog import (
    Heartbeat,
    STALL_EXIT_CODE,
    start_watchdog,
)


class FakeClock:
    def __init__(self):
        self.t = 100.0

    def __call__(self):
        return self.t


def test_heartbeat_stall_detection():
    clock = FakeClock()
    hb = Heartbeat(timeout_s=30.0, clock=clock)
    assert not hb.stalled()
    clock.t += 29.0
    assert not hb.stalled()
    clock.t += 2.0
    assert hb.stalled()
    hb.beat()
    assert not hb.stalled() and hb.age() == 0.0


def test_watchdog_thread_fires_on_stall_only():
    clock = FakeClock()
    hb = Heartbeat(timeout_s=0.2, clock=clock)
    fired = threading.Event()
    start_watchdog(hb, poll_s=0.02, on_stall=fired.set)
    # Keep beating while the (fake) clock advances: no fire. Each step
    # moves the clock most of the way to the timeout, so skipping a beat
    # here WOULD trip the watchdog.
    for _ in range(5):
        clock.t += 0.15
        hb.beat()
        time.sleep(0.05)
    assert not fired.is_set()
    # Stop beating and advance the fake clock past the timeout.
    clock.t += 1.0
    assert fired.wait(timeout=2.0)


def test_watchdog_disarm_prevents_late_fire():
    """run() disarms on return; a disarmed watchdog must never fire even
    when beats stop — the leaked-daemon-kills-healthy-process case."""
    clock = FakeClock()
    hb = Heartbeat(timeout_s=0.1, clock=clock)
    fired = threading.Event()
    wd = start_watchdog(hb, poll_s=0.02, on_stall=fired.set)
    wd.disarm()
    clock.t += 100.0  # far past the timeout, no beats
    assert not fired.wait(timeout=0.3)


def test_exit_code_is_nonzero_and_distinct():
    assert STALL_EXIT_CODE == 42


def test_loop_arms_watchdog(monkeypatch):
    """run() arms the watchdog when run.watchdog_minutes > 0 and the
    heartbeat keeps beating through generations (no stall exit)."""
    import jax

    from custom_alphazero_tpu.config import Config, apply_overrides
    from custom_alphazero_tpu.runtime import loop as L

    beats = []

    class SpyHeartbeat(Heartbeat):
        def beat(self):
            beats.append(time.monotonic())
            super().beat()

    import custom_alphazero_tpu.runtime.watchdog as wd

    monkeypatch.setattr(wd, "Heartbeat", SpyHeartbeat)
    cfg = apply_overrides(Config(), {
        "connect_n.width": "4", "connect_n.height": "4", "connect_n.n": "3",
        "mcts.simulations": "4",
        "self_play.games_per_generation": "4",
        "model.depth": "1", "model.filters": "4", "model.value_hidden": "8",
        "model.batch_size": "8",
        "replay.capacity": "512", "replay.min_size": "8",
        "loop.train_iterations_per_generation": "2",
        "loop.generations": "2", "loop.samples_checkpoint_frequency": "0",
        "arena.evaluation_frequency": "0", "arena.checkpoint_frequency": "0",
        "run.watchdog_minutes": "10",
    })
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        cfg = apply_overrides(cfg, {"run.results_dir": tmp,
                                    "run.run_id": "wd-test"})
        summary = L.run(cfg)
    assert summary["iterations"] >= 2
    assert len(beats) >= 2  # generation + train-iteration beats


def test_supervisor_restarts_on_stall_code_only(tmp_path):
    """The supervisor relaunches the loop only on STALL_EXIT_CODE, with
    backoff, resuming training; other exits propagate unchanged."""
    import sys

    from custom_alphazero_tpu.runtime.supervisor import supervise
    from custom_alphazero_tpu.runtime.watchdog import STALL_EXIT_CODE

    # A child that exits 42 twice (simulated stalls), then 0.
    counter = tmp_path / "count"
    child = tmp_path / "child.py"
    child.write_text(
        "import pathlib, sys\n"
        f"p = pathlib.Path({str(counter)!r})\n"
        "n = int(p.read_text()) if p.exists() else 0\n"
        "p.write_text(str(n + 1))\n"
        f"sys.exit({STALL_EXIT_CODE} if n < 2 else 0)\n"
    )
    delays = []
    rc = supervise([], max_restarts=5, backoff_s=1.0,
                   cmd=[sys.executable, str(child)], sleep=delays.append)
    assert rc == 0
    assert counter.read_text() == "3"       # 2 stalls + 1 clean run
    assert delays == [1.0, 2.0]             # linear backoff

    # Non-stall failures propagate without restarts.
    child.write_text("import sys; sys.exit(7)\n")
    rc = supervise([], max_restarts=5, backoff_s=1.0,
                   cmd=[sys.executable, str(child)], sleep=delays.append)
    assert rc == 7

    # Budget exhaustion returns the stall code.
    child.write_text(f"import sys; sys.exit({STALL_EXIT_CODE})\n")
    rc = supervise([], max_restarts=2, backoff_s=0.0,
                   cmd=[sys.executable, str(child)], sleep=lambda _: None)
    assert rc == STALL_EXIT_CODE


def test_supervisor_liveness_kills_prestart_wedge(tmp_path, monkeypatch):
    """A child wedged BEFORE its first line of loop code (device-claim
    hook at interpreter start) never touches the heartbeat file; the
    supervisor's liveness monitor must SIGKILL it and restart."""
    import sys

    from custom_alphazero_tpu.runtime.supervisor import supervise

    # Hermetic children: the platform's sitecustomize device-claim hook
    # must not run inside the test's subprocesses.
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)

    counter = tmp_path / "count"
    child = tmp_path / "child.py"
    # First launch: wedge forever without ever beating. Second: exit 0.
    child.write_text(
        "import pathlib, time, sys\n"
        f"p = pathlib.Path({str(counter)!r})\n"
        "n = int(p.read_text()) if p.exists() else 0\n"
        "p.write_text(str(n + 1))\n"
        "if n == 0:\n"
        "    time.sleep(600)\n"
        "sys.exit(0)\n"
    )
    rc = supervise(
        [], max_restarts=3, backoff_s=0.0,
        cmd=[sys.executable, str(child)],
        sleep=lambda _: None,
        liveness_timeout_minutes=2 / 60.0,  # 2 s
        poll_s=0.2,
    )
    assert rc == 0
    assert counter.read_text() == "2"  # one killed wedge + one clean run


def test_supervisor_liveness_spares_beating_child(tmp_path, monkeypatch):
    """A slow child that touches its heartbeat file is NOT killed even
    when it runs far longer than the liveness timeout."""
    import sys

    from custom_alphazero_tpu.runtime.supervisor import supervise
    from custom_alphazero_tpu.runtime.watchdog import HEARTBEAT_ENV

    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    child = tmp_path / "child.py"
    child.write_text(
        "import os, time, sys\n"
        f"hb = os.environ[{HEARTBEAT_ENV!r}]\n"
        "for _ in range(10):\n"
        "    time.sleep(0.3)\n"
        "    os.utime(hb, None)\n"
        "sys.exit(0)\n"
    )
    rc = supervise(
        [], max_restarts=0, backoff_s=0.0,
        cmd=[sys.executable, str(child)],
        sleep=lambda _: None,
        liveness_timeout_minutes=2 / 60.0,  # 2 s; child runs ~3 s total
        poll_s=0.2,
    )
    assert rc == 0


def test_touch_liveness_file(tmp_path, monkeypatch):
    """The loop-side helper touches the supervisor's file when the env is
    set and is a no-op (no crash) otherwise."""
    import os
    import time

    from custom_alphazero_tpu.runtime.watchdog import (
        HEARTBEAT_ENV,
        touch_liveness_file,
    )

    monkeypatch.delenv(HEARTBEAT_ENV, raising=False)
    touch_liveness_file()  # no env: no-op

    hb = tmp_path / "hb"
    hb.write_text("")
    old = time.time() - 100
    os.utime(hb, (old, old))
    monkeypatch.setenv(HEARTBEAT_ENV, str(hb))
    touch_liveness_file()
    assert time.time() - hb.stat().st_mtime < 5

    monkeypatch.setenv(HEARTBEAT_ENV, str(tmp_path / "missing"))
    touch_liveness_file()  # missing file: swallowed


def test_compile_grace_toucher_touches_until_stopped():
    from custom_alphazero_tpu.runtime.watchdog import CompileGraceToucher

    touches = []
    t = CompileGraceToucher(
        grace_s=60.0, interval_s=0.01, touch=lambda: touches.append(1)
    )
    deadline = time.monotonic() + 2.0
    while not touches and time.monotonic() < deadline:
        time.sleep(0.01)
    t.stop()
    assert touches, "toucher never touched within its interval"
    n = len(touches)
    time.sleep(0.1)
    assert len(touches) <= n + 1  # stop() halts touching promptly


def test_compile_grace_toucher_respects_grace_budget():
    from custom_alphazero_tpu.runtime.watchdog import CompileGraceToucher

    touches = []
    clock_now = [0.0]
    t = CompileGraceToucher(
        grace_s=5.0, interval_s=0.01,
        touch=lambda: touches.append(1), clock=lambda: clock_now[0],
    )
    deadline = time.monotonic() + 2.0
    while not touches and time.monotonic() < deadline:
        time.sleep(0.01)
    assert touches
    # Advance the injected clock past the budget: the thread must exit
    # (a wedge during "compile" is then visible to the supervisor).
    clock_now[0] = 10.0
    time.sleep(0.1)
    n = len(touches)
    time.sleep(0.1)
    assert len(touches) == n
    t.thread.join(timeout=2.0)
    assert not t.thread.is_alive()


def test_broadcast_flag_single_host_identity():
    from custom_alphazero_tpu.parallel.distributed import broadcast_flag

    assert broadcast_flag(True) is True
    assert broadcast_flag(False) is False
