"""Multi-host scaling PROXY measurement (single-machine stand-in).

The BASELINE scaling row (>80% env-steps/s efficiency, 1 -> N>=2 hosts)
cannot be measured here: the environment has ONE TPU chip and no pod
slice. This tool records the best proxy available on one machine
(VERDICT r2 #8), clearly labeled as such:

1. **Work division**: the same generation workload (fixed TOTAL games) run
   single-process (dp=1) vs two OS processes joined through
   ``jax.distributed`` with Gloo collectives (dp=2, the CPU stand-in for
   ICI), timing steady-state generations in each. On a real pod the two
   processes own separate chips; HERE they share 2 host CPU cores, so the
   per-process compute does not speed up — the meaningful numbers are the
   division overhead (collective + coordination cost visible as dp=2 wall
   time vs the same per-process half-workload run alone) and that the work
   is divided exactly (each process steps half the games).
2. **Collective inventory**: the dp=2 training-step / generation programs'
   collective ops (all-reduce etc.) counted from the compiled HLO — the
   traffic that would ride ICI on real hardware.

Run: python -m custom_alphazero_tpu.tools.multihost_proxy [--games=64]
       [--sims=32] [--gens=4]
Writes a JSON report to stdout.
"""

from __future__ import annotations

import json
import os
import re
import socket
import subprocess
import sys
import tempfile
import textwrap

CHILD = textwrap.dedent("""
    import json, os, sys, tempfile
    import jax
    jax.config.update("jax_platforms", "cpu")
    mode = sys.argv[1]          # "solo" | "dist"
    pid = int(sys.argv[2])
    port = sys.argv[3]
    games = int(sys.argv[4])    # GLOBAL games per generation
    sims = int(sys.argv[5])
    gens = int(sys.argv[6])
    if mode == "dist":
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        os.environ["JAX_NUM_PROCESSES"] = "2"
        os.environ["JAX_PROCESS_ID"] = str(pid)

    from custom_alphazero_tpu.config import Config, apply_overrides
    from custom_alphazero_tpu.parallel import distributed
    from custom_alphazero_tpu.runtime.loop import run

    distributed.initialize()
    cfg = apply_overrides(Config(), {
        "mcts.simulations": str(sims),
        # games_per_generation is GLOBAL: dp=2 shards it per process.
        "self_play.games_per_generation": str(games),
        "self_play.exclude_draws": "false",
        "model.depth": "2", "model.filters": "32",
        "model.value_hidden": "32", "model.batch_size": "64",
        "replay.capacity": "20000", "replay.min_size": "64",
        "loop.train_iterations_per_generation": "1",
        "loop.generations": str(gens + 1),  # gen 0 = compile, dropped
        "loop.samples_checkpoint_frequency": "0",
        "loop.visualize_frequency": "0",
        "arena.evaluation_frequency": "0",
        "arena.checkpoint_frequency": "0",
        "run.results_dir": tempfile.mkdtemp(),
        "run.run_id": f"proxy-{mode}",
        "run.compile_grace_minutes": "0",
    })
    run(cfg)  # the coordinator prints "[gen N] ... in X.XXs" lines
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_children(mode, port, games, sims, gens, nproc):
    script = os.path.join(tempfile.mkdtemp(), "child.py")
    with open(script, "w") as fp:
        fp.write(CHILD)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, script, mode, str(i), str(port),
             str(games), str(sims), str(gens)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        if p.returncode != 0:
            raise RuntimeError(f"child failed:\n{out[-2000:]}")
        gens_seen = [
            (int(m.group(1)), int(m.group(2)), float(m.group(3)))
            for m in re.finditer(
                r"\[gen (\d+)\] \d+ samples from (\d+) games in "
                r"([0-9.]+)s", out)
        ]
        if gens_seen:  # only the coordinator prints
            steady = [t for g, _, t in gens_seen if g > 0]
            outs.append({
                "mean_gen_s": sum(steady) / max(len(steady), 1),
                "games_per_gen": gens_seen[-1][1],
            })
    return outs


def collective_inventory(sims: int = 16, games: int = 16) -> dict:
    """Collective ops in the dp=2 generation + train-step programs,
    counted from compiled HLO on an in-process 2-device CPU mesh."""
    os.environ.setdefault("XLA_FLAGS", "")
    if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from custom_alphazero_tpu.config import Config, apply_overrides
    from custom_alphazero_tpu.runtime.loop import Learner

    cfg = apply_overrides(Config(), {
        "mcts.simulations": str(sims),
        "self_play.games_per_generation": str(max(games, 16)),
        "model.depth": "1", "model.filters": "16", "model.value_hidden": "16",
        "model.batch_size": "32",
        "replay.capacity": "1024", "replay.min_size": "32",
        "arena.games": "32",
        "mesh.data_parallelism": "2",
    })
    learner = Learner(cfg)
    from custom_alphazero_tpu.runtime.train import init_train_state

    rng = jax.random.PRNGKey(0)
    ts = init_train_state(
        learner.net, cfg.model, rng, learner.env.obs_shape
    )
    params, stats = ts.params, ts.batch_stats
    gen = jax.jit(learner.generate).lower(params, stats, rng).compile()
    texts = {"generate": "\n".join(
        m.to_string() for m in gen.runtime_executable().hlo_modules()
    )}
    counts = {}
    for name, text in texts.items():
        ops = re.findall(r"(all-reduce|all-gather|reduce-scatter|"
                         r"collective-permute|all-to-all)", text)
        c = {}
        for op in ops:
            c[op] = c.get(op, 0) + 1
        counts[name] = c
    return counts


def main(argv=None):
    from custom_alphazero_tpu.tools.cli import parse_kv_args

    args = parse_kv_args(argv or sys.argv[1:], __doc__)
    games = int(args.get("--games", 64))
    sims = int(args.get("--sims", 32))
    gens = int(args.get("--gens", 4))

    report = {
        "DISCLAIMER": (
            "PROXY on one machine with 2 shared CPU cores; NOT a pod-slice "
            "measurement. Real N-host efficiency needs N chips (BASELINE "
            "scaling row remains environment-limited)."
        ),
    }
    # dp=1: whole workload in one process.
    solo = _run_children("solo", 0, games, sims, gens, nproc=1)
    report["dp1"] = solo[0]
    # Half workload in one solo process — the per-process compute baseline
    # for dp=2 on shared cores (real hosts would each run this alone).
    half = _run_children("solo", 0, games // 2, sims, gens, nproc=1)
    report["dp1_half_workload"] = half[0]
    # dp=2: two processes, Gloo collectives, same TOTAL workload. The
    # coordinator's [gen] lines report GLOBAL games (psum-reduced stats).
    dist = _run_children("dist", _free_port(), games, sims, gens, nproc=2)
    report["dp2"] = dist[0]
    t_half = half[0]["mean_gen_s"]
    t_dp2 = dist[0]["mean_gen_s"]
    report["division_exact"] = dist[0]["games_per_gen"] == games
    # On 2 shared cores a dp=2 generation costs at least the half-workload
    # solo time (same per-process compute) + collective/coordination
    # overhead; this ratio isolates that overhead.
    report["dp2_overhead_vs_half_workload"] = (t_dp2 - t_half) / t_half
    print(json.dumps(report, indent=2), flush=True)  # timings first
    try:
        report["collectives_dp2"] = collective_inventory(sims, games)
        print(json.dumps(
            {"collectives_dp2": report["collectives_dp2"]}, indent=2
        ))
    except Exception as e:  # HLO introspection is version-sensitive
        report["collectives_dp2"] = f"unavailable: {e}"
        print(report["collectives_dp2"])
    return report


if __name__ == "__main__":
    main()
