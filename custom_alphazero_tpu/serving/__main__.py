"""Operator entry point: serve the best model of a run over HTTP.

Parity with the reference's `uvicorn custom_alphazero.serving.api.main:app`
launch (README.md:4-6, serving/api/main.py:47-51):

    python -m custom_alphazero_tpu.serving --run.run_id=<id> \
        [--serving.port=5555] [--serving.inference_batch_size=8]

Loads the newest promoted lineage checkpoint (evaluation/iteration_N,
reference best_saved_model utils.py:64-78) — or the training checkpoint, or
random init with a warning (utils.py:51-61) — and serves run-id / queue /
best-model / inference. `best-model/update` re-reads the newest lineage from
disk, the pull the reference's PUT endpoint triggered
(serving/api/best_model.py:8-10).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from custom_alphazero_tpu import paths
from custom_alphazero_tpu.config import Config, apply_overrides, parse_cli_overrides
from custom_alphazero_tpu.io.checkpoint import (
    checkpoint_exists,
    latest_evaluation_iteration,
    load_checkpoint,
)
from custom_alphazero_tpu.models.policy_value import PolicyValueNet
from custom_alphazero_tpu.runtime.loop import make_env
from custom_alphazero_tpu.runtime.train import init_train_state, make_evaluate_fn
from custom_alphazero_tpu.serving.server import InferenceService


def build_service(cfg: Config, host: str = "0.0.0.0", port: int = 5555,
                  batch_size: int = 1, timeout: float = 0.05
                  ) -> InferenceService:
    env = make_env(cfg)
    net = PolicyValueNet(env.num_actions, cfg.model)
    evaluate = make_evaluate_fn(net)
    template = init_train_state(
        net, cfg.model, jax.random.PRNGKey(cfg.run.seed), env.obs_shape
    )
    results_dir, game = cfg.run.results_dir, cfg.game
    run_id = cfg.run.run_id or paths.new_run_id()

    def load_best():
        """Newest lineage > training checkpoint > random init (warned)."""
        state = template
        lineage = latest_evaluation_iteration(
            paths.evaluation_path(results_dir, game, run_id)
        )
        if lineage is not None:
            state, _ = load_checkpoint(lineage[1], template)
            print(f"Serving best model from iteration {lineage[0]}")
        elif checkpoint_exists(paths.training_path(results_dir, game, run_id)):
            state, _ = load_checkpoint(
                paths.training_path(results_dir, game, run_id), template
            )
            print("Serving last training checkpoint (no promotion yet)")
        else:
            print("WARNING: no checkpoint found — serving random weights "
                  "(reference utils.py:56-60)")
        params, stats = state.params, state.batch_stats

        @jax.jit
        def forward(obs):
            return evaluate(params, stats, jnp.asarray(obs))

        def evaluate_np(states):
            probs, values = forward(states)
            return jax.device_get(probs), jax.device_get(values)

        return evaluate_np

    return InferenceService(
        load_best(),
        host=host,
        port=port,
        inference_batch_size=batch_size,
        inference_timeout=timeout,
        reload_model=load_best,
        run_id=run_id,
    )


def main(argv=None):
    args = sys.argv[1:] if argv is None else argv
    extras = {"serving.host": "0.0.0.0", "serving.port": "5555",
              "serving.inference_batch_size": "1",
              "serving.inference_timeout": "0.05"}
    cfg_args = []
    for arg in args:
        key, eq, value = arg.lstrip("-").partition("=")
        if key in extras:
            if not eq:
                raise SystemExit(
                    f"Expected --{key}=value (space-separated form is not "
                    f"supported), got {arg!r}"
                )
            extras[key] = value
        else:
            cfg_args.append(arg)
    cfg = apply_overrides(Config(), parse_cli_overrides(cfg_args))
    service = build_service(
        cfg,
        host=extras["serving.host"],
        port=int(extras["serving.port"]),
        batch_size=int(extras["serving.inference_batch_size"]),
        timeout=float(extras["serving.inference_timeout"]),
    )
    print(f"Serving run {service.run_id} on "
          f"http://{service.host}:{service.port}/api")
    service.start()
    try:
        service._thread.join()
    except KeyboardInterrupt:
        service.stop()


if __name__ == "__main__":
    main()
