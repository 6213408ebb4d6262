"""Serving tier: endpoint surface, queue semantics, micro-batching,
best-model hot swap — the external-client capabilities of the reference's
HTTP stack (serving/api/*, serving/factory.py, serving/inference_batch.py)."""

import threading

import numpy as np
import pytest

from custom_alphazero_tpu.serving import InferenceService, MicroBatcher, ServingClient


def _toy_evaluate(scale):
    def evaluate(states):
        b = states.shape[0]
        probs = np.tile(
            np.asarray([[0.5, 0.25, 0.25]], np.float32) * scale, (b, 1)
        )
        values = np.full((b,), scale, np.float32)
        return probs, values

    return evaluate


@pytest.fixture()
def service():
    holder = {"scale": 1.0}

    def reload_model():
        holder["scale"] = 2.0
        return _toy_evaluate(2.0)

    svc = InferenceService(
        _toy_evaluate(1.0),
        port=0,
        inference_batch_size=4,
        inference_timeout=0.2,
        reload_model=reload_model,
    ).start()
    yield svc
    svc.stop()


def test_run_id_and_queue_roundtrip(service):
    client = ServingClient(service.host, service.port)
    assert client.get_run_id() == service.run_id

    states = np.zeros((3, 2, 2), np.float32)
    policies = np.eye(3, dtype=np.float32)
    values = np.asarray([1.0, -1.0, 0.0], np.float32)
    assert client.append_queue(states, policies, values) == 3
    assert client.get_queue_size() == 3

    s, p, v = client.retrieve_queue()
    np.testing.assert_array_equal(s, states)
    np.testing.assert_array_equal(p, policies)
    np.testing.assert_array_equal(v, values)
    # Drain-all semantics (reference queue.py:25-39).
    assert client.get_queue_size() == 0
    s2, _, _ = client.retrieve_queue()
    assert len(s2) == 0


def test_queue_capacity_bounded():
    svc = InferenceService(_toy_evaluate(1.0), port=0, queue_capacity=5).start()
    try:
        client = ServingClient(svc.host, svc.port)
        client.append_queue(
            np.zeros((8, 1), np.float32),
            np.arange(8, dtype=np.float32)[:, None],
            np.arange(8, dtype=np.float32),
        )
        assert client.get_queue_size() == 5
        _, _, v = client.retrieve_queue()
        # FIFO eviction kept the newest 5.
        np.testing.assert_array_equal(v, [3, 4, 5, 6, 7])
    finally:
        svc.stop()


def test_inference_single_and_batch(service):
    client = ServingClient(service.host, service.port)
    probs, value = client.infer_sample(np.zeros((2, 2), np.float32))
    np.testing.assert_allclose(probs, [0.5, 0.25, 0.25])
    assert value == 1.0
    # Explicit batched request.
    out = client._call(
        "inference", {"states": np.zeros((4, 2, 2), np.float32).tolist()}
    )
    assert np.asarray(out["probabilities"]).shape == (4, 3)
    assert out["values"] == [1.0] * 4


def test_inference_microbatching_coalesces():
    """batch_size concurrent requests are served by ONE batched forward
    (reference InferenceBatch.predict, serving/inference_batch.py:35-54)."""
    calls = []

    def evaluate(states):
        calls.append(states.shape[0])
        b = states.shape[0]
        return np.ones((b, 3), np.float32) / 3, np.zeros((b,), np.float32)

    svc = InferenceService(
        evaluate, port=0, inference_batch_size=4, inference_timeout=2.0
    ).start()
    try:
        client = ServingClient(svc.host, svc.port, timeout=10.0)
        results = []

        def one(i):
            results.append(client.infer_sample(np.full((2, 2), i, np.float32)))

        threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        assert calls == [4]  # exactly one coalesced forward
    finally:
        svc.stop()


def test_microbatcher_timeout_flushes_partial():
    batcher = MicroBatcher(_toy_evaluate(1.0), batch_size=8, timeout=0.05)
    probs, value = batcher.infer(np.zeros((2, 2), np.float32))
    np.testing.assert_allclose(probs, [0.5, 0.25, 0.25])
    assert value == 1.0


def test_best_model_update_swaps_evaluator(service):
    client = ServingClient(service.host, service.port)
    _, v1 = client.infer_sample(np.zeros((2, 2), np.float32))
    assert v1 == 1.0
    assert client.update_best_model() is True
    _, v2 = client.infer_sample(np.zeros((2, 2), np.float32))
    assert v2 == 2.0  # reloaded model (reference best_model.py:8-10)


def test_client_fallbacks_on_dead_server():
    client = ServingClient("127.0.0.1", 1, timeout=0.2)  # nothing listens
    assert client.get_run_id() is None
    probs, value = client.infer_sample(np.zeros((2, 2)), num_actions=3)
    np.testing.assert_array_equal(probs, np.zeros(3))  # factory.py:46-55
    assert value == 0.0
    assert client.retrieve_queue() is None
    assert client.update_best_model() is False


def test_serving_main_serves_checkpointed_model(tmp_path):
    """python -m custom_alphazero_tpu.serving: loads the run's newest lineage
    checkpoint and serves it; best-model/update re-reads from disk."""
    import jax
    import jax.numpy as jnp

    from custom_alphazero_tpu import paths
    from custom_alphazero_tpu.config import Config, apply_overrides
    from custom_alphazero_tpu.io.checkpoint import save_checkpoint
    from custom_alphazero_tpu.models.policy_value import PolicyValueNet
    from custom_alphazero_tpu.runtime.loop import make_env
    from custom_alphazero_tpu.runtime.train import init_train_state
    from custom_alphazero_tpu.serving.__main__ import build_service

    cfg = apply_overrides(
        Config(),
        {
            "run.results_dir": str(tmp_path),
            "run.run_id": "serve-test",
            "model.depth": "1",
            "model.filters": "8",
            "model.value_hidden": "8",
        },
    )
    env = make_env(cfg)
    net = PolicyValueNet(env.num_actions, cfg.model)
    state = init_train_state(net, cfg.model, jax.random.PRNGKey(3), env.obs_shape)
    save_checkpoint(
        paths.evaluation_iteration_path(str(tmp_path), cfg.game, "serve-test", 50),
        state,
        1e-2,
    )

    svc = build_service(cfg, host="127.0.0.1", port=0, batch_size=1).start()
    try:
        client = ServingClient(svc.host, svc.port)
        assert client.get_run_id() == "serve-test"
        obs = np.zeros(env.obs_shape, np.float32)
        probs, value = client.infer_sample(obs)
        assert probs.shape == (env.num_actions,)
        np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)
        assert -1.0 <= value <= 1.0
        # Matches a direct forward with the same checkpointed params.
        logits, v = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(obs)[None],
            train=False,
        )
        np.testing.assert_allclose(
            probs, np.asarray(jax.nn.softmax(logits))[0], rtol=1e-5
        )
        assert client.update_best_model() is True
    finally:
        svc.stop()
