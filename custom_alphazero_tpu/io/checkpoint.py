"""Integrity-checked checkpointing.

Supersets the reference's checkpoint protocol
(/root/reference/custom_alphazero/model/tensorflow/model.py:190-212):
weights + ``meta.json`` {steps, learning_rate, hash} + a write-completed
sentinel file gating any load, with the hash verified at restore. The
payload is the full train state (params, batch_stats, optimizer state,
steps) serialized with Flax msgpack — so resume restores momentum and the
LR-schedule position exactly, which the reference could not (it only stored
weights + scalar LR). The replay buffer can be checkpointed too (the
reference lost its queue on trainer restart, train.py:43-47).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import threading
from typing import Any, Optional, Tuple

import jax
from flax import serialization

MODEL_FILE = "train_state.msgpack"
META_FILE = "meta.json"          # reference ConfigPath.model_meta
SENTINEL = "MODEL_SAVED_SUCCESSFULLY"  # reference ConfigPath.model_success
REPLAY_FILE = "replay.msgpack"


def _hash(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def save_checkpoint(
    path: str,
    train_state,
    learning_rate: float,
    replay_state=None,
    extra_meta: Optional[dict] = None,
) -> dict:
    """Atomically write a checkpoint directory with integrity metadata."""
    state = jax.device_get(train_state)
    payload = serialization.to_bytes(state)
    meta = {
        "steps": int(state.steps),
        "learning_rate": float(learning_rate),
        "hash": _hash(payload),
        **(extra_meta or {}),
    }
    parent = os.path.dirname(path) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent)
    try:
        with open(os.path.join(tmp, MODEL_FILE), "wb") as fp:
            fp.write(payload)
        if replay_state is not None:
            with open(os.path.join(tmp, REPLAY_FILE), "wb") as fp:
                fp.write(serialization.to_bytes(jax.device_get(replay_state)))
        with open(os.path.join(tmp, META_FILE), "w") as fp:
            json.dump(meta, fp, sort_keys=True, indent=4)
        # Sentinel last: its presence certifies a complete write
        # (reference model.py:212, utils.py:53).
        open(os.path.join(tmp, SENTINEL), "wb").close()
        # Retire the old checkpoint by rename FIRST so a crash between the
        # two operations leaves the previous (complete, sentinel-bearing)
        # checkpoint recoverable at `old` rather than no checkpoint at all.
        old = None
        if os.path.exists(path):
            old = tempfile.mkdtemp(dir=parent)
            os.rmdir(old)
            os.replace(path, old)
        os.replace(tmp, path)
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return meta


_ASYNC_LOCK = threading.Lock()


def _locked_save(path, state, learning_rate, replay, extra_meta):
    # One save at a time per process: overlapping saves to the same path
    # would interleave the retire/replace sequence.
    with _ASYNC_LOCK:
        save_checkpoint(path, state, learning_rate, replay,
                        extra_meta=extra_meta)


def save_checkpoint_async(
    path: str, train_state, learning_rate: float, replay_state=None,
    extra_meta: Optional[dict] = None,
) -> threading.Thread:
    """Fire-and-join-later save: device->host copy happens on the caller
    thread (cheap), disk IO on a worker serialized by a process-wide lock."""
    state = jax.device_get(train_state)
    replay = jax.device_get(replay_state) if replay_state is not None else None
    thread = threading.Thread(
        target=_locked_save,
        args=(path, state, learning_rate, replay, extra_meta), daemon=True,
    )
    thread.start()
    return thread


def checkpoint_exists(path: str) -> bool:
    """A checkpoint only counts if its sentinel exists (reference
    utils.py:51-61: otherwise fall back to random init with a warning)."""
    return os.path.exists(os.path.join(path, SENTINEL))


def load_checkpoint(path: str, train_state_template, replay_template=None):
    """Restore (train_state, meta[, replay]) with sentinel + hash checks
    (reference load_with_meta asserts, model.py:190-201)."""
    if not checkpoint_exists(path):
        raise FileNotFoundError(f"No completed checkpoint at {path} (missing sentinel)")
    with open(os.path.join(path, MODEL_FILE), "rb") as fp:
        payload = fp.read()
    with open(os.path.join(path, META_FILE)) as fp:
        meta = json.load(fp)
    if _hash(payload) != meta["hash"]:
        raise ValueError(f"Checkpoint hash mismatch at {path}")
    state = serialization.from_bytes(train_state_template, payload)
    if replay_template is None:
        return state, meta
    replay_path = os.path.join(path, REPLAY_FILE)
    replay = None
    if os.path.exists(replay_path):
        with open(replay_path, "rb") as fp:
            replay = serialization.from_bytes(replay_template, fp.read())
    return state, meta, replay


def list_evaluation_iterations(evaluation_dir: str) -> list:
    """All completed best-model lineage directories ``iteration_N``,
    ascending — the full promotion lineage (reference keeps the same layout
    but only ever reads the newest, utils.py:110-133)."""
    if not os.path.isdir(evaluation_dir):
        return []
    found = []
    for name in os.listdir(evaluation_dir):
        if not name.startswith("iteration_"):
            continue
        try:
            num = int(name.split("_", 1)[1])
        except ValueError:
            continue
        path = os.path.join(evaluation_dir, name)
        if checkpoint_exists(path):
            found.append((num, path))
    return sorted(found)


def latest_evaluation_iteration(evaluation_dir: str) -> Optional[Tuple[int, str]]:
    """Find the newest completed best-model lineage directory
    ``iteration_N`` (reference utils.py:110-133)."""
    lineage = list_evaluation_iterations(evaluation_dir)
    return lineage[-1] if lineage else None
