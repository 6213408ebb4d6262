"""Optional HTTP serving tier for external clients.

The training pipeline itself never leaves the device: leaf evaluation is a
batched forward inside the jitted search, the sample queue is a device
replay ring, and model promotion is an in-memory parameter swap (SURVEY.md
§2 "obsolete by design" rows). This package exists for the *external-client*
capability the reference's `serving/` tier provided on top of that pipeline:
a process that answers run-id handshakes, accepts/drains sample batches,
reloads the best model on demand, and serves micro-batched policy-value
inference over HTTP (reference: serving/api/main.py:21-51, factory.py:21-119).

Implementation is stdlib-only (http.server + urllib): the reference's
FastAPI/uvicorn/requests stack brings nothing for this workload, and the
framework keeps zero service dependencies.
"""

from custom_alphazero_tpu.serving.server import InferenceService, MicroBatcher
from custom_alphazero_tpu.serving.client import ServingClient

__all__ = ["InferenceService", "MicroBatcher", "ServingClient"]
