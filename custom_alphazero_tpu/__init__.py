"""custom_alphazero_tpu — a TPU-native AlphaZero framework.

A from-scratch JAX / XLA / pjit / Pallas re-design of the capabilities of
neuronest/custom-alphazero (reference mounted at /root/reference):

- ``envs``     pure-JAX vectorized game engines (Connect-N, chess), replacing
               the reference's mutable-object boards (connect_n/board.py,
               chess/board.py).
- ``models``   Flax policy-value residual networks, replacing the TF2 Keras
               model (model/tensorflow/model.py).
- ``search``   mctx-style array-tree PUCT MCTS, replacing the object-tree
               search (mcts/mcts.py).
- ``replay``   device-resident ring replay buffer, replacing the HTTP sample
               queue (serving/api/queue.py, train.py:16-38).
- ``runtime``  the single SPMD actor-learner loop (self-play + train + arena),
               replacing the three-process HTTP architecture (self_play.py,
               train.py, serving/).
- ``parallel`` mesh / sharding utilities (data + model axes over ICI).
- ``solver``   native C++ Connect-4 exact solver (oracle), replacing the
               vendored PascalPons binary (exact_solvers/).
- ``io``       checkpointing with integrity metadata, metrics, run layout.
- ``tools``    MCTS tree visualization, profiling harness.
"""

__version__ = "0.1.0"
