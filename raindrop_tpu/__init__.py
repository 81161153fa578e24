"""raindrop_tpu — a TPU-native framework for graph-guided irregular time-series learning.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mims-harvard/Raindrop (ICLR'22, "Graph-Guided Network For Irregularly Sampled
Multivariate Time Series"): per-sample sensor graphs, observation-level message
passing with segment softmax and learned edge-weight handoff/pruning, temporal
self-attention with time-aware positional encoding, and the full experiment
machinery (Settings 1-4, balanced sampling, 5-split protocol, sklearn-parity
metrics).

Design principles (TPU-first, not a port):
  * All compute is jit-able, static-shaped, and batched — the reference's
    per-sample Python loop (reference: code/models_rd.py:322) becomes one
    vmapped/dense batched op on the MXU.
  * Complete sensor graphs lower to dense masked softmax + matmul; general
    sparse graphs use sorted-COO segment kernels (XLA and Pallas backends).
  * Multi-chip scaling via jax.sharding.Mesh + NamedSharding (DP over samples,
    model axes reserved), not NCCL-style point-to-point.
"""

__version__ = "0.1.0"

from raindrop_tpu.config import (  # noqa: F401
    RaindropConfig,
    TrainConfig,
    DATASETS,
    dataset_config,
)
