"""Device-mesh and sharding helpers.

The reference is single-process/single-GPU with ad-hoc .cuda() placement
(reference code/Raindrop.py:253,310-315; SURVEY.md §2.5). Here parallelism is
expressed declaratively: a named `jax.sharding.Mesh` with axes

  data   — data parallelism over samples (each patient's graph is
           independent, so DP is the natural outer axis);
  model  — reserved model axis: edge/sensor partitioning of batched graphs
           and head-partitioning of the temporal transformer ride here.

Inputs carry NamedSharding(P('data'), ...) on the batch dimension; params
are replicated. Under jit, XLA inserts the psum for gradient averaging and
lowers it to ICI all-reduce — no NCCL-style explicit collectives needed at
this scale. Multi-host extends the same mesh over processes via
jax.distributed.initialize (initialize_distributed below).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch_spec() -> P:
    """PartitionSpec for batch-major arrays: shard dim 0 over 'data'."""
    return P("data")


def replicated() -> P:
    return P()


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of batch-major arrays with dim-0 'data' sharding."""
    return jax.device_put(tree, NamedSharding(mesh, shard_batch_spec()))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (jax.distributed). No-op when single-host.

    On TPU pods the defaults are auto-detected from the environment; args
    exist for CPU/GPU clusters and tests.
    """
    if num_processes is not None and num_processes > 1 or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
