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


def tensor_parallel_specs(params, n_model: int = 1):
    """PartitionSpec tree for the params: Megatron-style tensor parallelism
    over the 'model' axis for the big matmuls, replicated elsewhere.

    The reference has no model parallelism at all (SURVEY.md §2.5); this is
    the TPU-native slot for it. Sharded leaves (when divisible by n_model):

      * transformer FFN: lin1.w [ffn, d] and lin1.b [ffn] split on the ffn
        (output) dim; lin2.w [d, ffn] split on the ffn (input) dim — the
        column-then-row parallel pair, XLA inserts ONE all-reduce per layer
        after lin2 (the Megatron pattern, expressed declaratively via GSPMD
        sharding constraints instead of explicit collectives);
      * attention in_proj_w [3d, d] / in_proj_b and out_proj.w [d, d] split
        on the head dim the same way (3d and d are head-major multiples);
      * graph propagation lin_value.w/.b (the [T*d_ob, T*d_ob] per-node
        transform — the hot matmul of §3.3) column-parallel; the following
        elementwise gamma-scaling stays sharded on the feature dim.

    Anything with an indivisible dim stays replicated. Use with
    jax.tree.map over the matching params tree.
    """
    import jax.tree_util as jtu

    def spec_for(path, leaf) -> P:
        if n_model <= 1 or not hasattr(leaf, "shape"):
            return P()
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        in_attn_block = "transformer_encoder" in names

        def div(dim):
            return leaf.ndim > dim and leaf.shape[dim] % n_model == 0

        col = ((in_attn_block and parent == "lin1")
               or (in_attn_block and leaf_name in ("in_proj_w", "in_proj_b"))
               or parent == "lin_value")
        row = (in_attn_block and parent in ("lin2", "out_proj")
               and leaf_name == "w")
        if col and leaf.ndim >= 1 and div(0):
            # column-parallel: split the output dim (dim 0 of torch-layout
            # [out, in] weights and of biases)
            return P(*(("model",) + (None,) * (leaf.ndim - 1)))
        if row and leaf.ndim == 2 and div(1):
            # row-parallel: split the input dim (dim 1); bias replicated
            return P(None, "model")
        return P()

    return jtu.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params):
    """device_put params with tensor_parallel_specs over mesh's 'model' axis
    (falls back to full replication when the axis has size 1)."""
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    specs = tensor_parallel_specs(params, n_model)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           *, auto: bool = False) -> bool:
    """Multi-host runtime bring-up (jax.distributed).

    auto=True calls jax.distributed.initialize() with NO arguments — the
    TPU-pod path, where coordinator/count/id are auto-detected from the
    pod environment (this is how `run.py --distributed true` brings up a
    fleet). Explicit args serve CPU/GPU clusters and tests. With neither,
    this is a no-op (single-host). Returns True iff initialize was called.
    Idempotence: calling twice raises in jax — guard at the call site if
    re-entry is possible.
    """
    if auto:
        jax.distributed.initialize()
        return True
    if (num_processes is not None and num_processes > 1) or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    return False
