"""Edge-partitioned graph aggregation over the mesh 'model' axis.

The graph-world analog of tensor parallelism (SURVEY.md §2.5): a batched
graph's edges are sharded across devices on the 'model' axis; each device
computes segment statistics and partial aggregates over its edge shard and
XLA collectives combine them over ICI:

  seg-max   -> jax.lax.pmax  ('model')
  softmax denominator, weighted aggregate -> jax.lax.psum ('model')

Node features are replicated along 'model' (they are tiny: F <= 36 rows)
and sharded along 'data' with the batch. The math is exactly
ops/segment.segment_softmax + segment_sum — distributed equality is tested
against the single-device path on a virtual mesh (SURVEY.md §4 test
pyramid, 'distributed' tier).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raindrop_tpu.ops.segment import segment_sum as _ssum


def _local_agg(x, gamma, src, dst, n_nodes, gather_target):
    """Per-shard segment softmax + aggregate with cross-shard collectives.

    Runs inside shard_map: src/dst/gamma hold this device's edge shard.
    """
    idx = dst if gather_target else src

    # 1) global per-destination max (stability)
    loc_max = jax.ops.segment_max(gamma, dst, num_segments=n_nodes)
    loc_max = jnp.where(jnp.isfinite(loc_max), loc_max, -jnp.inf)
    glob_max = jax.lax.pmax(loc_max, "model")
    glob_max = jnp.where(jnp.isfinite(glob_max), glob_max, 0.0)

    # 2) global denominator
    ex = jnp.exp(gamma - glob_max[dst])
    denom = jax.lax.psum(_ssum(ex, dst, n_nodes), "model")
    denom = jnp.where(denom == 0.0, 1.0, denom)

    # 3) partial weighted aggregate, summed across edge shards
    w = ex / denom[dst]
    out = _ssum(x[idx] * w[:, None], dst, n_nodes)
    return jax.lax.psum(out, "model"), w


def spmm_segment_softmax_sharded(
    mesh: Mesh,
    x: jnp.ndarray,          # [B, N, D]
    gamma: jnp.ndarray,      # [B, E]
    edge_src: jnp.ndarray,   # [E] int32
    edge_dst: jnp.ndarray,   # [E] int32
    *,
    gather_target: bool = False,
):
    """Distributed equivalent of ops/sparse_pallas.spmm_segment_softmax:
    batch sharded over 'data', edges sharded over 'model'.

    E must divide the 'model' axis size and B the 'data' axis size.
    Returns (out [B, N, D], weights [B, E]).
    """
    n_nodes = x.shape[1]

    def shard_fn(xs, gs, srcs, dsts):
        def per_sample(xb, gb):
            return _local_agg(xb, gb, srcs, dsts, n_nodes, gather_target)
        return jax.vmap(per_sample)(xs, gs)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P("data", "model"), P("model"), P("model")),
        out_specs=(P("data"), P("data", "model")),
    )
    return fn(x, gamma, edge_src.astype(jnp.int32),
              edge_dst.astype(jnp.int32))


def shard_edges(mesh: Mesh, edge_src, edge_dst, gamma):
    """device_put edge arrays with 'model'-axis sharding (dim 0 / dim 1)."""
    es = jax.device_put(edge_src, NamedSharding(mesh, P("model")))
    ed = jax.device_put(edge_dst, NamedSharding(mesh, P("model")))
    g = jax.device_put(gamma, NamedSharding(mesh, P("data", "model")))
    return es, ed, g
