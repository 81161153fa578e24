"""Sequence (time-axis) parallel attention — the long-context scaling slot.

The reference caps sequences per dataset (T <= 600) and needs nothing
beyond one device (SURVEY.md §5.7); this module is the designed-in
scale-out path for longer-horizon datasets: queries are sharded along the
time axis over the mesh 'model' axis, keys/values are all-gathered across
it (Ulysses-style all-to-all degenerates to all-gather for self-attention
with full heads per device), and each device computes attention for its
time shard only — O(T^2) attention memory divides by the axis size.

Collectives ride ICI via jax.lax.all_gather inside shard_map; numerics are
identical to single-device masked attention (tested on a virtual mesh).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sequence_parallel_attention(
    mesh: Mesh,
    q: jnp.ndarray,          # [B, H, T, D]
    k: jnp.ndarray,          # [B, H, T, D]
    v: jnp.ndarray,          # [B, H, T, D]
    lengths: jnp.ndarray,    # [B] valid key counts
) -> jnp.ndarray:
    """softmax(QK^T/sqrt(D) + padmask)V with q/k/v sharded on T over
    'model' and batch over 'data'. T must divide the 'model' axis size.
    """
    T = q.shape[2]
    D = q.shape[3]
    scale = 1.0 / math.sqrt(D)

    def shard_fn(qs, ks, vs, ls):
        # qs: [b_loc, H, T_loc, D]; gather full keys/values along 'model'
        kf = jax.lax.all_gather(ks, "model", axis=2, tiled=True)  # [b,H,T,D]
        vf = jax.lax.all_gather(vs, "model", axis=2, tiled=True)
        s = jnp.einsum("bhqd,bhkd->bhqk", qs * scale, kf)
        col = jnp.arange(T)[None, None, None, :]
        s = jnp.where(col < ls[:, None, None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        # fully-padded query rows -> zeros (framework convention)
        p = jnp.where(jnp.all(col >= ls[:, None, None, None], axis=-1,
                              keepdims=True), 0.0, p)
        return jnp.einsum("bhqk,bhkd->bhqd", p, vf)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", None, "model"), P("data", None, "model"),
                  P("data", None, "model"), P("data")),
        out_specs=P("data", None, "model"),
    )
    return fn(q, k, v, lengths.astype(jnp.int32))
