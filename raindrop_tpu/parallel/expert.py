"""Expert parallelism: a mixture-of-experts FFN sharded over a mesh axis.

The reference has no model parallelism (SURVEY.md §2.5); this module is the
expert-parallel (EP) slot of the framework, usable as a drop-in replacement
for the transformer FFN when scaling the temporal encoder out.

TPU-native design choices:

  * top-1 (switch-style) gating with a dense one-hot dispatch: every expert
    runs every token and the one-hot selects — all static shapes, no
    sort/unique/ragged dispatch, so XLA tiles everything onto the MXU;
  * expert weights are stacked [E, ...] and sharded over the mesh axis via
    sharding constraints; GSPMD partitions the batched einsum so each device
    computes ONLY its experts' slice — the dense dispatch costs E× FLOPs
    per device only when unsharded (capacity-factor routing can be layered
    on later; at Raindrop's scale the dense form is already fast);
  * the combine is a weighted sum over the expert axis, which XLA lowers to
    one reduce-scatter/all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raindrop_tpu.nn.init import torch_linear_params


def moe_ffn_init(key, d_model: int, ffn_dim: int, n_experts: int,
                 dtype=jnp.float32):
    """Gate + stacked expert weights ([E, out, in] torch layout)."""
    kg, k1, k2 = jax.random.split(key, 3)
    e1 = [torch_linear_params(k, d_model, ffn_dim, dtype)
          for k in jax.random.split(k1, n_experts)]
    e2 = [torch_linear_params(k, ffn_dim, d_model, dtype)
          for k in jax.random.split(k2, n_experts)]
    return {
        "gate": torch_linear_params(kg, d_model, n_experts, dtype),
        "w1": jnp.stack([p["w"] for p in e1]),     # [E, ffn, d]
        "b1": jnp.stack([p["b"] for p in e1]),     # [E, ffn]
        "w2": jnp.stack([p["w"] for p in e2]),     # [E, d, ffn]
        "b2": jnp.stack([p["b"] for p in e2]),     # [E, d]
    }


def expert_parallel_specs(axis: str = "model"):
    """PartitionSpec tree for moe_ffn params: experts split over `axis`."""
    return {
        "gate": {"w": P(), "b": P()},
        "w1": P(axis), "b1": P(axis),
        "w2": P(axis), "b2": P(axis),
    }


def shard_moe_params(mesh: Mesh, params, axis: str = "model"):
    specs = expert_parallel_specs(axis)
    return jax.device_put(params, jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P)))


def moe_ffn_apply(
    params,
    x: jnp.ndarray,                # [B, T, d]
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "model",
    activation=jax.nn.relu,
):
    """Top-1 routed MoE FFN. Returns ([B, T, d], aux) where aux is the
    switch-transformer load-balancing loss (mean fraction * mean prob * E)."""
    E = params["w1"].shape[0]
    logits = x @ params["gate"]["w"].T + params["gate"]["b"]     # [B, T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.argmax(probs, axis=-1)                             # [B, T]
    onehot = jax.nn.one_hot(top, E, dtype=x.dtype)               # [B, T, E]
    gate = jnp.sum(probs * onehot, axis=-1)                      # [B, T]

    def constrain(t, spec):
        if mesh is None:
            return t
        return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))

    w1 = constrain(params["w1"], P(axis))
    w2 = constrain(params["w2"], P(axis))
    # dense dispatch: h [B, T, E, ffn] partitioned over experts on `axis`
    h = jnp.einsum("btd,efd->btef", x, w1) + params["b1"]
    h = constrain(activation(h), P(None, None, axis))
    y = jnp.einsum("btef,edf->bted", h, w2) + params["b2"]       # [B, T, E, d]
    out = jnp.einsum("bted,bte->btd", y, onehot) * gate[..., None]

    # load-balancing aux (Switch Transformer eq. 4): E * sum_e f_e * P_e
    frac = jnp.mean(onehot.reshape(-1, E), axis=0)
    mean_prob = jnp.mean(probs.reshape(-1, E), axis=0)
    aux = E * jnp.sum(frac * mean_prob)
    return out, aux
