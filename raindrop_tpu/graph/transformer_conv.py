"""Graph transformer convolution (multi-head dot-product graph attention).

Functional re-design of the reference's modified PyG TransformerConv
(reference code/transformer_conv.py, near-identical copy at
code/baselines/transformer_conv.py). Semantics reproduced exactly:

  * per-edge attention alpha = (q_i · k_j)/sqrt(d) per head
    (code/transformer_conv.py:199) — **overridden entirely by edge_weights
    when given** (the reference's one modification, :200-201);
  * segment softmax over edges incoming to each target (:202);
  * messages = lin_value(x_j) * alpha (x_j = SOURCE here, unlike
    Ob_propagation's x_i quirk — :207-209);
  * optional edge features added to keys (:192-196);
  * root/skip connection with optional beta gating
    sigmoid(lin_beta([out ‖ x_r ‖ out - x_r])) (:168-175);
  * alpha captured POST-softmax (:161,:203 — note: different from
    Ob_propagation, which captures pre-softmax).

Used by Raindrop v1 (code/models_rd.py:87) and the baselines Raindrop
(code/baselines/models.py:704).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.nn.init import torch_linear_params
from raindrop_tpu.nn.linear import linear_apply
from raindrop_tpu.ops.segment import segment_softmax, segment_sum
from raindrop_tpu.utils.dropout import dropout as _dropout
from raindrop_tpu.utils.staticmeta import Meta


def transformer_conv_init(key, in_channels: int, out_channels: int, *,
                          heads: int = 1, concat: bool = True,
                          beta: bool = False, root_weight: bool = True,
                          edge_dim: Optional[int] = None):
    k = jax.random.split(key, 6)
    ho = heads * out_channels
    params = {
        "lin_key": torch_linear_params(k[0], in_channels, ho),
        "lin_query": torch_linear_params(k[1], in_channels, ho),
        "lin_value": torch_linear_params(k[2], in_channels, ho),
        "lin_skip": torch_linear_params(k[3], in_channels,
                                        ho if concat else out_channels),
        "_meta": Meta(heads=heads, out_channels=out_channels, concat=concat,
                      beta=bool(beta and root_weight),
                      root_weight=root_weight, edge_dim=edge_dim),
    }
    if edge_dim is not None:
        le = torch_linear_params(k[4], edge_dim, ho)
        params["lin_edge"] = {"w": le["w"]}  # bias=False (:108)
    if beta and root_weight:
        d = 3 * (ho if concat else out_channels)
        lb = torch_linear_params(k[5], d, 1)
        params["lin_beta"] = {"w": lb["w"]}  # bias=False (:116,:121)
    return params


def transformer_conv_apply(
    params,
    x: jnp.ndarray,               # [n_nodes, in_channels]
    edge_index: jnp.ndarray,      # [2, E] (row 0 = source, row 1 = target)
    edge_weights: Optional[jnp.ndarray] = None,   # [E] overrides attention
    edge_attr: Optional[jnp.ndarray] = None,      # [E, edge_dim]
    *,
    n_nodes: Optional[int] = None,
    dropout_rate: float = 0.0,
    rng=None,
    train: bool = False,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Returns (out [n_nodes, heads*out] (concat) or [n_nodes, out] (mean),
    (edge_index, alpha [E, heads] post-softmax))."""
    meta = params["_meta"]
    H, C = meta["heads"], meta["out_channels"]
    if n_nodes is None:
        n_nodes = x.shape[0]
    src, dst = edge_index[0], edge_index[1]
    x_i = x[dst]                                   # target (query side)
    x_j = x[src]                                   # source (key/value side)

    q = linear_apply(params["lin_query"], x_i).reshape(-1, H, C)
    k = linear_apply(params["lin_key"], x_j).reshape(-1, H, C)
    if meta["edge_dim"] is not None:
        if edge_attr is None:
            raise ValueError("edge_dim set but edge_attr missing")
        k = k + (edge_attr @ params["lin_edge"]["w"].T).reshape(-1, H, C)

    alpha = jnp.sum(q * k, axis=-1) / math.sqrt(C)         # [E, H]
    if edge_weights is not None:
        alpha = jnp.broadcast_to(edge_weights[:, None], alpha.shape)
    alpha = segment_softmax(alpha, dst, n_nodes)
    alpha_out = alpha                                       # post-softmax (:203)
    alpha = _dropout(rng, alpha, dropout_rate, train)

    msg = linear_apply(params["lin_value"], x_j).reshape(-1, H, C)
    msg = msg * alpha[:, :, None]
    out = segment_sum(msg.reshape(-1, H * C), dst, n_nodes)

    if meta["concat"]:
        out = out.reshape(n_nodes, H * C)
    else:
        out = out.reshape(n_nodes, H, C).mean(axis=1)

    if meta["root_weight"]:
        x_r = linear_apply(params["lin_skip"], x)
        if meta["beta"]:
            b = jax.nn.sigmoid(
                jnp.concatenate([out, x_r, out - x_r], axis=-1)
                @ params["lin_beta"]["w"].T)
            out = b * x_r + (1 - b) * out
        else:
            out = out + x_r
    return out, (edge_index, alpha_out)
