"""Raindrop v1 — the legacy variant with TransformerConv graph attention.

Reference code/models_rd.py:46-191 (class `Raindrop`; not instantiated by
the shipped driver, which builds Raindrop_v2 — code/Raindrop.py:245-251 —
but part of the model-family surface and the baselines' Raindrop).

Pipeline (models_rd.py:119-191): linear encoder x sqrt(d_model) (:130),
dropout, per-sample TransformerConv over the global adjacency with
self-loops forced (:149-166), alpha-distance regularizer from the stacked
attention columns (:168-169), 36-d time-PE concat (:171), 2-layer
transformer encoder (:175), masked mean over time /(lengths+1) (:181-185),
static emb concat, MLP head.

Quirks preserved:
  * node rows are the T timesteps while edges index only the first F rows
    (stepdata = x[:, unit, :] is [T, F] fed as node features to a conv
    whose edge_index addresses nodes 0..F-1 — models_rd.py:159-161); rows
    F..T-1 therefore receive only the skip connection;
  * the per-sample Python loop (:158) is a vmap here.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.config import RaindropConfig
from raindrop_tpu.graph.structure import edges_from_adjacency
from raindrop_tpu.graph.transformer_conv import (
    transformer_conv_apply,
    transformer_conv_init,
)
from raindrop_tpu.nn.aggregate import masked_mean_pool, padding_mask
from raindrop_tpu.nn.init import tiny_uniform, torch_linear_params
from raindrop_tpu.nn.linear import linear_apply, mlp_apply, mlp_init
from raindrop_tpu.nn.transformer import (
    transformer_encoder_apply,
    transformer_encoder_init,
)
from raindrop_tpu.ops.pe import time_positional_encoding
from raindrop_tpu.utils.dropout import dropout as _dropout


def raindrop_v1_init(key, cfg: RaindropConfig):
    """d_pe = d_enc = d_inp (models_rd.py:70-71); conv out = d_inp*dim with
    dim = d_model/d_inp (:93-95); d_final = d_inp*(dim+1) + d_model (:97)."""
    F = cfg.d_inp
    dim = cfg.d_model // F
    d_final = F * (dim + 1) + cfg.d_model
    k = jax.random.split(key, 6)
    enc = torch_linear_params(k[0], F, F)
    enc["w"] = tiny_uniform(k[1], (F, F), cfg.init_range)
    emb = torch_linear_params(k[2], cfg.d_static, cfg.d_model)
    emb["w"] = tiny_uniform(jax.random.fold_in(key, 7),
                            (cfg.d_model, cfg.d_static), cfg.init_range)
    return {
        "encoder": enc,
        "emb": emb,
        "transconv": transformer_conv_init(k[3], F, F * dim, heads=1),
        "transformer_encoder": transformer_encoder_init(
            k[4], cfg.d_model + F, cfg.nhead, cfg.ffn_dim, cfg.nlayers),
        "mlp_static": mlp_init(k[5], [d_final, d_final, cfg.n_classes]),
    }


def raindrop_v1_apply(
    params, cfg: RaindropConfig,
    src: jnp.ndarray,                  # [T, B, 2F]
    static: jnp.ndarray,               # [B, d_static]
    times: jnp.ndarray,                # [T, B]
    lengths: jnp.ndarray,              # [B]
    *,
    train: bool = False, rng=None,
    global_adj: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_drop, r_conv, r_trans = jax.random.split(rng, 3)
    T, B, _ = src.shape
    F = cfg.d_inp
    dim = cfg.d_model // F

    values = src[:, :, :F]
    h = linear_apply(params["encoder"], values) * math.sqrt(cfg.d_model)
    pe = time_positional_encoding(times, F, cfg.max_len)     # d_pe = F (:70)
    h = _dropout(r_drop, h, cfg.dropout, train)
    emb = linear_apply(params["emb"], static)

    # global structure with forced self-loops (models_rd.py:149-151).
    # Edge construction is data-dependent, so global_adj must be a HOST
    # (numpy) array — edges are built outside the trace with static shapes.
    import numpy as np

    adj = np.ones((F, F), np.float32) if global_adj is None else np.asarray(global_adj)
    edge_index, edge_weights = edges_from_adjacency(adj)
    edge_index = jnp.asarray(edge_index)
    edge_weights = jnp.asarray(edge_weights)

    def per_sample(x_sample, r):
        # x_sample [T, F]: node rows = timesteps; edges address rows < F
        out, (_, alpha) = transformer_conv_apply(
            params["transconv"], x_sample, edge_index, edge_weights,
            n_nodes=T, dropout_rate=0.0, rng=r, train=train)
        return out, alpha[:, 0]

    h_b = h.transpose(1, 0, 2)                               # [B, T, F]
    conv_out, alpha_all = jax.vmap(per_sample)(
        h_b, jax.random.split(r_conv, B))                    # [B, T, F*dim]

    d2 = jnp.sum((alpha_all[:, None] - alpha_all[None]) ** 2, axis=-1)
    distance = jnp.mean(jnp.sqrt(jnp.maximum(d2, 0.0)))

    output = jnp.concatenate([conv_out, pe.transpose(1, 0, 2)], axis=-1)
    mask = padding_mask(lengths, T)
    r_out = transformer_encoder_apply(
        params["transformer_encoder"], output, mask, cfg.nhead,
        dropout_rate=cfg.dropout, rng=r_trans, train=train,
        backend=cfg.attention_backend)
    pooled = masked_mean_pool(r_out, lengths)
    pooled = jnp.concatenate([pooled, emb], axis=1)
    return mlp_apply(params["mlp_static"], pooled), distance
