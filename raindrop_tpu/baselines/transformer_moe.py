"""Mixture-of-experts transformer — the EP slot wired into a trainable model.

No reference counterpart (the reference has no model parallelism of any
kind, SURVEY.md §2.5); this is a scale-out variant of the standard
Transformer baseline (baselines/transformer.py): same value-linear + time-PE
front end and masked-mean aggregation, but every encoder layer's dense FFN
is replaced by the top-1-routed MoE FFN from parallel/expert.py. Experts
shard over the mesh's 'model' axis (expert parallelism); the switch
load-balancing loss is returned as `aux` and weighted into the training
loss via TrainConfig.aux_loss_weight.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.config import RaindropConfig
from raindrop_tpu.nn.aggregate import masked_mean_pool, padding_mask
from raindrop_tpu.nn.init import tiny_uniform, torch_linear_params, xavier_uniform
from raindrop_tpu.nn.linear import linear_apply, mlp_apply, mlp_init
from raindrop_tpu.nn.transformer import _layer_norm, multihead_self_attention
from raindrop_tpu.ops.pe import time_positional_encoding
from raindrop_tpu.parallel.expert import moe_ffn_apply, moe_ffn_init
from raindrop_tpu.utils.dropout import dropout as _dropout


def _moe_layer_init(key, d_model: int, ffn_dim: int, n_experts: int):
    k = jax.random.split(key, 3)
    out_proj = torch_linear_params(k[1], d_model, d_model)
    out_proj["b"] = jnp.zeros((d_model,))
    return {
        "in_proj_w": xavier_uniform(k[0], (3 * d_model, d_model)),
        "in_proj_b": jnp.zeros((3 * d_model,)),
        "out_proj": out_proj,
        "moe": moe_ffn_init(k[2], d_model, ffn_dim, n_experts),
        "ln1": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
        "ln2": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
    }


def transformer_moe_init(key, cfg: RaindropConfig, n_experts: int = 4):
    k = jax.random.split(key, 5 + cfg.nlayers)
    d_enc = cfg.d_inp
    d_model = cfg.d_pe + d_enc
    d_fi = d_enc + cfg.d_pe + (cfg.d_inp if cfg.static else 0)
    params = {
        "encoder": {
            "w": tiny_uniform(k[0], (d_enc, cfg.d_inp), cfg.init_range),
            "b": torch_linear_params(k[0], cfg.d_inp, d_enc)["b"],
        },
        "layers": [_moe_layer_init(k[2 + i], d_model, cfg.ffn_dim, n_experts)
                   for i in range(cfg.nlayers)],
        "mlp": mlp_init(k[1], [d_fi, d_fi, cfg.n_classes]),
    }
    if cfg.static:
        emb = torch_linear_params(k[-2], cfg.d_static, cfg.d_inp)
        emb["w"] = tiny_uniform(k[-1], (cfg.d_inp, cfg.d_static), cfg.init_range)
        params["emb"] = emb
    return params


def transformer_moe_apply(
    params, cfg: RaindropConfig,
    src: jnp.ndarray,                  # [T, B, 2F]
    static: Optional[jnp.ndarray],
    times: jnp.ndarray,                # [T, B]
    lengths: jnp.ndarray,              # [B]
    *, train: bool = False, rng=None, mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (logits, aux) — aux is the summed switch load-balance loss."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, 1 + 3 * cfg.nlayers)
    T, B, _ = src.shape
    h = linear_apply(params["encoder"], src[:, :, : cfg.d_inp])
    pe = time_positional_encoding(times, cfg.d_pe, cfg.max_len)
    h = jnp.concatenate([pe, h], axis=2)
    h = _dropout(rngs[0], h, cfg.dropout, train)

    x = h.transpose(1, 0, 2)                           # [B, T, d]
    mask = padding_mask(lengths, T)
    aux_total = jnp.zeros(())
    for i, lp in enumerate(params["layers"]):
        r = rngs[1 + 3 * i: 4 + 3 * i]
        attn = multihead_self_attention(
            lp, x, mask, cfg.nhead, cfg.dropout, r[0], train)
        x = _layer_norm(lp["ln1"], x + _dropout(r[1], attn, cfg.dropout, train))
        ffn, aux = moe_ffn_apply(lp["moe"], x, mesh=mesh)
        aux_total = aux_total + aux
        x = _layer_norm(lp["ln2"], x + _dropout(r[2], ffn, cfg.dropout, train))

    pooled = masked_mean_pool(x, lengths)
    if cfg.static and static is not None:
        pooled = jnp.concatenate(
            [pooled, linear_apply(params["emb"], static)], axis=1)
    return mlp_apply(params["mlp"], pooled), aux_total
