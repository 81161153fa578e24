"""Context-token Transformer baseline — TransformerModel (the first variant).

Reference code/baselines/models.py:55-124: value linear scaled by
sqrt(d_model), additive time PE (full d_model width), the static embedding
prepended as a CONTEXT TOKEN at position 0 of the sequence, key-padding
mask extended by one (lengths+1), masked mean over the (T+1)-length output
divided by (lengths+1), MLP head. Not the variant the reference driver
instantiates (that is TransformerModel2), but part of the baseline surface.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.config import RaindropConfig
from raindrop_tpu.nn.init import tiny_uniform, torch_linear_params
from raindrop_tpu.nn.linear import linear_apply, mlp_apply, mlp_init
from raindrop_tpu.nn.transformer import (
    transformer_encoder_apply,
    transformer_encoder_init,
)
from raindrop_tpu.ops.pe import time_positional_encoding


def transformer_ctx_init(key, cfg: RaindropConfig, d_model: int = 64):
    k = jax.random.split(key, 4)
    enc = torch_linear_params(k[0], cfg.d_inp, d_model)
    enc["w"] = tiny_uniform(jax.random.fold_in(key, 5),
                            (d_model, cfg.d_inp), cfg.init_range)
    return {
        "encoder": enc,
        "emb": torch_linear_params(k[1], cfg.d_static, d_model),
        "transformer_encoder": transformer_encoder_init(
            k[2], d_model, cfg.nhead, cfg.ffn_dim, cfg.nlayers),
        "mlp": mlp_init(k[3], [d_model, d_model, cfg.n_classes]),
    }


def transformer_ctx_apply(
    params, cfg: RaindropConfig,
    src: jnp.ndarray,                  # [T, B, 2F]
    static: Optional[jnp.ndarray],
    times: jnp.ndarray,                # [T, B]
    lengths: jnp.ndarray,
    *, train: bool = False, rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    T, B, _ = src.shape
    d_model = params["encoder"]["w"].shape[0]
    values = src[:, :, : cfg.d_inp]
    h = linear_apply(params["encoder"], values) * math.sqrt(d_model)
    pe = time_positional_encoding(times, d_model, cfg.max_len)
    h = h + pe                                             # additive PE (:104)

    emb = linear_apply(params["emb"], static)              # [B, d_model]
    x = jnp.concatenate([emb[None], h], axis=0)            # context token (:110)

    # mask over T+1 positions: pos >= length+1 padded (:112-113)
    mask = jnp.arange(T + 1)[None, :] >= (lengths[:, None] + 1)
    x_b = x.transpose(1, 0, 2)
    r_out = transformer_encoder_apply(
        params["transformer_encoder"], x_b, mask, cfg.nhead,
        dropout_rate=cfg.dropout, rng=rng, train=train,
        backend=cfg.attention_backend)

    keep = (~mask).astype(r_out.dtype)[:, :, None]
    pooled = jnp.sum(r_out * keep, axis=1) / (
        lengths[:, None].astype(r_out.dtype) + 1.0)        # (:117-119)
    return mlp_apply(params["mlp"], pooled), jnp.zeros(())
