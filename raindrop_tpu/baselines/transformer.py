"""'Standard Transformer' baseline — TransformerModel2.

Reference code/baselines/models.py:127-216 (the variant instantiated by
Transformer_baseline.py:272-277): value linear d_inp->d_inp, 16-d time PE
concatenated, nn.TransformerEncoder (d_pe+d_inp wide), masked mean or max
aggregation with the (lengths+1) denominator, optional static embedding
concat, 2-layer MLP head. Published dims: d_model=36, nhid=128, nlayers=1,
nhead=1, dropout=0.3 (Transformer_baseline.py:95-98).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.nn.aggregate import masked_mean_pool, padding_mask
from raindrop_tpu.nn.init import tiny_uniform, torch_linear_params
from raindrop_tpu.nn.linear import linear_apply, mlp_apply, mlp_init
from raindrop_tpu.nn.transformer import (
    transformer_encoder_apply,
    transformer_encoder_init,
)
from raindrop_tpu.ops.pe import time_positional_encoding
from raindrop_tpu.utils.dropout import dropout as _dropout
from raindrop_tpu.config import RaindropConfig


def transformer2_init(key, cfg: RaindropConfig):
    """cfg reuse: d_inp, d_static, max_len, n_classes, static, nhead,
    nlayers, nhid, dropout, d_pe."""
    k = jax.random.split(key, 5)
    d_enc = cfg.d_inp
    d_model = cfg.d_pe + d_enc
    d_fi = d_enc + cfg.d_pe + (cfg.d_inp if cfg.static else 0)
    params = {
        "encoder": {
            "w": tiny_uniform(k[0], (d_enc, cfg.d_inp), cfg.init_range),
            "b": torch_linear_params(k[0], cfg.d_inp, d_enc)["b"],
        },
        "transformer_encoder": transformer_encoder_init(
            k[1], d_model, cfg.nhead, cfg.ffn_dim, cfg.nlayers),
        "mlp": mlp_init(k[2], [d_fi, d_fi, cfg.n_classes]),
    }
    if cfg.static:
        emb = torch_linear_params(k[3], cfg.d_static, cfg.d_inp)
        emb["w"] = tiny_uniform(k[4], (cfg.d_inp, cfg.d_static), cfg.init_range)
        params["emb"] = emb
    return params


def transformer2_apply(
    params, cfg: RaindropConfig,
    src: jnp.ndarray,                  # [T, B, 2F]
    static: Optional[jnp.ndarray],
    times: jnp.ndarray,                # [T, B]
    lengths: jnp.ndarray,              # [B]
    *, train: bool = False, rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward (reference code/baselines/models.py:183-216)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_drop, r_trans = jax.random.split(rng)
    T, B, _ = src.shape
    values = src[:, :, : cfg.d_inp]                      # drop the mask half
    h = linear_apply(params["encoder"], values)          # [T, B, d_enc]
    pe = time_positional_encoding(times, cfg.d_pe, cfg.max_len)
    h = jnp.concatenate([pe, h], axis=2)                 # PE first (models.py:190)
    h = _dropout(r_drop, h, cfg.dropout, train)

    h_b = h.transpose(1, 0, 2)
    mask = padding_mask(lengths, T)
    r_out = transformer_encoder_apply(
        params["transformer_encoder"], h_b, mask, cfg.nhead,
        dropout_rate=cfg.dropout, rng=r_trans, train=train,
        backend=cfg.attention_backend)

    if cfg.aggreg == "mean":
        pooled = masked_mean_pool(r_out, lengths)
    else:  # 'max' (models.py:210): padded steps scaled by -10
        keep = (~mask).astype(r_out.dtype)[:, :, None]
        pooled = jnp.max(r_out * (keep + (1 - keep) * -10.0), axis=1)

    if cfg.static and static is not None:
        pooled = jnp.concatenate(
            [pooled, linear_apply(params["emb"], static)], axis=1)
    return mlp_apply(params["mlp"], pooled), jnp.zeros(())
