"""mTAND baseline — multi-time attention network (classifier encoder).

Reference code/baselines/mTAND/models.py: `multiTimeAttention` (:9-51)
cross-attends a learned time embedding of 128 reference points (query)
onto the observation timeline (key), with per-channel masking — scores are
repeated across the 2F value channels and masked where the channel is
unobserved (:28-33); `enc_mtan_classif` (:54-109) feeds the attended
[B, 128, nhidden] sequence through a GRU and takes the final hidden state
into a 300-300 MLP classifier.

Input convention matches the mTAND stack: x = [values ‖ mask] with the
mask duplicated to 2F channels (models.py:95-97), times in [0, 1]
(mTAND_baseline.py normalizes by 48h max in utils.get_data).

Published hyperparameters (mTAND_baseline.py:21-52): nhidden=rec_hidden,
embed_time=128, num_heads=1, lr=1e-4 + classifier lr ×... (driver detail),
128 reference points = linspace(0, 1, 128).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.nn.init import torch_linear_params
from raindrop_tpu.nn.linear import linear_apply, mlp_init, mlp_apply


def mtand_init(key, input_dim: int, *, nhidden: int = 16, embed_time: int = 16,
               num_heads: int = 1, n_classes: int = 2, n_ref: int = 128):
    """input_dim = 2F (values + mask channels)."""
    if embed_time % num_heads:
        raise ValueError("embed_time % num_heads != 0 (mTAND/models.py:14)")
    k = jax.random.split(key, 8)
    params = {
        "att_q": torch_linear_params(k[0], embed_time, embed_time),
        "att_k": torch_linear_params(k[1], embed_time, embed_time),
        "att_out": torch_linear_params(k[2], input_dim * num_heads, nhidden),
        "periodic": torch_linear_params(k[3], 1, embed_time - 1),
        "linear": torch_linear_params(k[4], 1, 1),
        "classifier": mlp_init(k[5], [nhidden, 300, 300, n_classes]),
        "gru": _gru_init(k[6], nhidden, nhidden),
        "query_points": jnp.linspace(0.0, 1.0, n_ref),
    }
    return params


def _gru_init(key, in_dim, hidden):
    k = jax.random.split(key, 2)
    stdv = 1.0 / jnp.sqrt(jnp.asarray(float(hidden)))
    return {
        "w_ih": jax.random.uniform(k[0], (3 * hidden, in_dim), minval=-stdv, maxval=stdv),
        "w_hh": jax.random.uniform(k[1], (3 * hidden, hidden), minval=-stdv, maxval=stdv),
        "b_ih": jnp.zeros((3 * hidden,)),
        "b_hh": jnp.zeros((3 * hidden,)),
    }


def _gru_scan(p, xs):
    """torch.nn.GRU cell over time (reference mTAND/models.py:82 self.enc)."""
    hidden = p["w_hh"].shape[1]

    def cell(h, x):
        gi = x @ p["w_ih"].T + p["b_ih"]
        gh = h @ p["w_hh"].T + p["b_hh"]
        ir, iz, inn = jnp.split(gi, 3, axis=-1)
        hr, hz, hnn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hnn)
        return (1 - z) * n + z * h, None

    B = xs.shape[0]
    h, _ = jax.lax.scan(cell, jnp.zeros((B, hidden)), xs.transpose(1, 0, 2))
    return h


def _time_embedding(params, tt):
    """Learned time embedding: [linear(t) ‖ sin(periodic(t))]
    (mTAND/models.py:84-89). tt [..., L] -> [..., L, embed_time]."""
    tt = tt[..., None]
    out1 = linear_apply(params["linear"], tt)
    out2 = jnp.sin(linear_apply(params["periodic"], tt))
    return jnp.concatenate([out1, out2], axis=-1)


def mtand_apply(
    params,
    x: jnp.ndarray,           # [B, T, 2F]: values ‖ observation mask
    times: jnp.ndarray,       # [B, T] in [0, 1]
    *,
    num_heads: int = 1,
    train: bool = False,
    rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, T, D2 = x.shape
    F = D2 // 2
    mask2 = jnp.concatenate([x[:, :, F:], x[:, :, F:]], axis=2)  # [B, T, 2F]

    key_emb = _time_embedding(params, times)                     # [B, T, E]
    query_emb = _time_embedding(params, params["query_points"][None])  # [1, R, E]
    E = key_emb.shape[-1]
    hd = E // num_heads

    def heads(t, n):
        return t.reshape(t.shape[0], n, num_heads, hd).transpose(0, 2, 1, 3)

    q = heads(linear_apply(params["att_q"], query_emb), query_emb.shape[1])
    k = heads(linear_apply(params["att_k"], key_emb), T)
    q = jnp.broadcast_to(q, (B,) + q.shape[1:])

    scores = jnp.einsum("bhrd,bhtd->bhrt", q, k) / jnp.sqrt(float(hd))
    # per-channel masking: scores repeated over channels, unobserved channel
    # entries -1e9 before the softmax over the T axis (mTAND/models.py:28-33)
    scores = scores[..., None]                                    # [B,h,R,T,1]
    chan_mask = mask2[:, None, None]                              # [B,1,1,T,2F]
    scores = jnp.where(chan_mask == 0, -1e9, scores)
    p_attn = jax.nn.softmax(scores, axis=-2)
    attended = jnp.sum(p_attn * x[:, None, None], axis=-2)        # [B,h,R,2F]
    attended = attended.transpose(0, 2, 1, 3).reshape(B, -1, num_heads * D2)
    out = linear_apply(params["att_out"], attended)               # [B, R, nh]

    h = _gru_scan(params["gru"], out)
    return mlp_apply(params["classifier"], h), jnp.zeros(())
