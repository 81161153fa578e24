"""SeFT (Set Functions for Time Series) baseline.

Reference code/baselines/models.py:219-334. Each observed (time, value,
sensor) triple becomes a 48-d tuple [time-PE ‖ value-linear(16) ‖
sensor-PE(16)]; the sample representation is the mean over its observation
set, duplicated (the reference concatenates f_prime with the per-tuple
mean, and both equal the set mean after the outer mean at :319-325), then
lin_map -> 128, static emb concat, MLP head.

The reference extracts nonzero entries per sample in a Python loop
(models.py:296-323). Here the set mean is a masked mean over the dense
[B, T, F] grid — identical math, one batched op, static shapes.

Quirk preserved: tuples are built from entries with value != 0 (torch
.nonzero), not the missingness mask.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.config import RaindropConfig
from raindrop_tpu.nn.init import tiny_uniform, torch_linear_params, xavier_uniform
from raindrop_tpu.nn.linear import linear_apply, mlp_apply, mlp_init
from raindrop_tpu.ops.pe import time_positional_encoding


def seft_init(key, cfg: RaindropConfig):
    k = jax.random.split(key, 6)
    d_K = 2 * (cfg.d_pe + 16 + 16)          # 96 (models.py:248)
    d_fi = 128 + (cfg.d_pe if cfg.static else 0)
    lv = torch_linear_params(k[0], 1, 16)
    lv["w"] = tiny_uniform(k[1], (16, 1), cfg.init_range)
    lm = torch_linear_params(k[2], d_K, 128)
    lm["w"] = tiny_uniform(k[3], (128, d_K), cfg.init_range)
    params = {
        "linear_value": lv,
        "lin_map": lm,
        "proj_weight": xavier_uniform(k[4], (d_K, 128)),  # created, unused (:259)
        "mlp": mlp_init(k[5], [d_fi, d_fi, cfg.n_classes]),
    }
    if cfg.static:
        emb = torch_linear_params(jax.random.fold_in(key, 9), cfg.d_static, 16)
        emb["w"] = tiny_uniform(jax.random.fold_in(key, 10), (16, cfg.d_static),
                                cfg.init_range)
        params["emb"] = emb
    return params


def seft_apply(
    params, cfg: RaindropConfig,
    src: jnp.ndarray,                  # [T, B, 2F]
    static: Optional[jnp.ndarray],
    times: jnp.ndarray,                # [T, B]
    lengths: jnp.ndarray,
    *, train: bool = False, rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    T, B, _ = src.shape
    F = cfg.d_inp
    values = src[:, :, :F].transpose(1, 0, 2)            # [B, T, F]
    obs = (values != 0).astype(values.dtype)

    # time PE of each entry's timestamp (same for all F at a step)
    pe_t = time_positional_encoding(times, cfg.d_pe, cfg.max_len)  # [T, B, 16]
    pe_t = pe_t.transpose(1, 0, 2)[:, :, None, :]        # [B, T, 1, 16]
    pe_t = jnp.broadcast_to(pe_t, (B, T, F, cfg.d_pe))

    # sensor-index PE (models.py:313: pos_encoder_sensor on the variable id)
    sensor_ids = jnp.arange(F, dtype=values.dtype)
    pe_s = time_positional_encoding(
        jnp.broadcast_to(sensor_ids[:, None], (F, 1)), 16, cfg.max_len)[:, 0]
    pe_s = jnp.broadcast_to(pe_s[None, None], (B, T, F, 16))

    val_emb = linear_apply(params["linear_value"], values[..., None])  # [B,T,F,16]

    unit = jnp.concatenate([pe_t, val_emb, pe_s], axis=-1)             # [B,T,F,48]
    w = obs[..., None]
    denom = jnp.maximum(jnp.sum(obs, axis=(1, 2)), 1.0)[:, None]
    set_mean = jnp.sum(unit * w, axis=(1, 2)) / denom                  # [B, 48]
    # f_prime == set_mean, concatenated (models.py:319-325)
    rep = jnp.concatenate([set_mean, set_mean], axis=-1)               # [B, 96]
    # samples with zero observations contribute zeros (models.py:299-300)
    rep = jnp.where(jnp.sum(obs, axis=(1, 2))[:, None] > 0, rep, 0.0)

    out = linear_apply(params["lin_map"], rep)
    if cfg.static and static is not None:
        out = jnp.concatenate([out, linear_apply(params["emb"], static)], axis=1)
    return mlp_apply(params["mlp"], out), jnp.zeros(())
