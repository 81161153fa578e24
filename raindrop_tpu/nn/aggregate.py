"""Masked temporal pooling heads.

Reproduces the reference's two aggregation modes exactly, including the
(lengths + 1) denominator quirk and the sensor-wise pool that weights by
(1 - observed_mask) — i.e. averages the *unobserved* timesteps — both
preserved verbatim for parity (reference code/models_rd.py:364-379).
"""

from __future__ import annotations

import jax.numpy as jnp


def padding_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, T] True for padded timesteps (t >= length), code/models_rd.py:298-299."""
    t = jnp.arange(max_len)
    return t[None, :] >= lengths[:, None]


def masked_mean_pool(r_out: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """sum_t r_out[b,t] * (t < len_b) / (len_b + 1). r_out: [B, T, d] -> [B, d].

    Reference code/models_rd.py:378-379 (note the +1 in the denominator).
    """
    B, T, _ = r_out.shape
    keep = (~padding_mask(lengths, T)).astype(r_out.dtype)[:, :, None]
    return jnp.sum(r_out * keep, axis=1) / (lengths[:, None].astype(r_out.dtype) + 1.0)


def sensor_wise_pool(r_out: jnp.ndarray, observed_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sensor pool, reference code/models_rd.py:368-377.

    Args:
      r_out: [B, T, F, C] per-sensor transformer outputs.
      observed_mask: [B, T, F] 1.0 where the sensor was observed at t.

    Returns [B, F*C]. Quirk preserved: the sum weights timesteps by
    (1 - observed_mask) while the denominator is (#observed + 1)
    (code/models_rd.py:374-375).
    """
    B, T, F, C = r_out.shape
    w = (1.0 - observed_mask)[..., None]                       # [B, T, F, 1]
    lens = jnp.sum(observed_mask, axis=1)[..., None]           # [B, F, 1]
    pooled = jnp.sum(r_out * w, axis=1) / (lens + 1.0)         # [B, F, C]
    return pooled.reshape(B, F * C)
