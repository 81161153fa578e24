"""Time-aware positional encoding.

Re-implements PositionalEncodingTF (reference code/models_rd.py:20-43) as a
pure jnp function — the reference round-trips times through the CPU/numpy on
every forward (code/models_rd.py:33-36); here the timescales are baked in as
constants and everything stays on device and inside jit.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pe_timescales(d_pe: int, max_len: int) -> np.ndarray:
    """timescales = max_len ** linspace(0, 1, d_pe//2) (code/models_rd.py:31)."""
    n = d_pe // 2
    return np.asarray(max_len, dtype=np.float64) ** np.linspace(0.0, 1.0, n)


def time_positional_encoding(
    times: jnp.ndarray, d_pe: int, max_len: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Continuous-time sin/cos encoding.

    Args:
      times: [...,] arbitrary-shape timestamps (hours). Reference uses [T, B].
      d_pe: encoding dim (16 for Raindrop_v2, code/models_rd.py:217).
      max_len: dataset max sequence length; sets the timescale geometric range.

    Returns [..., d_pe] = concat(sin(t/tau), cos(t/tau)) (code/models_rd.py:33-36).
    """
    scales = jnp.asarray(pe_timescales(d_pe, max_len), dtype=dtype)
    scaled = times[..., None].astype(dtype) / scales
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
