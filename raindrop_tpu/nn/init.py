"""Parameter initializers with reference-parity distributions.

The reference mixes torch.nn.Linear defaults (Kaiming-uniform fan_in),
PyG `glorot`, and tiny-uniform(1e-10) init (reference code/models_rd.py:271-276,
code/Ob_propagation.py:76-92). Matching the distributions (not bitwise RNG)
keeps training dynamics comparable; parity tests port exact weights instead.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def uniform(key, shape, minval, maxval, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype, minval=minval, maxval=maxval)


def torch_linear_params(key, in_features: int, out_features: int, dtype=jnp.float32,
                        bias: bool = True):
    """torch.nn.Linear default init: weight,bias ~ U(-1/sqrt(fan_in), +).

    Weight stored in torch layout [out, in] so parity tests can port
    state_dicts without transposition.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = uniform(kw, (out_features, in_features), -bound, bound, dtype)
    if not bias:
        return {"w": w}
    b = uniform(kb, (out_features,), -bound, bound, dtype)
    return {"w": w, "b": b}


def glorot(key, shape: Tuple[int, ...], dtype=jnp.float32):
    """PyG glorot: U(-a, a), a = sqrt(6 / (shape[-2] + shape[-1]))."""
    a = math.sqrt(6.0 / (shape[-2] + shape[-1]))
    return uniform(key, shape, -a, a, dtype)


def xavier_uniform(key, shape: Tuple[int, int], dtype=jnp.float32, gain: float = 1.0):
    """torch xavier_uniform_ on a [out, in] matrix."""
    fan_out, fan_in = shape
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return uniform(key, shape, -a, a, dtype)


def tiny_uniform(key, shape, initrange: float = 1e-10, dtype=jnp.float32):
    """uniform_(-1e-10, 1e-10) used for encoder/emb weights (code/models_rd.py:272)."""
    return uniform(key, shape, -initrange, initrange, dtype)
