"""Linear and MLP primitives (functional, pytree params, torch weight layout)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raindrop_tpu.nn.init import torch_linear_params


def linear_init(key, in_features: int, out_features: int, dtype=jnp.float32,
                bias: bool = True):
    return torch_linear_params(key, in_features, out_features, dtype, bias=bias)


def linear_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ w.T + b with w in torch layout [out, in]."""
    y = x @ params["w"].T
    if "b" in params:
        y = y + params["b"]
    return y


def mlp_init(key, dims, dtype=jnp.float32):
    """Sequential Linear/ReLU/.../Linear; `dims` = [in, hidden..., out].

    Mirrors the reference's mlp_static head
    (Linear -> ReLU -> Linear, code/models_rd.py:254-258).
    """
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"lin{i}": linear_init(k, dims[i], dims[i + 1], dtype)
        for i, k in enumerate(keys)
    }


def mlp_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    n = len(params)
    for i in range(n):
        x = linear_apply(params[f"lin{i}"], x)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x
