"""Inverted dropout matching torch.nn.functional.dropout semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(rng, x: jnp.ndarray, rate: float, train: bool = True) -> jnp.ndarray:
    """Zero elements w.p. `rate` and scale survivors by 1/(1-rate) (train only)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
