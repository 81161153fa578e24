"""Inverted dropout matching torch.nn.functional.dropout semantics.

Mask bits come from a counter-based integer hash (xorshift-multiply
finalizer) of (key, element index) rather than jax.random.bernoulli:
threefry mask generation measured 1.65 ms for one [600, 128, 68] mask on
v5e — pure VPU hashing is ~5x cheaper and deterministic per key, which is
all dropout needs. Statistical quality is ample for Bernoulli thinning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hash_bits(seed32: jnp.ndarray, shape) -> jnp.ndarray:
    """uint32 hash of (seed, flat element index), SplitMix-style finalizer."""
    size = 1
    for d in shape:
        size *= int(d)
    idx = jnp.arange(size, dtype=jnp.uint32).reshape(shape)
    x = idx * jnp.uint32(0x9E3779B9) ^ seed32
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def dropout(rng, x: jnp.ndarray, rate: float, train: bool = True) -> jnp.ndarray:
    """Zero elements w.p. `rate` and scale survivors by 1/(1-rate) (train only)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    kd = jax.random.key_data(rng).astype(jnp.uint32).reshape(-1)
    seed = kd[-1] * jnp.uint32(0x85EBCA6B) ^ kd[0]
    bits = _hash_bits(seed, x.shape)
    threshold = jnp.uint32(int(rate * float(2 ** 32)))
    return jnp.where(bits >= threshold, x / (1.0 - rate), jnp.zeros_like(x))
