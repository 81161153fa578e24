"""Segment ops: the XLA reference path for sparse graph aggregation.

These are the TPU-native equivalents of the reference's native dependency
kernels (torch_scatter.scatter at code/Ob_propagation.py:14,227 and
torch_geometric.utils.softmax at code/Ob_propagation.py:13,195).

They serve as the numerical oracle for the Pallas kernels in
raindrop_tpu/ops/pallas/, and as the general-graph fallback whenever the
dense complete-graph fast path does not apply. All shapes are static
(num_segments is a Python int), so everything jits cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Sum `data[e]` into `out[segment_ids[e]]` (scatter-add over edges).

    Equivalent of torch_scatter.scatter(..., reduce='add')
    (reference code/Ob_propagation.py:227).
    """
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(
    logits: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Numerically-stable softmax over edges grouped by destination segment.

    Matches torch_geometric.utils.softmax semantics
    (reference code/Ob_propagation.py:195): per-segment max subtraction,
    exp, per-segment normalization. `logits` is [E] or [E, C]; softmax is
    computed independently per trailing channel within each segment.

    Empty segments produce zeros (0/0 guarded), matching scatter semantics
    of zero-initialized outputs.
    """
    maxes = segment_max(logits, segment_ids, num_segments)
    # segment_max yields -inf for empty segments; those rows are never gathered
    # back by a real edge, but keep them finite to avoid nan propagation.
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    shifted = logits - maxes[segment_ids]
    ex = jnp.exp(shifted)
    denom = segment_sum(ex, segment_ids, num_segments)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    return ex / denom[segment_ids]
