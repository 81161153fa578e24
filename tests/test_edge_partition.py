"""Distributed tier: edge-partitioned aggregation on a virtual mesh must
equal the single-device segment path (SURVEY.md §4 distributed tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raindrop_tpu.ops.segment import segment_softmax, segment_sum
from raindrop_tpu.parallel import make_mesh
from raindrop_tpu.parallel.edge_partition import spmm_segment_softmax_sharded


def _single_device(x, gamma, src, dst, n, gather_target=False):
    idx = dst if gather_target else src

    def one(xb, gb):
        w = segment_softmax(gb, dst, n)
        return segment_sum(xb[idx] * w[:, None], dst, n), w

    return jax.vmap(one)(x, gamma)


@pytest.mark.parametrize("gather_target", [False, True])
def test_edge_partitioned_equals_single_device(rng_np, gather_target):
    mesh = make_mesh(n_data=2, n_model=4)
    B, N, D = 4, 6, 16
    E = 32                                   # divisible by model axis (4)
    src = jnp.asarray(rng_np.integers(0, N, size=E).astype(np.int32))
    dst = jnp.asarray(np.sort(rng_np.integers(0, N, size=E)).astype(np.int32))
    x = jnp.asarray(rng_np.normal(size=(B, N, D)).astype(np.float32))
    gamma = jnp.asarray(rng_np.normal(size=(B, E)).astype(np.float32))

    out_s, w_s = _single_device(x, gamma, src, dst, N, gather_target)
    out_d, w_d = spmm_segment_softmax_sharded(
        mesh, x, gamma, src, dst, gather_target=gather_target)

    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_d), np.asarray(w_s),
                               rtol=1e-6, atol=1e-6)


def test_edge_partitioned_under_jit_with_sharded_inputs(rng_np):
    from raindrop_tpu.parallel.edge_partition import shard_edges
    mesh = make_mesh(n_data=2, n_model=4)
    B, N, D, E = 2, 5, 8, 24
    src = jnp.asarray(rng_np.integers(0, N, size=E).astype(np.int32))
    dst = jnp.asarray(np.sort(rng_np.integers(0, N, size=E)).astype(np.int32))
    x = jnp.asarray(rng_np.normal(size=(B, N, D)).astype(np.float32))
    gamma = jnp.asarray(rng_np.normal(size=(B, E)).astype(np.float32))
    es, ed, g = shard_edges(mesh, src, dst, gamma)

    @jax.jit
    def run(x, g):
        return spmm_segment_softmax_sharded(mesh, x, g, es, ed)

    out, w = run(x, g)
    out_s, _ = _single_device(x, gamma, src, dst, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_s),
                               rtol=1e-6, atol=1e-6)
