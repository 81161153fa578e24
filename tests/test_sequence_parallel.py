"""Time-axis sharded attention equals single-device masked attention."""

import numpy as np
import jax.numpy as jnp

from raindrop_tpu.ops.flash_attention import attention_reference
from raindrop_tpu.parallel import make_mesh
from raindrop_tpu.parallel.sequence import sequence_parallel_attention


def test_sequence_parallel_equals_dense(rng_np):
    mesh = make_mesh(n_data=2, n_model=4)
    B, H, T, D = 4, 2, 32, 16              # T divisible by model axis (4)
    q, k, v = (jnp.asarray(rng_np.normal(size=(B, H, T, D)).astype(np.float32))
               for _ in range(3))
    lengths = jnp.asarray([32, 20, 9, 0], jnp.int32)

    out = sequence_parallel_attention(mesh, q, k, v, lengths)
    expect = attention_reference(q, k, v, lengths)
    # fully padded sample: the framework convention is zeros (the dense
    # oracle's finite -1e30 mask yields a uniform mean-of-v instead)
    expect = jnp.where((lengths == 0)[:, None, None, None], 0.0, expect)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


def test_ring_attention_equals_dense(rng_np):
    """K/V rotate around the ring (ppermute) with online-softmax folding;
    result equals dense masked attention, including ragged lengths that
    end mid-block and the all-padded zero-output convention."""
    from raindrop_tpu.parallel.sequence import ring_attention

    mesh = make_mesh(n_data=2, n_model=4)
    B, H, T, D = 4, 2, 32, 16
    q, k, v = (jnp.asarray(rng_np.normal(size=(B, H, T, D)).astype(np.float32))
               for _ in range(3))
    lengths = jnp.asarray([32, 21, 9, 0], jnp.int32)   # 21: mid-block edge

    out = ring_attention(mesh, q, k, v, lengths)
    expect = attention_reference(q, k, v, lengths)
    expect = jnp.where((lengths == 0)[:, None, None, None], 0.0, expect)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


def test_ring_attention_rejects_ragged_shard():
    from raindrop_tpu.parallel.sequence import ring_attention
    import pytest

    mesh = make_mesh(n_data=2, n_model=4)
    q = jnp.zeros((2, 1, 30, 8))            # 30 % 4 != 0
    with pytest.raises(ValueError, match="divide"):
        ring_attention(mesh, q, q, q, jnp.asarray([30, 30], jnp.int32))
