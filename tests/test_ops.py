"""Unit tests: segment ops, positional encoding, linear init/apply."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raindrop_tpu.ops.segment import segment_softmax, segment_sum
from raindrop_tpu.ops.pe import time_positional_encoding, pe_timescales
from raindrop_tpu.nn.linear import linear_init, linear_apply


def test_segment_sum_basic():
    data = jnp.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    ids = jnp.array([0, 2, 0])
    out = segment_sum(data, ids, 3)
    np.testing.assert_allclose(out, [[6.0, 8.0], [0.0, 0.0], [3.0, 4.0]])


def test_segment_softmax_matches_dense(rng_np):
    E, C, S = 64, 5, 7
    logits = jnp.asarray(rng_np.normal(size=(E, C)).astype(np.float32)) * 10
    ids = jnp.asarray(rng_np.integers(0, S, size=E))
    out = np.asarray(segment_softmax(logits, ids, S))
    # dense oracle per segment/channel
    for s in range(S):
        m = np.asarray(ids) == s
        if m.sum() == 0:
            continue
        expect = np.exp(np.asarray(logits)[m] - np.asarray(logits)[m].max(0))
        expect = expect / expect.sum(0)
        np.testing.assert_allclose(out[m], expect, rtol=1e-5, atol=1e-6)


def test_segment_softmax_sums_to_one(rng_np):
    E, S = 100, 10
    logits = jnp.asarray(rng_np.normal(size=(E,)).astype(np.float32))
    ids = jnp.asarray(np.sort(rng_np.integers(0, S, size=E)))
    out = segment_softmax(logits, ids, S)
    sums = segment_sum(out, ids, S)
    present = np.isin(np.arange(S), np.asarray(ids))
    np.testing.assert_allclose(np.asarray(sums)[present], 1.0, rtol=1e-5)


def test_pe_matches_reference_formula(rng_np):
    """pe = [sin(t/tau) || cos(t/tau)], tau = max_len ** linspace(0,1,8)
    (reference code/models_rd.py:28-38)."""
    T, B, d_pe, max_len = 13, 3, 16, 215
    times = rng_np.uniform(0, 48, size=(T, B)).astype(np.float32)
    got = np.asarray(time_positional_encoding(jnp.asarray(times), d_pe, max_len))
    tau = max_len ** np.linspace(0, 1, d_pe // 2)
    scaled = times[..., None] / tau
    expect = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=-1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)
    assert got.shape == (T, B, d_pe)


def test_pe_timescales_endpoints():
    ts = pe_timescales(16, 215)
    assert ts[0] == 1.0 and ts[-1] == pytest.approx(215.0)


def test_linear_matches_torch(rng_np):
    torch = pytest.importorskip("torch")
    key = jax.random.PRNGKey(0)
    p = linear_init(key, 7, 5)
    x = rng_np.normal(size=(4, 7)).astype(np.float32)
    got = np.asarray(linear_apply(p, jnp.asarray(x)))
    lin = torch.nn.Linear(7, 5)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(np.asarray(p["w"])))
        lin.bias.copy_(torch.tensor(np.asarray(p["b"])))
        expect = lin(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_linear_init_distribution():
    key = jax.random.PRNGKey(1)
    p = linear_init(key, 100, 200)
    bound = 1 / np.sqrt(100)
    w = np.asarray(p["w"])
    assert w.shape == (200, 100)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.8 * bound  # actually spans the range
