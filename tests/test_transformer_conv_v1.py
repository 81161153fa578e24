"""TransformerConv vs a pure-torch oracle; Raindrop v1 smoke; imputation
oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raindrop_tpu.config import dataset_config
from raindrop_tpu.graph.structure import complete_graph_edges
from raindrop_tpu.graph.transformer_conv import (
    transformer_conv_apply,
    transformer_conv_init,
)
from raindrop_tpu.models.raindrop_v1 import raindrop_v1_apply, raindrop_v1_init


def _tc_oracle_torch(params, x, edge_index, edge_weights, heads, out_ch):
    """Literal transcription of the reference TransformerConv semantics
    (code/transformer_conv.py:139-210) in plain torch."""
    import torch
    import math
    from tests.torch_oracle import segment_softmax_torch

    x = torch.tensor(np.asarray(x))
    src = torch.tensor(np.asarray(edge_index[0]), dtype=torch.long)
    dst = torch.tensor(np.asarray(edge_index[1]), dtype=torch.long)
    n = x.shape[0]

    def lin(name, v):
        w = torch.tensor(np.asarray(params[name]["w"]))
        b = torch.tensor(np.asarray(params[name]["b"]))
        return v @ w.T + b

    q = lin("lin_query", x[dst]).view(-1, heads, out_ch)
    k = lin("lin_key", x[src]).view(-1, heads, out_ch)
    alpha = (q * k).sum(-1) / math.sqrt(out_ch)
    if edge_weights is not None:
        alpha = torch.tensor(np.asarray(edge_weights)).unsqueeze(-1).expand(
            alpha.shape)
    alpha = segment_softmax_torch(alpha, dst, n)
    msg = lin("lin_value", x[src]).view(-1, heads, out_ch) * alpha.unsqueeze(-1)
    out = torch.zeros(n, heads * out_ch)
    out.scatter_add_(0, dst.unsqueeze(-1).expand(-1, heads * out_ch),
                     msg.reshape(-1, heads * out_ch))
    out = out + lin("lin_skip", x)
    return out.numpy(), alpha.numpy()


@pytest.mark.parametrize("use_weights", [False, True])
def test_transformer_conv_matches_oracle(rng_np, use_weights):
    pytest.importorskip("torch")
    n, in_ch, out_ch, heads = 7, 12, 5, 2
    params = transformer_conv_init(jax.random.PRNGKey(0), in_ch, out_ch,
                                   heads=heads)
    x = rng_np.normal(size=(n, in_ch)).astype(np.float32)
    edge_index, w = complete_graph_edges(n)
    weights = (rng_np.uniform(0.5, 2.0, size=edge_index.shape[1])
               .astype(np.float32) if use_weights else None)

    out, (_, alpha) = transformer_conv_apply(
        params, jnp.asarray(x), jnp.asarray(edge_index),
        None if weights is None else jnp.asarray(weights))
    exp_out, exp_alpha = _tc_oracle_torch(
        params, x, edge_index, weights, heads, out_ch)
    np.testing.assert_allclose(np.asarray(out), exp_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), exp_alpha, rtol=1e-4, atol=1e-5)


def test_transformer_conv_beta_and_mean(rng_np):
    n, in_ch, out_ch = 5, 8, 6
    params = transformer_conv_init(jax.random.PRNGKey(1), in_ch, out_ch,
                                   heads=2, concat=False, beta=True)
    x = jnp.asarray(rng_np.normal(size=(n, in_ch)).astype(np.float32))
    edge_index, w = complete_graph_edges(n)
    out, _ = transformer_conv_apply(params, x, jnp.asarray(edge_index))
    assert out.shape == (n, out_ch)  # mean over heads when concat=False
    assert np.all(np.isfinite(np.asarray(out)))


def test_raindrop_v1_forward_and_grad(rng_np):
    cfg = dataset_config("P12", max_len=10)
    params = raindrop_v1_init(jax.random.PRNGKey(0), cfg)
    B, T, F = 3, cfg.max_len, cfg.d_inp
    mask = (rng_np.uniform(size=(T, B, F)) > 0.5).astype(np.float32)
    src = jnp.asarray(np.concatenate(
        [rng_np.normal(size=(T, B, F)).astype(np.float32) * mask, mask], -1))
    times = jnp.asarray(np.cumsum(
        rng_np.uniform(0.1, 1.0, size=(T, B)), 0).astype(np.float32))
    static = jnp.asarray(rng_np.normal(size=(B, cfg.d_static)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    logits, dist = jax.jit(
        lambda p: raindrop_v1_apply(p, cfg, src, static, times, lengths))(params)
    assert logits.shape == (B, 2)
    assert np.isfinite(float(dist))
    g = jax.grad(lambda p: jnp.sum(raindrop_v1_apply(
        p, cfg, src, static, times, lengths)[0] ** 2))(params)
    assert np.all(np.isfinite(np.asarray(g["transconv"]["lin_key"]["w"])))


def test_imputations(rng_np):
    from raindrop_tpu.data.imputation import (
        cubic_spline_imputation,
        forward_imputation,
        mean_imputation,
    )
    N, T, F = 4, 12, 3
    X = np.abs(rng_np.normal(2.0, 1.0, size=(N, T, F))).astype(np.float64)
    obs = rng_np.uniform(size=(N, T, F)) > 0.4
    X = X * obs
    X_time = np.cumsum(rng_np.uniform(0.5, 1.0, size=(N, T)), 1)
    means = np.full(F, 7.0)

    Xm = mean_imputation(X, X_time, means)
    assert np.all(Xm[X == 0] == 7.0)
    np.testing.assert_array_equal(Xm[X != 0], X[X != 0])

    Xf = forward_imputation(X, X_time)
    np.testing.assert_array_equal(Xf[X != 0], X[X != 0])
    # forward-filled value equals the most recent observation
    for i, t, f in zip(*np.nonzero((X == 0) & (Xf != 0))):
        prev = np.nonzero(X[i, :t, f])[0]
        assert Xf[i, t, f] == X[i, prev[-1], f]
    # leading missing untouched
    lead = (X[:, 0] == 0)
    np.testing.assert_array_equal(Xf[:, 0][lead], 0.0)

    Xc = cubic_spline_imputation(X, X_time)
    np.testing.assert_array_equal(Xc[X != 0], X[X != 0])
    assert np.all(np.isfinite(Xc))
