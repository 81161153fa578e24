"""Graph propagation layer: COO vs torch oracle, dense vs COO equivalence,
layer-1 -> layer-2 handoff semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raindrop_tpu.graph.propagate import (
    ob_propagation_init,
    ob_propagate_coo,
    ob_propagate_dense_complete,
    alpha_pairwise_distance,
)
from raindrop_tpu.graph.structure import complete_graph_edges, edges_from_adjacency


def _np_params(params):
    return jax.tree_util.tree_map(np.asarray, params)


def make_layer(n_nodes=6, T=10, d_ob=4, seed=0):
    in_ch = T * d_ob
    params = ob_propagation_init(jax.random.PRNGKey(seed), in_ch, in_ch, n_nodes, d_ob)
    return params, in_ch


def test_coo_matches_torch_oracle_no_beta(rng_np):
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import ob_propagate_torch

    n, T, d_ob = 6, 10, 4
    params, in_ch = make_layer(n, T, d_ob)
    x = rng_np.normal(size=(n, in_ch)).astype(np.float32)
    p_t = rng_np.normal(size=(T, 16)).astype(np.float32)
    edge_index, _ = complete_graph_edges(n)
    w = rng_np.uniform(0.5, 2.0, size=edge_index.shape[1]).astype(np.float32)

    out, (ei, alpha) = ob_propagate_coo(
        params, jnp.asarray(x), jnp.asarray(p_t),
        jnp.asarray(edge_index), jnp.asarray(w), use_beta=False, ob_dim=d_ob)

    expect, (_, alpha_t) = ob_propagate_torch(
        _np_params(params), torch.tensor(x), torch.tensor(p_t),
        torch.tensor(edge_index.astype(np.int64)), torch.tensor(w),
        use_beta=False, ob_dim=d_ob)
    np.testing.assert_allclose(np.asarray(out), expect.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), alpha_t.numpy(), rtol=1e-6)


def test_coo_matches_torch_oracle_beta(rng_np):
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import ob_propagate_torch

    n, T, d_ob = 6, 10, 4
    params, in_ch = make_layer(n, T, d_ob, seed=3)
    x = rng_np.normal(size=(n, in_ch)).astype(np.float32)
    p_t = rng_np.normal(size=(T, 16)).astype(np.float32)
    edge_index, _ = complete_graph_edges(n)
    w = rng_np.uniform(0.5, 2.0, size=edge_index.shape[1]).astype(np.float32)

    out, (ei, alpha) = ob_propagate_coo(
        params, jnp.asarray(x), jnp.asarray(p_t),
        jnp.asarray(edge_index), jnp.asarray(w), use_beta=True, ob_dim=d_ob)

    expect, (ei_t, alpha_t) = ob_propagate_torch(
        _np_params(params), torch.tensor(x), torch.tensor(p_t),
        torch.tensor(edge_index.astype(np.int64)), torch.tensor(w),
        use_beta=True, ob_dim=d_ob)
    assert ei.shape == (2, edge_index.shape[1] // 2)
    np.testing.assert_array_equal(np.asarray(ei), ei_t.numpy())
    np.testing.assert_allclose(np.asarray(alpha), alpha_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), expect.numpy(), rtol=1e-4, atol=1e-5)


def test_dense_equals_coo_complete_graph(rng_np):
    n, T, d_ob, B = 5, 8, 4, 3
    params, in_ch = make_layer(n, T, d_ob, seed=1)
    x = rng_np.normal(size=(B, n, in_ch)).astype(np.float32)
    adj = rng_np.uniform(0.5, 2.0, size=(n, n)).astype(np.float32)
    edge_index, _ = complete_graph_edges(n)
    w = adj[edge_index[0], edge_index[1]]

    out_d, alpha_d = ob_propagate_dense_complete(params, jnp.asarray(x), jnp.asarray(adj))

    p_t = jnp.zeros((T, 16))
    for b in range(B):
        out_c, (_, alpha_c) = ob_propagate_coo(
            params, jnp.asarray(x[b]), p_t,
            jnp.asarray(edge_index), jnp.asarray(w), use_beta=False, ob_dim=d_ob)
        np.testing.assert_allclose(np.asarray(out_d[b]), np.asarray(out_c),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(alpha_d[b]), np.asarray(alpha_c)[:, 0],
                                   rtol=1e-6)


def test_uniform_attention_degenerates_to_pointwise(rng_np):
    """With all-ones weights on a complete graph and no dropout, the layer is
    out[v] = relu(lin_value(x[v])) (see quirk analysis of
    code/Ob_propagation.py:187,195-210)."""
    n, T, d_ob = 4, 6, 4
    params, in_ch = make_layer(n, T, d_ob, seed=2)
    x = rng_np.normal(size=(1, n, in_ch)).astype(np.float32)
    out, _ = ob_propagate_dense_complete(params, jnp.asarray(x), jnp.ones((n, n)))
    expect = jax.nn.relu(jnp.asarray(x[0]) @ params["lin_value"]["w"].T
                         + params["lin_value"]["b"])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expect), rtol=1e-5, atol=1e-6)


def test_edges_from_adjacency_forces_self_loops():
    adj = np.zeros((3, 3), np.float32)
    adj[0, 1] = 2.0
    ei, w = edges_from_adjacency(adj)
    pairs = set(map(tuple, ei.T.tolist()))
    assert {(0, 0), (1, 1), (2, 2), (0, 1)} == pairs
    assert w[np.all(ei == [[0], [1]], axis=0)][0] == 2.0


def test_alpha_pairwise_distance():
    a = jnp.array([[0.0, 0.0], [3.0, 4.0]])
    # pairs: (0,0)=0 (0,1)=5 (1,0)=5 (1,1)=0 -> mean 2.5
    assert float(alpha_pairwise_distance(a)) == pytest.approx(2.5)


def test_alpha_pairwise_distance_matches_naive_broadcast(rng_np):
    # The Gram-matrix form must agree with the direct ||a_i - a_j|| mean
    # (torch.cdist semantics, reference code/models_rd.py:345-346).
    a = rng_np.normal(size=(16, 49)).astype(np.float32)
    naive = np.mean(np.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1))
    got = float(alpha_pairwise_distance(jnp.asarray(a)))
    assert got == pytest.approx(float(naive), rel=1e-5)
    # identical rows -> exactly zero, no NaN from the sqrt at the diagonal
    b = jnp.broadcast_to(jnp.asarray(a[0]), (8, a.shape[1]))
    assert float(alpha_pairwise_distance(b)) == pytest.approx(0.0, abs=1e-5)


def test_coo_jit_and_grad(rng_np):
    n, T, d_ob = 5, 8, 4
    params, in_ch = make_layer(n, T, d_ob, seed=4)
    x = jnp.asarray(rng_np.normal(size=(n, in_ch)).astype(np.float32))
    p_t = jnp.asarray(rng_np.normal(size=(T, 16)).astype(np.float32))
    edge_index, w = complete_graph_edges(n)

    @jax.jit
    def loss(params, x):
        out, _ = ob_propagate_coo(
            params, x, p_t, jnp.asarray(edge_index), jnp.asarray(w),
            use_beta=True, ob_dim=d_ob)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params, x)
    assert np.isfinite(float(loss(params, x)))
    assert np.all(np.isfinite(np.asarray(g["lin_value"]["w"])))


def _beta_coo_pair(params1, params2, x, p_t, edge_index, w, d_ob, n):
    """Reference composition: the model's vmapped two-layer use_beta block
    (models/raindrop.py COO branch) for one sample."""
    o1, (ei2, a1) = ob_propagate_coo(
        params1, x, p_t, edge_index, w, use_beta=True, ob_dim=d_ob, n_nodes=n)
    w2 = a1 if a1.ndim == 1 else a1[:, 0]
    o2, (_, a2) = ob_propagate_coo(
        params2, o1, p_t, ei2, w2, use_beta=False, ob_dim=d_ob, n_nodes=n)
    return o2, a2[:, 0]


@pytest.mark.parametrize("uniform_adj", [True, False])
@pytest.mark.parametrize("n,T,B", [(6, 10, 3), (34, 12, 4)])
def test_beta_dense_matches_vmapped_coo(rng_np, n, T, B, uniform_adj):
    """raindrop_propagate_beta_dense == vmap(two-layer COO) bit-for-bit in
    selection (same argsort tie-breaking under a uniform adjacency) and to
    fp tolerance in values — including the all-ones-weights tie regime the
    shipped config runs in."""
    from raindrop_tpu.graph.propagate import raindrop_propagate_beta_dense

    d_ob = 4
    params1, in_ch = make_layer(n, T, d_ob, seed=1)
    params2, _ = make_layer(n, T, d_ob, seed=2)
    x = jnp.asarray(rng_np.normal(size=(B, n, in_ch)).astype(np.float32))
    pe = jnp.asarray(rng_np.normal(size=(B, T, 16)).astype(np.float32))
    edge_index, w = complete_graph_edges(n)
    edge_index, w = jnp.asarray(edge_index), jnp.asarray(w)  # all-ones w

    coo_o, coo_a = jax.vmap(
        lambda xb, pb: _beta_coo_pair(params1, params2, xb, pb,
                                      edge_index, w, d_ob, n))(x, pe)
    dense_o, dense_a = raindrop_propagate_beta_dense(
        params1, params2, x, pe, jnp.ones((n, n), jnp.float32), ob_dim=d_ob,
        uniform_adj=uniform_adj)

    np.testing.assert_allclose(np.asarray(dense_a), np.asarray(coo_a),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dense_o), np.asarray(coo_o),
                               rtol=1e-4, atol=1e-5)


def test_beta_dense_grads_match_coo(rng_np):
    """Gradients of the two formulations agree (same function => same
    derivative; catches silent AD breakage in the masked-dense softmax)."""
    from raindrop_tpu.graph.propagate import raindrop_propagate_beta_dense

    n, T, d_ob, B = 6, 10, 4, 2
    params1, in_ch = make_layer(n, T, d_ob, seed=3)
    params2, _ = make_layer(n, T, d_ob, seed=4)
    x = jnp.asarray(rng_np.normal(size=(B, n, in_ch)).astype(np.float32))
    pe = jnp.asarray(rng_np.normal(size=(B, T, 16)).astype(np.float32))
    edge_index, w = complete_graph_edges(n)
    edge_index, w = jnp.asarray(edge_index), jnp.asarray(w)

    def loss_coo(ps, x):
        o, a = jax.vmap(lambda xb, pb: _beta_coo_pair(
            ps[0], ps[1], xb, pb, edge_index, w, d_ob, n))(x, pe)
        return jnp.sum(o ** 2) + jnp.sum(a ** 2)

    def loss_dense(ps, x):
        o, a = raindrop_propagate_beta_dense(
            ps[0], ps[1], x, pe, jnp.ones((n, n), jnp.float32), ob_dim=d_ob)
        return jnp.sum(o ** 2) + jnp.sum(a ** 2)

    g_coo = jax.grad(loss_coo, argnums=(0, 1))((params1, params2), x)
    g_dense = jax.grad(loss_dense, argnums=(0, 1))((params1, params2), x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5), g_coo, g_dense)


def test_alpha_distance_gradient_safe_at_ties():
    """sqrt'(0) must not NaN the regularizer's gradient: the pairwise
    distance is 0 on the diagonal and wherever two samples' alphas tie
    (always, in the default config where alpha is the shared edge
    weights); the subgradient there is 0, not inf * 0 = NaN. Any run with
    TrainConfig.aux_loss_weight > 0 exercises this path."""
    # all rows identical -> every pairwise distance is exactly 0
    a_tied = jnp.ones((4, 6))
    g = jax.grad(lambda a: alpha_pairwise_distance(a))(a_tied)
    assert float(alpha_pairwise_distance(a_tied)) == 0.0
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_array_equal(np.asarray(g), 0.0)
    # mixed ties + distinct rows: finite grads, forward matches naive
    a = jnp.asarray([[1.0, 2.0], [1.0, 2.0], [3.0, -1.0]])
    g2 = jax.grad(lambda a: alpha_pairwise_distance(a))(a)
    assert np.all(np.isfinite(np.asarray(g2)))
    naive = np.mean([np.linalg.norm(np.asarray(a)[i] - np.asarray(a)[j])
                     for i in range(3) for j in range(3)])
    assert float(alpha_pairwise_distance(a)) == pytest.approx(naive, rel=1e-6)


def test_dense_complete_uniform_fast_path():
    """uniform=True (the shipped all-ones adjacency) must equal the
    general softmax+rescale path to fp tolerance — the scale factor is
    sum_s softmax(ones) == 1."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raindrop_tpu.graph.propagate import (
        ob_propagate_dense_complete, ob_propagation_init)

    n, D = 7, 12
    params = ob_propagation_init(jax.random.PRNGKey(0), D, D, n, 3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, n, D))
                    .astype(np.float32))
    adj = jnp.ones((n, n))
    out_g, alpha_g = ob_propagate_dense_complete(params, x, adj)
    out_u, alpha_u = ob_propagate_dense_complete(params, x, adj,
                                                 uniform=True)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_g),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(alpha_u), np.asarray(alpha_g))
