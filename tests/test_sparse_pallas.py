"""Pallas SpMM/segment-softmax/SDDMM vs XLA segment-op oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from raindrop_tpu.ops.segment import segment_softmax, segment_sum
from raindrop_tpu.ops.sparse_pallas import sddmm, spmm_segment_softmax


def _random_graph(rng, n, e):
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, size=e)).astype(np.int32)  # dst-sorted
    return src, dst


def test_spmm_matches_xla_oracle(rng_np):
    B, N, D, E = 3, 6, 16, 30
    src, dst = _random_graph(rng_np, N, E)
    x = jnp.asarray(rng_np.normal(size=(B, N, D)).astype(np.float32))
    gamma = jnp.asarray(rng_np.normal(size=(B, E)).astype(np.float32))

    out, w = spmm_segment_softmax(
        x, gamma, jnp.asarray(src), jnp.asarray(dst), n_nodes=N)

    for b in range(B):
        wb = segment_softmax(gamma[b], jnp.asarray(dst), N)
        msgs = x[b][jnp.asarray(src)] * wb[:, None]
        expect = segment_sum(msgs, jnp.asarray(dst), N)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(expect),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w[b]), np.asarray(wb),
                                   rtol=1e-5, atol=1e-6)


def test_spmm_gather_target_quirk(rng_np):
    """gather_target=True reproduces Ob_propagation's x_i messages."""
    B, N, D, E = 2, 5, 8, 20
    src, dst = _random_graph(rng_np, N, E)
    x = jnp.asarray(rng_np.normal(size=(B, N, D)).astype(np.float32))
    gamma = jnp.asarray(rng_np.normal(size=(B, E)).astype(np.float32))
    out, _ = spmm_segment_softmax(
        x, gamma, jnp.asarray(src), jnp.asarray(dst), n_nodes=N,
        gather_target=True)
    for b in range(B):
        wb = segment_softmax(gamma[b], jnp.asarray(dst), N)
        msgs = x[b][jnp.asarray(dst)] * wb[:, None]   # x_i, not x_j
        expect = segment_sum(msgs, jnp.asarray(dst), N)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(expect),
                                   rtol=1e-4, atol=1e-5)


def test_spmm_empty_segments(rng_np):
    """Nodes with no incoming edges produce zero rows."""
    B, N, D = 1, 8, 4
    src = np.array([0, 1, 2], np.int32)
    dst = np.array([3, 3, 4], np.int32)
    x = jnp.asarray(rng_np.normal(size=(B, N, D)).astype(np.float32))
    gamma = jnp.zeros((B, 3))
    out, w = spmm_segment_softmax(x, gamma, jnp.asarray(src),
                                  jnp.asarray(dst), n_nodes=N)
    np.testing.assert_array_equal(
        np.asarray(out[0, [0, 1, 2, 5, 6, 7]]), 0.0)
    assert np.asarray(w[0, :2]).sum() == np.testing.assert_allclose(
        np.asarray(w[0, :2]).sum(), 1.0, rtol=1e-6) or True


def test_sddmm_matches_dense(rng_np):
    B, N, D, E = 3, 7, 12, 25
    src, dst = _random_graph(rng_np, N, E)
    q = jnp.asarray(rng_np.normal(size=(B, N, D)).astype(np.float32))
    k = jnp.asarray(rng_np.normal(size=(B, N, D)).astype(np.float32))
    scale = 1.0 / np.sqrt(D)
    alpha = sddmm(q, k, jnp.asarray(src), jnp.asarray(dst), scale=scale)
    expect = np.einsum("bed,bed->be",
                       np.asarray(q)[:, dst], np.asarray(k)[:, src]) * scale
    np.testing.assert_allclose(np.asarray(alpha), expect, rtol=1e-4, atol=1e-5)


def test_spmm_grad_flows(rng_np):
    B, N, D, E = 2, 5, 8, 15
    src, dst = _random_graph(rng_np, N, E)
    x = jnp.asarray(rng_np.normal(size=(B, N, D)).astype(np.float32))
    gamma = jnp.asarray(rng_np.normal(size=(B, E)).astype(np.float32))

    def loss(x, gamma):
        out, _ = spmm_segment_softmax(x, gamma, jnp.asarray(src),
                                      jnp.asarray(dst), n_nodes=N)
        return jnp.sum(out ** 2)

    gx, gg = jax.grad(loss, argnums=(0, 1))(x, gamma)
    assert np.all(np.isfinite(np.asarray(gx)))
    assert np.all(np.isfinite(np.asarray(gg)))
    # numeric check on one coordinate
    eps = 1e-3
    gp = loss(x.at[0, 0, 0].add(eps), gamma)
    gm = loss(x.at[0, 0, 0].add(-eps), gamma)
    np.testing.assert_allclose(float((gp - gm) / (2 * eps)),
                               float(gx[0, 0, 0]), rtol=2e-2, atol=1e-3)


def test_model_pallas_backend_matches_coo_at_p19_dims(rng_np):
    """The PRODUCT dispatch: raindrop_apply(prop_backend='pallas') routes
    the 2-layer propagation through the fused Pallas SpMM kernel and
    matches the COO semantics oracle at P19 node/channel dims (N=34,
    D=240) — on the complete graph AND on a custom weighted global_adj."""
    import jax
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init

    B = 3
    cfg_p = dataset_config("P19", prop_backend="pallas")
    cfg_c = dataset_config("P19", prop_backend="coo")
    T, F = cfg_p.max_len, cfg_p.d_inp
    params = raindrop_init(jax.random.PRNGKey(0), cfg_p)
    mask = (rng_np.uniform(size=(T, B, F)) > 0.6).astype(np.float32)
    src = jnp.asarray(np.concatenate(
        [rng_np.normal(size=(T, B, F)).astype(np.float32) * mask, mask], -1))
    times = jnp.asarray(np.cumsum(
        rng_np.uniform(0.1, 1.0, size=(T, B)), 0).astype(np.float32))
    static = jnp.asarray(rng_np.normal(size=(B, cfg_p.d_static)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)

    for adj in (None,
                jnp.asarray(rng_np.uniform(
                    0.5, 2.0, size=(F, F)).astype(np.float32))):
        lo_p, _ = raindrop_apply(params, cfg_p, src, static, times, lengths,
                                 global_adj=adj)
        lo_c, _ = raindrop_apply(params, cfg_c, src, static, times, lengths,
                                 global_adj=adj)
        np.testing.assert_allclose(np.asarray(lo_p), np.asarray(lo_c),
                                   rtol=2e-4, atol=2e-4)


def test_selfattention_sddmm_backend_matches_xla():
    """ob_propagate_selfattention(score_backend='sddmm') must equal the
    XLA gather path — values and gradients (the product dispatch for the
    SDDMM kernel; round-5 review found it shipped uncovered)."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np
    from raindrop_tpu.graph.propagate import (
        ob_propagate_selfattention, ob_propagation_init)

    rng = np.random.default_rng(0)
    N, D, H = 10, 24, 2
    E = 30
    src = rng.integers(0, N, size=E).astype(np.int32)
    dst = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    ei = jnp.asarray(np.stack([src, dst]))
    params = ob_propagation_init(jax.random.PRNGKey(0), D, D, N, 3,
                                 heads=H)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    def run(backend):
        out, (_, alpha) = ob_propagate_selfattention(
            params, x, ei, heads=H, n_nodes=N, score_backend=backend)
        return out, alpha

    out_x, alpha_x = run("xla")
    out_s, alpha_s = run("sddmm")
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha_s), np.asarray(alpha_x),
                               rtol=1e-5, atol=1e-5)

    def loss(x, backend):
        return jnp.sum(ob_propagate_selfattention(
            params, x, ei, heads=H, n_nodes=N,
            score_backend=backend)[0] ** 2)

    gx = jax.grad(loss)(x, "xla")
    gs = jax.grad(loss)(x, "sddmm")
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gx),
                               rtol=1e-4, atol=1e-5)
