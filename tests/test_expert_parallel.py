"""Expert-parallel MoE FFN (parallel/expert.py) on the virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from raindrop_tpu.parallel.expert import (
    moe_ffn_apply,
    moe_ffn_init,
    shard_moe_params,
)
from raindrop_tpu.parallel.mesh import make_mesh


def _reference_moe(params, x):
    """Per-token loop oracle: route each token to its argmax expert."""
    E = params["w1"].shape[0]
    logits = np.asarray(x @ params["gate"]["w"].T + params["gate"]["b"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    B, T, d = x.shape
    out = np.zeros((B, T, d), np.float32)
    xn = np.asarray(x)
    for b in range(B):
        for t in range(T):
            e = int(np.argmax(probs[b, t]))
            h = np.maximum(
                xn[b, t] @ np.asarray(params["w1"][e]).T + np.asarray(params["b1"][e]), 0)
            y = h @ np.asarray(params["w2"][e]).T + np.asarray(params["b2"][e])
            out[b, t] = probs[b, t, e] * y
    return out


def test_moe_matches_per_token_routing():
    d, ffn, E = 6, 10, 4
    params = moe_ffn_init(jax.random.PRNGKey(0), d, ffn, E)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 5, d)).astype(np.float32))
    out, aux = moe_ffn_apply(params, x)
    np.testing.assert_allclose(np.asarray(out), _reference_moe(params, x),
                               rtol=1e-5, atol=1e-5)
    assert float(aux) >= 1.0 - 1e-5  # perfectly balanced load gives exactly 1


def test_moe_expert_sharded_matches_unsharded():
    d, ffn, E = 8, 12, 4
    mesh = make_mesh(n_data=4, n_model=2)
    params = moe_ffn_init(jax.random.PRNGKey(1), d, ffn, E)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 6, d)).astype(np.float32))

    expect, aux0 = moe_ffn_apply(params, x)

    sharded = shard_moe_params(mesh, params)
    with jax.set_mesh(mesh):
        out, aux = jax.jit(
            lambda p, x: moe_ffn_apply(p, x, mesh=mesh))(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(aux), float(aux0), rtol=1e-5)


def test_moe_differentiable():
    d, ffn, E = 5, 7, 3
    params = moe_ffn_init(jax.random.PRNGKey(2), d, ffn, E)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, d)).astype(np.float32))

    def loss(p):
        out, aux = moe_ffn_apply(p, x)
        return jnp.sum(out ** 2) + 0.01 * aux

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda a: np.isfinite(np.asarray(a)).all(), g))
    assert all(flat)
    # gate gradient flows through the prob weighting
    assert float(jnp.abs(g["gate"]["w"]).sum()) > 0
