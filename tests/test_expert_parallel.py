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


def test_transformer_moe_baseline_learns():
    """The MoE transformer trains end-to-end under the Trainer with the
    load-balance aux in the loss."""
    from raindrop_tpu.config import TrainConfig, dataset_config
    from raindrop_tpu.data import synthetic_split
    from raindrop_tpu.train import Trainer
    from raindrop_tpu.baselines.adapters import make_baseline

    cfg = dataset_config("PAM", max_len=16, nlayers=1, nhead=1)
    tcfg = TrainConfig(dataset="PAM", num_epochs=3, learning_rate=1e-3,
                       batch_size=32, batching_strategy=3,
                       n_batches_strategy3=8, seed=0, aux_loss_weight=0.01)
    split = synthetic_split("PAM", n=160, seed=0, T=16)
    init_fn, apply_fn = make_baseline("transformer_moe", cfg)
    res = Trainer(cfg, tcfg, init_fn=init_fn,
                  apply_fn=apply_fn).train_split(split, verbose=False)
    assert res.test_metrics["auroc"] > 0.6
    assert len(res.history) == 3


def test_transformer_moe_mesh_matches_single():
    """Expert-sharded execution over the mesh matches unsharded eval."""
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.baselines.transformer_moe import (
        transformer_moe_apply, transformer_moe_init)
    from raindrop_tpu.parallel.mesh import make_mesh

    cfg = dataset_config("P19", max_len=8, nlayers=1, nhead=1)
    params = transformer_moe_init(jax.random.PRNGKey(0), cfg, n_experts=4)
    rng = np.random.default_rng(0)
    T, B, F = cfg.max_len, 8, cfg.d_inp
    src = jnp.asarray(rng.normal(size=(T, B, 2 * F)).astype(np.float32))
    times = jnp.asarray(np.cumsum(
        rng.uniform(0.1, 1.0, size=(T, B)), 0).astype(np.float32))
    static = jnp.asarray(rng.normal(size=(B, cfg.d_static)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)

    expect, aux0 = transformer_moe_apply(params, cfg, src, static, times, lengths)

    mesh = make_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        got, aux = jax.jit(
            lambda p: transformer_moe_apply(p, cfg, src, static, times,
                                            lengths, mesh=mesh))(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(aux), float(aux0), rtol=1e-5)
