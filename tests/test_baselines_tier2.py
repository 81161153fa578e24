"""Tier-2 baselines (MTGNN, DGM2, IP-Net): shape/jit/grad checks plus
oracle checks for the data-dependent math."""

import numpy as np
import jax
import jax.numpy as jnp

from raindrop_tpu.baselines.dgm2 import dgm2_apply, dgm2_init
from raindrop_tpu.baselines.ipnet import (
    ipnet_apply,
    ipnet_init,
    ipnet_reconstruction_loss,
)
from raindrop_tpu.baselines.mtgnn import (
    _graph,
    _layer_norm_3d,
    _mixprop,
    mtgnn_apply,
    mtgnn_init,
)


def test_mtgnn_forward_and_grad(rng_np):
    N, T, B = 8, 64, 3
    params = mtgnn_init(jax.random.PRNGKey(0), N, T, 2, d_static=4, layers=3)
    vals = jnp.asarray(rng_np.normal(size=(B, T, N)).astype(np.float32))
    static = jnp.asarray(rng_np.normal(size=(B, 4)).astype(np.float32))
    logits, _ = jax.jit(lambda p: mtgnn_apply(p, vals, static))(params)
    assert logits.shape == (B, 2)
    g = jax.grad(lambda p: jnp.sum(mtgnn_apply(p, vals, static,
                                               train=True,
                                               rng=jax.random.PRNGKey(1))[0] ** 2)
                 )({k: v for k, v in params.items() if k != "_meta"}
                   | {"_meta": params["_meta"]})
    assert np.all(np.isfinite(np.asarray(g["gc"]["emb1"])))


def test_mtgnn_short_sequence_pads(rng_np):
    """T < receptive field must left-pad (reference models.py:933-934)."""
    N, T, B = 6, 20, 2
    params = mtgnn_init(jax.random.PRNGKey(0), N, T, 8, layers=3)
    vals = jnp.asarray(rng_np.normal(size=(B, T, N)).astype(np.float32))
    logits, _ = mtgnn_apply(params, vals, None)
    assert logits.shape == (B, 8)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_mtgnn_topk_sparsity():
    params = mtgnn_init(jax.random.PRNGKey(3), 10, 32, 2, subgraph_size=3)
    adj = np.asarray(_graph(params, params["_meta"]))
    assert adj.shape == (10, 10)
    assert np.all((adj > 0).sum(axis=1) <= 3)     # per-row top-k


def test_mixprop_oracle(rng_np):
    """mixprop vs an explicit loop of layer.py:64-76."""
    B, C, N, T, gdep, alpha = 2, 4, 5, 6, 2, 0.05
    x = rng_np.normal(size=(B, C, N, T)).astype(np.float32)
    adj = np.abs(rng_np.normal(size=(N, N))).astype(np.float32)
    mlp = {"w": rng_np.normal(size=(3, (gdep + 1) * C, 1, 1)).astype(np.float32),
           "b": np.zeros(3, np.float32)}
    got = np.asarray(_mixprop(
        {k: jnp.asarray(v) for k, v in mlp.items()},
        jnp.asarray(x), jnp.asarray(adj), gdep, alpha))

    A = adj + np.eye(N, dtype=np.float32)
    A = A / A.sum(1, keepdims=True)
    h, outs = x, [x]
    for _ in range(gdep):
        h = alpha * x + (1 - alpha) * np.einsum("ncwl,vw->ncvl", h, A)
        outs.append(h)
    cat = np.concatenate(outs, axis=1)
    expect = np.einsum("ncwl,oc->nowl", cat, mlp["w"][:, :, 0, 0]) \
        + mlp["b"][None, :, None, None]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_dgm2_forward_and_grad(rng_np):
    B, T, F = 3, 12, 7
    params = dgm2_init(jax.random.PRNGKey(0), F, T, 2, d_static=5)
    data = jnp.asarray(rng_np.normal(size=(B, T, F)).astype(np.float32))
    times = jnp.asarray(np.linspace(0, T, T).astype(np.float32))
    static = jnp.asarray(rng_np.normal(size=(B, 5)).astype(np.float32))
    logits, latent_ys = jax.jit(
        lambda p: dgm2_apply(p, data, times, static))(params)
    assert logits.shape == (B, 2)
    assert latent_ys.shape == (B, T, 20)
    np.testing.assert_allclose(np.asarray(latent_ys.sum(-1)), 1.0, atol=1e-5)
    g = jax.grad(lambda p: jnp.sum(dgm2_apply(p, data, times, static)[0] ** 2))(
        params)
    assert np.all(np.isfinite(np.asarray(g["ode_l1"]["w"])))


def test_ipnet_forward_and_reconstruction(rng_np):
    B, F, T = 3, 5, 24
    vals = rng_np.normal(size=(B, F, T)).astype(np.float32)
    mask = (rng_np.uniform(size=(B, F, T)) > 0.4).astype(np.float32)
    tstamp = np.sort(rng_np.uniform(0, 48, size=(B, F, T)), axis=2).astype(np.float32)
    holdout = mask * (rng_np.uniform(size=(B, F, T)) < 0.2)
    x = jnp.asarray(np.concatenate([vals * mask, mask, tstamp, holdout], axis=1))
    params = ipnet_init(jax.random.PRNGKey(0), F, ref_points=16)
    logits, reconst = jax.jit(lambda p: ipnet_apply(p, x))(params)
    assert logits.shape == (B, 2)
    assert reconst.shape == (B, 2 * F, T)
    stds = jnp.ones((F,))
    loss = ipnet_reconstruction_loss(x, reconst, stds)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: jnp.sum(ipnet_apply(p, x)[0] ** 2)
                 + ipnet_reconstruction_loss(x, ipnet_apply(p, x)[1], stds))(params)
    assert np.all(np.isfinite(np.asarray(g["sci_kernel"])))
    assert np.all(np.isfinite(np.asarray(g["cci_w"])))


def test_ipnet_interpolation_recovers_constant(rng_np):
    """A constant channel must interpolate to (approximately) that constant
    wherever any observation exists."""
    B, F, T = 1, 2, 16
    vals = np.full((B, F, T), 3.0, np.float32)
    mask = np.ones((B, F, T), np.float32)
    tstamp = np.broadcast_to(np.linspace(0, 48, T, dtype=np.float32), (B, F, T)).copy()
    x = jnp.asarray(np.concatenate([vals, mask, tstamp, np.zeros_like(mask)], 1))
    params = ipnet_init(jax.random.PRNGKey(0), F, ref_points=8)
    from raindrop_tpu.baselines.ipnet import _single_channel_interp
    rep = np.asarray(_single_channel_interp(params, x))
    np.testing.assert_allclose(rep[:, :F], 3.0, atol=1e-4)
