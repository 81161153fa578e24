"""Fused encoder-layer kernel (ops/fused_encoder.py) vs the unfused
nn/transformer layer: values and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raindrop_tpu.nn.transformer import (
    _layer_init, transformer_encoder_layer_apply)
from raindrop_tpu.ops.fused_encoder import fused_encoder_layer


def _setup(B=3, T=24, d=16, ffn=24, nhead=2, seed=0):
    k = jax.random.PRNGKey(seed)
    p = _layer_init(k, d, ffn)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    lengths = jnp.asarray([T, T - 5, 0][:B], jnp.int32)
    mask = jnp.arange(T)[None, :] >= lengths[:, None]
    return p, x, lengths, mask, nhead


def test_forward_matches_unfused():
    p, x, lengths, mask, nhead = _setup()
    want = transformer_encoder_layer_apply(p, x, mask, nhead,
                                           backend="dense")
    got = fused_encoder_layer(p, x, lengths, None, 0.0, None, nhead)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_matches_unfused_odd_t():
    # T not a multiple of 8 exercises the sublane padding path
    p, x, lengths, mask, nhead = _setup(B=2, T=13, d=8, ffn=12, nhead=1)
    want = transformer_encoder_layer_apply(p, x, mask, nhead,
                                           backend="dense")
    got = fused_encoder_layer(p, x, lengths, None, 0.0, None, nhead)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_unfused():
    p, x, lengths, mask, nhead = _setup()

    def loss_fused(p, x):
        o = fused_encoder_layer(p, x, lengths, None, 0.0, None, nhead)
        return jnp.sum(jnp.sin(o))

    def loss_ref(p, x):
        o = transformer_encoder_layer_apply(p, x, mask, nhead,
                                            backend="dense")
        return jnp.sum(jnp.sin(o))

    (lf, gf) = jax.value_and_grad(loss_fused, argnums=(0, 1))(p, x)
    (lr, gr) = jax.value_and_grad(loss_ref, argnums=(0, 1))(p, x)
    assert np.isclose(float(lf), float(lr), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=str(path))


def test_dropout_deterministic_and_calibrated():
    p, x, lengths, _, nhead = _setup(B=2, T=24, d=16)
    seed = jnp.asarray([7], jnp.int32)
    o1 = fused_encoder_layer(p, x, lengths, seed, 0.4, None, nhead)
    o2 = fused_encoder_layer(p, x, lengths, seed, 0.4, None, nhead)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = fused_encoder_layer(p, x, lengths, jnp.asarray([8], jnp.int32),
                             0.4, None, nhead)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))

    def loss(p):
        return jnp.sum(fused_encoder_layer(p, x, lengths, seed, 0.4,
                                           None, nhead) ** 2)

    g = jax.grad(loss)(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_operands_close_to_f32():
    p, x, lengths, _, nhead = _setup()
    f32 = fused_encoder_layer(p, x, lengths, None, 0.0, None, nhead)
    b16 = fused_encoder_layer(p, x, lengths, None, 0.0, "bfloat16", nhead)
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                               rtol=5e-2, atol=5e-2)


def test_model_auto_uses_fused_layer_equivalence():
    """The flagship forward with the fused layer enabled equals the dense
    backend forward (eval mode, f32 scores)."""
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init

    cfg = dataset_config("P19", max_len=16, nlayers=2,
                         attention_score_dtype="float32")
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T, F = 4, cfg.max_len, cfg.d_inp
    mask = (rng.uniform(size=(T, B, F)) > 0.6).astype(np.float32)
    src = jnp.asarray(np.concatenate(
        [rng.normal(size=(T, B, F)).astype(np.float32) * mask, mask], -1))
    times = jnp.asarray(np.cumsum(
        rng.uniform(0.1, 1.0, size=(T, B)), 0).astype(np.float32))
    st = jnp.asarray(rng.normal(size=(B, cfg.d_static)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)

    import dataclasses
    dense = raindrop_apply(
        params, dataclasses.replace(cfg, attention_backend="dense"),
        src, st, times, lengths)[0]
    fused = raindrop_apply(
        params, dataclasses.replace(cfg, attention_backend="fused_layer"),
        src, st, times, lengths)[0]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)
