"""Mixed precision: compute_dtype='bfloat16' must keep master params,
gradients and logits in float32 while computing the forward in bf16
(RaindropConfig.compute_dtype; the reference is f32-only)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from raindrop_tpu.config import dataset_config
from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init


def _inputs(cfg, B=8, seed=0):
    T, F = cfg.max_len, cfg.d_inp
    rng = np.random.default_rng(seed)
    mask = (rng.uniform(size=(T, B, F)) > 0.6).astype(np.float32)
    src = jnp.asarray(np.concatenate(
        [rng.normal(size=(T, B, F)).astype(np.float32) * mask, mask], -1))
    times = jnp.asarray(
        np.cumsum(rng.uniform(0.1, 1.0, size=(T, B)), 0).astype(np.float32))
    static = jnp.asarray(rng.normal(size=(B, cfg.d_static)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    y = jnp.asarray(rng.integers(0, cfg.n_classes, size=(B,)))
    return src, static, times, lengths, y


def test_bf16_forward_close_to_f32_and_dtypes_preserved():
    cfg32 = dataset_config("P19", max_len=16)
    cfg16 = dataset_config("P19", max_len=16, compute_dtype="bfloat16")
    params = raindrop_init(jax.random.PRNGKey(0), cfg32)
    src, static, times, lengths, y = _inputs(cfg32)

    logits32, _ = raindrop_apply(params, cfg32, src, static, times, lengths)
    logits16, dist16 = raindrop_apply(params, cfg16, src, static, times, lengths)

    assert logits16.dtype == jnp.float32       # cast back for loss/metrics
    assert dist16.dtype == jnp.float32
    # bf16 has ~3 decimal digits; agreement is loose but must track
    np.testing.assert_allclose(np.asarray(logits16), np.asarray(logits32),
                               rtol=0.15, atol=0.05)
    # ranking should almost always survive the precision drop
    agree = np.mean(np.argmax(np.asarray(logits16), -1)
                    == np.argmax(np.asarray(logits32), -1))
    assert agree >= 0.9


def test_bf16_gradients_are_f32_and_finite():
    cfg = dataset_config("P19", max_len=16, compute_dtype="bfloat16")
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    src, static, times, lengths, y = _inputs(cfg)

    def loss_fn(p):
        logits, _ = raindrop_apply(p, cfg, src, static, times, lengths,
                                   train=True, rng=jax.random.PRNGKey(1))
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert loss.dtype == jnp.float32
    for g, p in zip(jax.tree.leaves(grads), jax.tree.leaves(params)):
        assert g.dtype == p.dtype              # master-weight dtype (f32)
        assert np.isfinite(np.asarray(g)).all()
