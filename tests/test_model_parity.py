"""End-to-end Raindrop_v2 parity: the batched JAX model vs a literal
per-sample torch transcription of the reference forward (eval mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raindrop_tpu.config import dataset_config
from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init


def _inputs(cfg, B, rng_np):
    T, F = cfg.max_len, cfg.d_inp
    mask = (rng_np.uniform(size=(T, B, F)) > 0.5).astype(np.float32)
    vals = np.abs(rng_np.normal(size=(T, B, F))).astype(np.float32) * mask
    src = np.concatenate([vals, mask], axis=-1)
    times = np.zeros((T, B), np.float32)
    lengths = rng_np.integers(T // 2, T + 1, size=B).astype(np.int64)
    for b in range(B):
        times[: lengths[b], b] = np.sort(
            rng_np.uniform(0.1, 47.9, size=lengths[b]))
    static = rng_np.normal(size=(B, cfg.d_static)).astype(np.float32) \
        if cfg.static else None
    return src, static, times, lengths


@pytest.mark.parametrize("name,kw", [
    ("P19", dict(max_len=12)),
    ("PAM", dict(max_len=10)),
    ("P19", dict(max_len=8, sensor_wise_mask=True)),
])
def test_full_model_matches_torch_reference(rng_np, name, kw):
    torch = pytest.importorskip("torch")
    from tests.torch_raindrop import raindrop_v2_torch

    cfg = dataset_config(name, **kw)
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    src, static, times, lengths = _inputs(cfg, 4, rng_np)

    logits, dist = raindrop_apply(
        params, cfg, jnp.asarray(src),
        None if static is None else jnp.asarray(static),
        jnp.asarray(times), jnp.asarray(lengths))

    params_np = jax.tree_util.tree_map(np.asarray, params)
    exp_logits, exp_dist = raindrop_v2_torch(
        params_np, cfg, src, static, times, lengths)

    # measured max error at these dims is ~1e-7 abs / ~1e-5 rel; anything
    # past these bounds is a real semantic drift, not float noise
    np.testing.assert_allclose(np.asarray(logits), exp_logits,
                               rtol=1e-4, atol=1e-6)
    assert float(dist) == pytest.approx(exp_dist, rel=1e-4, abs=1e-6)
