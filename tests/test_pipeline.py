"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from raindrop_tpu.nn.transformer import (
    transformer_encoder_apply,
    transformer_encoder_init,
)
from raindrop_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_transformer_encoder,
    stack_stage_params,
)


def _pipe_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("pipe",))


def _affine_stages(S, d, seed=0):
    rng = np.random.default_rng(seed)
    return [{"w": jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) / d),
             "b": jnp.asarray(rng.normal(size=(d,)).astype(np.float32))}
            for _ in range(S)]


def _stage_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


@pytest.mark.parametrize("S,M", [(1, 3), (2, 1), (2, 4), (4, 8)])
def test_pipeline_apply_matches_sequential(S, M):
    d, mb = 6, 5
    stages = _affine_stages(S, d)
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(M, mb, d)).astype(np.float32))

    out = pipeline_apply(_pipe_mesh(S), _stage_fn, stack_stage_params(stages), xs)

    expect = xs
    for p in stages:
        expect = _stage_fn(p, expect)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_apply_differentiable():
    """The GPipe scan is reverse-mode differentiable — grads match the
    sequential program (pipeline training, not just inference)."""
    S, M, mb, d = 2, 3, 4, 5
    stages = _affine_stages(S, d, seed=2)
    stacked = stack_stage_params(stages)
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.normal(size=(M, mb, d)).astype(np.float32))
    mesh = _pipe_mesh(S)

    def loss_pipe(params):
        return jnp.sum(pipeline_apply(mesh, _stage_fn, params, xs) ** 2)

    def loss_seq(params):
        h = xs
        for i in range(S):
            h = _stage_fn(jax.tree.map(lambda a: a[i], params), h)
        return jnp.sum(h ** 2)

    gp = jax.grad(loss_pipe)(stacked)
    gs = jax.grad(loss_seq)(stacked)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), gp, gs)


@pytest.mark.parametrize("n_micro", [1, 4])
def test_pipeline_transformer_encoder_matches(n_micro):
    B, T, d, nhead, L = 8, 10, 12, 2, 2
    params = transformer_encoder_init(jax.random.PRNGKey(0), d, nhead, 2 * d, L)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, T, d)).astype(np.float32))
    lengths = rng.integers(3, T + 1, size=(B,))
    mask = jnp.asarray(np.arange(T)[None, :] >= lengths[:, None])

    expect = transformer_encoder_apply(params, x, mask, nhead, backend="dense")
    got = pipeline_transformer_encoder(
        _pipe_mesh(L), params, x, mask, nhead, n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_stage_count_mismatch_raises():
    params = transformer_encoder_init(jax.random.PRNGKey(0), 8, 2, 16, 2)
    x = jnp.zeros((4, 6, 8))
    with pytest.raises(ValueError, match="stage per layer"):
        pipeline_transformer_encoder(_pipe_mesh(4), params, x, None, 2, 2)
