"""Baseline models: oracle checks for the data-dependent parts, jit/grad
smoke, and a learn-on-synthetic check through the shared Trainer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.baselines.grud import build_delta, grud_apply, grud_init
from raindrop_tpu.baselines.seft import seft_apply, seft_init
from raindrop_tpu.baselines.transformer import transformer2_apply, transformer2_init
from raindrop_tpu.baselines.mtand import mtand_apply, mtand_init


def test_build_delta_matches_reference_recurrence(rng_np):
    """Oracle: the GRU-D delta recurrence (GRU-D_data_preparation.py:142-148)
    as an explicit loop."""
    B, T, F = 3, 10, 4
    mask = (rng_np.uniform(size=(B, T, F)) > 0.5).astype(np.float32)
    times = np.cumsum(rng_np.uniform(0.5, 2.0, size=(B, T)), axis=1).astype(np.float32)
    got = np.asarray(build_delta(jnp.asarray(mask), jnp.asarray(times)))

    expect = np.zeros((B, T, F), np.float32)
    for b in range(B):
        for t in range(1, T):
            gap = times[b, t] - times[b, t - 1]
            for f in range(F):
                expect[b, t, f] = gap + (1 - mask[b, t - 1, f]) * expect[b, t - 1, f]
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_grud_forward_shapes_and_grad(rng_np):
    B, T, F = 4, 12, 6
    params = grud_init(jax.random.PRNGKey(0), F, 2,
                       x_mean=rng_np.normal(size=F).astype(np.float32))
    x = jnp.asarray(rng_np.normal(size=(B, T, F)).astype(np.float32))
    mask = jnp.asarray((rng_np.uniform(size=(B, T, F)) > 0.5).astype(np.float32))
    delta = jnp.asarray(rng_np.uniform(size=(B, T, F)).astype(np.float32))
    out, h = jax.jit(lambda p: grud_apply(p, x, mask, delta))(params)
    assert out.shape == (B, 2) and h.shape == (B, F)
    g = jax.grad(lambda p: jnp.sum(grud_apply(p, x, mask, delta)[0] ** 2))(params)
    assert np.all(np.isfinite(np.asarray(g["w_dg_x"])))
    # sigmoid head for binary
    out_s, _ = grud_apply(params, x, mask, delta, apply_sigmoid=True)
    assert np.all((np.asarray(out_s) > 0) & (np.asarray(out_s) < 1))


def _toy_batch(cfg, B, rng_np):
    T, F = cfg.max_len, cfg.d_inp
    mask = (rng_np.uniform(size=(T, B, F)) > 0.5).astype(np.float32)
    src = jnp.asarray(np.concatenate(
        [rng_np.normal(size=(T, B, F)).astype(np.float32) * mask, mask], -1))
    times = jnp.asarray(np.cumsum(
        rng_np.uniform(0.1, 1.0, size=(T, B)), 0).astype(np.float32))
    static = (jnp.asarray(rng_np.normal(size=(B, cfg.d_static)).astype(np.float32))
              if cfg.static else None)
    lengths = jnp.full((B,), T, jnp.int32)
    return src, static, times, lengths


def test_transformer2_forward_and_grad(rng_np):
    cfg = dataset_config("P19", max_len=12, nlayers=1, nhead=1)
    params = transformer2_init(jax.random.PRNGKey(0), cfg)
    src, static, times, lengths = _toy_batch(cfg, 5, rng_np)
    logits, _ = jax.jit(
        lambda p: transformer2_apply(p, cfg, src, static, times, lengths))(params)
    assert logits.shape == (5, 2)
    g = jax.grad(lambda p: jnp.sum(transformer2_apply(
        p, cfg, src, static, times, lengths, train=True,
        rng=jax.random.PRNGKey(1))[0] ** 2))(params)
    assert np.all(np.isfinite(np.asarray(g["encoder"]["w"])))
    # max aggregation path
    cfg_max = dataset_config("P19", max_len=12, nlayers=1, nhead=1, aggreg="max")
    logits_max, _ = transformer2_apply(
        transformer2_init(jax.random.PRNGKey(0), cfg_max),
        cfg_max, src, static, times, lengths)
    assert logits_max.shape == (5, 2)


def test_seft_set_mean_matches_loop_oracle(rng_np):
    """The vectorized masked set-mean must equal the reference's per-sample
    nonzero-extraction loop (models.py:296-323)."""
    cfg = dataset_config("P12", max_len=8)
    params = seft_init(jax.random.PRNGKey(0), cfg)
    B = 3
    src, static, times, lengths = _toy_batch(cfg, B, rng_np)
    logits, _ = jax.jit(
        lambda p: seft_apply(p, cfg, src, static, times, lengths))(params)
    assert logits.shape == (B, 2)

    # loop oracle for the set representation of sample 0
    from raindrop_tpu.ops.pe import time_positional_encoding
    from raindrop_tpu.nn.linear import linear_apply
    vals = np.asarray(src[:, :, :cfg.d_inp].transpose(1, 0, 2))  # [B, T, F]
    tms = np.asarray(times)
    units = []
    for (t, f) in zip(*np.nonzero(vals[0])):
        pe_t = np.asarray(time_positional_encoding(
            jnp.full((1, 1), tms[t, 0]), cfg.d_pe, cfg.max_len))[0, 0]
        pe_s = np.asarray(time_positional_encoding(
            jnp.full((1, 1), float(f)), 16, cfg.max_len))[0, 0]
        v_emb = np.asarray(linear_apply(
            params["linear_value"], jnp.asarray([vals[0, t, f]])))
        units.append(np.concatenate([pe_t, v_emb, pe_s]))
    set_mean = np.mean(np.stack(units), axis=0)
    rep = np.concatenate([set_mean, set_mean])
    expect = np.asarray(linear_apply(params["lin_map"], jnp.asarray(rep)))

    got_out = np.asarray(linear_apply(
        params["lin_map"],
        _seft_rep(params, cfg, src, times)[0]))
    np.testing.assert_allclose(got_out, expect, rtol=1e-4, atol=1e-5)


def _seft_rep(params, cfg, src, times):
    """Expose the internal set representation for the oracle test."""
    from raindrop_tpu.ops.pe import time_positional_encoding
    from raindrop_tpu.nn.linear import linear_apply
    T, B, _ = src.shape
    F = cfg.d_inp
    values = src[:, :, :F].transpose(1, 0, 2)
    obs = (values != 0).astype(values.dtype)
    pe_t = time_positional_encoding(times, cfg.d_pe, cfg.max_len).transpose(1, 0, 2)
    pe_t = jnp.broadcast_to(pe_t[:, :, None, :], (B, T, F, cfg.d_pe))
    sensor_ids = jnp.arange(F, dtype=values.dtype)
    pe_s = time_positional_encoding(
        jnp.broadcast_to(sensor_ids[:, None], (F, 1)), 16, cfg.max_len)[:, 0]
    pe_s = jnp.broadcast_to(pe_s[None, None], (B, T, F, 16))
    val_emb = linear_apply(params["linear_value"], values[..., None])
    unit = jnp.concatenate([pe_t, val_emb, pe_s], axis=-1)
    denom = jnp.maximum(jnp.sum(obs, axis=(1, 2)), 1.0)[:, None]
    sm = jnp.sum(unit * obs[..., None], axis=(1, 2)) / denom
    return jnp.concatenate([sm, sm], axis=-1)


def test_mtand_forward_and_grad(rng_np):
    B, T, F = 4, 20, 6
    params = mtand_init(jax.random.PRNGKey(0), 2 * F, nhidden=16,
                        embed_time=16, n_classes=2, n_ref=32)
    mask = (rng_np.uniform(size=(B, T, F)) > 0.5).astype(np.float32)
    x = jnp.asarray(np.concatenate(
        [rng_np.normal(size=(B, T, F)).astype(np.float32) * mask, mask], -1))
    times = jnp.asarray(np.sort(rng_np.uniform(size=(B, T)), axis=1).astype(np.float32))
    logits, _ = jax.jit(lambda p: mtand_apply(p, x, times))(params)
    assert logits.shape == (B, 2)
    g = jax.grad(lambda p: jnp.sum(mtand_apply(p, x, times)[0] ** 2))(params)
    assert np.all(np.isfinite(np.asarray(g["att_q"]["w"])))


def test_transformer2_learns_via_trainer():
    from raindrop_tpu.data import synthetic_split
    from raindrop_tpu.train import Trainer
    cfg = dataset_config("PAM", max_len=16, nlayers=1, nhead=1)
    tcfg = TrainConfig(dataset="PAM", num_epochs=3, learning_rate=1e-3,
                       batch_size=32, batching_strategy=3, n_batches_strategy3=8)
    split = synthetic_split("PAM", n=160, seed=0, T=16)
    trainer = Trainer(
        cfg, tcfg,
        apply_fn=lambda p, src, static, times, lengths, train, rng:
            transformer2_apply(p, cfg, src, static, times, lengths,
                               train=train, rng=rng),
        init_fn=lambda key: transformer2_init(key, cfg))
    res = trainer.train_split(split, verbose=False)
    assert res.test_metrics["auroc"] > 0.6
