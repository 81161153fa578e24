"""Baseline parity against the ACTUAL reference sources.

Like tests/test_reference_source_parity.py but for the baseline tier: the
unmodified reference `code/baselines/models.py` and `code/baselines/mTAND/
models.py` run on CPU (via tests/pyg_shim.py + tests/reference_source.py)
and are compared against raindrop_tpu's baselines with ported weights:

  * TransformerModel2 (models.py:127-216) vs baselines/transformer.py
  * SEFT (models.py:219-334, per-sample nonzero loop) vs baselines/seft.py
  * GRUD (models.py:337-655, diagonal decay-gated GRU) vs baselines/grud.py
  * enc_mtan_classif (mTAND/models.py:54-109) vs baselines/mtand.py
"""

from __future__ import annotations

import numpy as np
import torch

import jax
import jax.numpy as jnp

from raindrop_tpu.config import dataset_config
from tests import reference_source
from tests.reference_source import load_linear, load_torch_encoder


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float32)


def _inputs(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    T, F = cfg.max_len, cfg.d_inp
    obs = (rng.uniform(size=(T, B, F)) > 0.5).astype(np.float32)
    vals = rng.normal(size=(T, B, F)).astype(np.float32) * obs
    src = np.concatenate([vals, obs], axis=-1)
    lengths = rng.integers(T // 2, T + 1, size=(B,))
    tgrid = np.cumsum(rng.uniform(0.1, 1.0, size=(T, B)), 0).astype(np.float32)
    times = np.where(np.arange(T)[:, None] < lengths[None, :], tgrid, 0.0)
    static = rng.normal(size=(B, cfg.d_static)).astype(np.float32)
    return src, static, times, lengths


def test_transformer2_source_vs_jax():
    from raindrop_tpu.baselines.transformer import (
        transformer2_apply, transformer2_init)

    models = reference_source.load("models")
    cfg = dataset_config("P12", d_inp=8, d_static=5, max_len=12,
                         nhid=20, nhead=2, nlayers=2)
    params = transformer2_init(jax.random.PRNGKey(0), cfg)
    ref = models.TransformerModel2(
        d_inp=cfg.d_inp, d_model=cfg.d_inp, nhead=cfg.nhead, nhid=cfg.ffn_dim,
        nlayers=cfg.nlayers, dropout=cfg.dropout, max_len=cfg.max_len,
        d_static=cfg.d_static, MAX=cfg.MAX, perc=0.5, aggreg="mean",
        n_classes=cfg.n_classes, static=True)
    load_linear(ref.encoder, params["encoder"])
    load_linear(ref.emb, params["emb"])
    load_linear(ref.mlp[0], params["mlp"]["lin0"])
    load_linear(ref.mlp[2], params["mlp"]["lin1"])
    load_torch_encoder(ref.transformer_encoder, params["transformer_encoder"])
    ref.eval()

    src, static, times, lengths = _inputs(cfg, B=4)
    with torch.no_grad():
        expect = ref(_t(src), _t(static), _t(times), torch.tensor(lengths))
    got, _ = transformer2_apply(params, cfg, jnp.asarray(src),
                                jnp.asarray(static), jnp.asarray(times),
                                jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_seft_source_vs_jax():
    from raindrop_tpu.baselines.seft import seft_apply, seft_init

    models = reference_source.load("models")
    cfg = dataset_config("P12", d_inp=6, d_static=5, max_len=10, nhid=16,
                         nhead=1, nlayers=1)
    params = seft_init(jax.random.PRNGKey(1), cfg)
    ref = models.SEFT(
        d_inp=cfg.d_inp, d_model=cfg.d_inp, nhead=1, nhid=cfg.ffn_dim,
        nlayers=1, dropout=cfg.dropout, max_len=cfg.max_len,
        d_static=cfg.d_static, MAX=cfg.MAX, perc=0.5, aggreg="mean",
        n_classes=cfg.n_classes, static=True)
    load_linear(ref.linear_value, params["linear_value"])
    load_linear(ref.lin_map, params["lin_map"])
    load_linear(ref.emb, params["emb"])
    load_linear(ref.mlp[0], params["mlp"]["lin0"])
    load_linear(ref.mlp[2], params["mlp"]["lin1"])
    ref.eval()

    src, static, times, lengths = _inputs(cfg, B=5, seed=2)
    with torch.no_grad():
        expect = ref(_t(src), _t(static), _t(times), torch.tensor(lengths))
    got, _ = seft_apply(params, cfg, jnp.asarray(src), jnp.asarray(static),
                        jnp.asarray(times), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_grud_source_vs_jax():
    from raindrop_tpu.baselines.grud import grud_apply, grud_init

    models = reference_source.load("models")
    F, T = 7, 9
    rng = np.random.default_rng(3)
    x_mean = rng.normal(size=(F,)).astype(np.float32)
    params = grud_init(jax.random.PRNGKey(2), F, 2, x_mean=x_mean)

    ref = models.GRUD(input_size=F, hidden_size=F, output_size=2,
                      num_layers=T, x_mean=torch.tensor(x_mean), dropout=0.0)
    for ours, theirs in [
            ("w_dg_x", "weight_dg_x"), ("w_dg_h", "weight_dg_h"),
            ("w_xz", "weight_xz"), ("w_hz", "weight_hz"), ("w_mz", "weight_mz"),
            ("w_xr", "weight_xr"), ("w_hr", "weight_hr"), ("w_mr", "weight_mr"),
            ("w_xh", "weight_xh"), ("w_hh", "weight_hh"), ("w_mh", "weight_mh"),
            ("w_hy", "weight_hy"), ("b_dg_x", "bias_dg_x"),
            ("b_dg_h", "bias_dg_h"), ("b_z", "bias_z"), ("b_r", "bias_r"),
            ("b_h", "bias_h"), ("b_y", "bias_y")]:
        getattr(ref, theirs).data = _t(params[ours])
    ref.eval()

    mask = (rng.uniform(size=(F, T)) > 0.4).astype(np.float32)
    vals = rng.normal(size=(F, T)).astype(np.float32) * mask
    delta = rng.uniform(0.1, 2.0, size=(F, T)).astype(np.float32)

    with torch.no_grad():
        # reference consumes one sample as [3, F, T] and applies sigmoid for
        # P12 (models.py:652-654)
        expect = ref((_t(vals)[None], _t(mask)[None], _t(delta)[None]),
                     dataset_name="P12")
    got, _ = grud_apply(params,
                        jnp.asarray(vals.T[None]),   # ours: [B, T, F]
                        jnp.asarray(mask.T[None]),
                        jnp.asarray(delta.T[None]),
                        apply_sigmoid=True)
    np.testing.assert_allclose(np.asarray(got)[0], expect.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_mtand_source_vs_jax():
    from raindrop_tpu.baselines.mtand import mtand_apply, mtand_init

    mt = reference_source.load_mtand_models()
    B, T, F = 3, 11, 5
    nhidden, embed_time, n_ref = 8, 16, 32
    params = mtand_init(jax.random.PRNGKey(4), 2 * F, nhidden=nhidden,
                        embed_time=embed_time, num_heads=1, n_classes=2,
                        n_ref=n_ref)

    query = torch.linspace(0, 1.0, n_ref)
    ref = mt.enc_mtan_classif(input_dim=F, query=query, nhidden=nhidden,
                              embed_time=embed_time, num_heads=1,
                              learn_emb=True, n_classes=2)
    load_linear(ref.att.linears[0], params["att_q"])
    load_linear(ref.att.linears[1], params["att_k"])
    load_linear(ref.att.linears[2], params["att_out"])
    load_linear(ref.periodic, params["periodic"])
    load_linear(ref.linear, params["linear"])
    load_linear(ref.classifier[0], params["classifier"]["lin0"])
    load_linear(ref.classifier[2], params["classifier"]["lin1"])
    load_linear(ref.classifier[4], params["classifier"]["lin2"])
    ref.enc.weight_ih_l0.data = _t(params["gru"]["w_ih"])
    ref.enc.weight_hh_l0.data = _t(params["gru"]["w_hh"])
    ref.enc.bias_ih_l0.data = _t(params["gru"]["b_ih"])
    ref.enc.bias_hh_l0.data = _t(params["gru"]["b_hh"])
    ref.eval()

    rng = np.random.default_rng(5)
    obs = (rng.uniform(size=(B, T, F)) > 0.4).astype(np.float32)
    vals = rng.normal(size=(B, T, F)).astype(np.float32) * obs
    x = np.concatenate([vals, obs], axis=-1)
    times = np.sort(rng.uniform(0, 1, size=(B, T)), axis=1).astype(np.float32)

    with torch.no_grad():
        expect = ref(_t(x), _t(times))
    got, _ = mtand_apply(params, jnp.asarray(x), jnp.asarray(times))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(),
                               rtol=2e-5, atol=2e-5)
