"""Baseline parity against the ACTUAL reference sources.

Like tests/test_reference_source_parity.py but for the baseline tier: the
unmodified reference `code/baselines/models.py` and `code/baselines/mTAND/
models.py` run on CPU (via tests/pyg_shim.py + tests/reference_source.py)
and are compared against raindrop_tpu's baselines with ported weights:

  * TransformerModel2 (models.py:127-216) vs baselines/transformer.py
  * SEFT (models.py:219-334, per-sample nonzero loop) vs baselines/seft.py
  * GRUD (models.py:337-655, diagonal decay-gated GRU) vs baselines/grud.py
  * enc_mtan_classif (mTAND/models.py:54-109) vs baselines/mtand.py
  * MTGNN (models.py:836-979 + layer.py) vs baselines/mtgnn.py
  * DGM2_O (models.py:983-1462, euler ODE-RNN) vs baselines/dgm2.py
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


import pytest


@pytest.mark.parametrize("num_heads", [1, 2])
def test_mtand_source_vs_jax(num_heads):
    from raindrop_tpu.baselines.mtand import mtand_apply, mtand_init

    mt = reference_source.load_mtand_models()
    B, T, F = 3, 11, 5
    nhidden, embed_time, n_ref = 8, 16, 32
    params = mtand_init(jax.random.PRNGKey(4), 2 * F, nhidden=nhidden,
                        embed_time=embed_time, num_heads=num_heads,
                        n_classes=2, n_ref=n_ref)

    query = torch.linspace(0, 1.0, n_ref)
    ref = mt.enc_mtan_classif(input_dim=F, query=query, nhidden=nhidden,
                              embed_time=embed_time, num_heads=num_heads,
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
    got, _ = mtand_apply(params, jnp.asarray(x), jnp.asarray(times),
                         num_heads=num_heads)
    np.testing.assert_allclose(np.asarray(got), expect.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_mtgnn_source_vs_jax():
    from raindrop_tpu.baselines.mtgnn import mtgnn_apply, mtgnn_init

    models = reference_source.load("models")
    N, T, S, layers = 6, 20, 4, 2
    # subgraph_size == N so the reference's rand-noise topk tie-break
    # (layer.py:183-185) selects every edge on both sides
    params = mtgnn_init(jax.random.PRNGKey(5), N, T, 2, d_static=S,
                        layers=layers, subgraph_size=N, node_dim=T)
    ref = models.MTGNN(True, True, 2, N, torch.device("cpu"),
                       num_static_features=S, node_dim=T, subgraph_size=N,
                       dilation_exponential=2, conv_channels=16,
                       residual_channels=16, skip_channels=32,
                       end_channels=64, seq_length=T, in_dim=1, out_dim=1,
                       layers=layers, layer_norm_affline=False)

    gc = params["gc"]
    ref.gc.emb1.weight.data = _t(gc["emb1"])
    ref.gc.emb2.weight.data = _t(gc["emb2"])
    ref.gc.lin1.weight.data = _t(gc["lin1"]["w"][:, :, 0, 0])
    ref.gc.lin1.bias.data = _t(gc["lin1"]["b"])
    ref.gc.lin2.weight.data = _t(gc["lin2"]["w"][:, :, 0, 0])
    ref.gc.lin2.bias.data = _t(gc["lin2"]["b"])

    def load_conv(conv, p):
        conv.weight.data = _t(p["w"])
        conv.bias.data = _t(p["b"])

    load_conv(ref.start_conv, params["start_conv"])
    load_conv(ref.skip0, params["skip0"])
    load_conv(ref.skipE, params["skipE"])
    load_conv(ref.end_conv_1, params["end1"])
    load_conv(ref.end_conv_2, params["end2"])
    for i, lp in enumerate(params["layers"]):
        for j in range(4):
            load_conv(ref.filter_convs[i].tconv[j], lp["filter"][j])
            load_conv(ref.gate_convs[i].tconv[j], lp["gate"][j])
        load_conv(ref.skip_convs[i], lp["skip"])
        load_conv(ref.gconv1[i].mlp.mlp, lp["gconv1_mlp"])
        load_conv(ref.gconv2[i].mlp.mlp, lp["gconv2_mlp"])
    ref.mlp_2.weight.data = _t(params["mlp_out"]["w"])
    ref.mlp_2.bias.data = _t(params["mlp_out"]["b"])
    ref.eval()

    rng = np.random.default_rng(6)
    vals = rng.normal(size=(3, T, N)).astype(np.float32)
    static = rng.normal(size=(3, S)).astype(np.float32)

    with torch.no_grad():
        expect = ref(_t(vals).permute(0, 2, 1)[:, None], _t(static))
    got, _ = mtgnn_apply(params, jnp.asarray(vals), jnp.asarray(static))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_dgm2_source_vs_jax():
    from raindrop_tpu.baselines.dgm2 import dgm2_apply, dgm2_init

    models = reference_source.load("models")
    bl = reference_source.load("DGM2_baseline") if False else None  # noqa
    # build exactly as the driver does (DGM2_baseline.py:304-323) but on CPU
    import torch.nn as nn

    F_, T, S, L, C = 5, 8, 4, 10, 20
    params = dgm2_init(jax.random.PRNGKey(6), F_, T, 2, latent_dim=L,
                       cluster_num=C, d_static=S, ode_units=10)

    ode_net = nn.Sequential(nn.Linear(L, 10), nn.Tanh(), nn.Linear(10, L))
    rec_ode_func = models.ODEFunc(input_dim=L, latent_dim=L,
                                  ode_func_net=ode_net)
    solver = models.DiffeqSolver(L, rec_ode_func, "euler", L,
                                 odeint_rtol=1e-3, odeint_atol=1e-4)
    gru = models.GRU_unit_cluster(L, F_, n_units=10, use_mask=False,
                                  dropout=0.0)
    ref = models.DGM2_O(L, F_, C, solver, z0_dim=L, n_gru_units=10,
                        GRU_update=gru, use_mask=False, dropout=0.0,
                        use_static=True, num_time_steps_and_static=(T, S))

    load_linear(ode_net[0], params["ode_l1"])
    load_linear(ode_net[2], params["ode_l2"])
    load_linear(gru.update_gate[0], params["update_gate"])
    load_linear(gru.reset_gate[0], params["reset_gate"])
    load_linear(gru.new_state_net[0], params["new_state"])
    load_linear(ref.mlp, params["mlp"])
    ref.eval()

    rng = np.random.default_rng(7)
    data = rng.normal(size=(3, T, F_)).astype(np.float32)
    times = np.linspace(0.0, 1.0, T).astype(np.float32)
    static = rng.normal(size=(3, S)).astype(np.float32)

    with torch.no_grad():
        expect = ref(_t(data), torch.tensor(times), _t(static))
    got, _ = dgm2_apply(params, jnp.asarray(data), jnp.asarray(times),
                        jnp.asarray(static))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_imputation_source_vs_ours():
    """mean/forward/cubic-spline imputation vs the running reference
    (utils_phy12.py:175-287). Reference X_time is [N, T, 1] with 0 as the
    missing marker; functions mutate in place, so each gets a copy."""
    from raindrop_tpu.data import imputation as imp

    up = reference_source.load("utils_phy12")
    rng = np.random.default_rng(8)
    N, T, F_ = 6, 12, 4
    lengths = rng.integers(4, T + 1, size=N)
    times = np.zeros((N, T, 1), np.float32)
    for i in range(N):
        times[i, :lengths[i], 0] = np.sort(
            rng.uniform(0.1, 10, size=lengths[i]))
    X = rng.normal(2.0, 1.0, size=(N, T, F_)).astype(np.float32)
    X[rng.uniform(size=X.shape) < 0.4] = 0.0
    for i in range(N):          # zero everything past the observed window
        X[i, lengths[i]:] = 0.0
    mean_features = rng.normal(1.0, 0.5, size=(F_,)).astype(np.float32)

    ref_mean = up.mean_imputation(X.copy(), times.copy(), mean_features, 0)
    np.testing.assert_allclose(
        imp.mean_imputation(X, times[:, :, 0], mean_features), ref_mean,
        rtol=1e-6)

    ref_fwd = up.forward_imputation(X.copy(), times.copy(), 0)
    np.testing.assert_allclose(
        imp.forward_imputation(X, times[:, :, 0]), ref_fwd, rtol=1e-6)

    ref_cs = up.cubic_spline_imputation(X.copy(), times.copy(), 0)
    np.testing.assert_allclose(
        imp.cubic_spline_imputation(X, times[:, :, 0]), ref_cs,
        rtol=1e-5, atol=1e-5)


def test_knn_imputation_source_vs_ours():
    """kNN imputation vs the running reference (imputations.py:72-98). The
    reference discards fit_transform's return and relies on
    KNNImputer(copy=False) mutating X_features in place — identical values
    to using the returned array, which is what ours does."""
    from raindrop_tpu.data.imputation import knn_imputation

    imputations = reference_source.load("imputations")
    rng = np.random.default_rng(9)
    N, T, F_ = 12, 8, 3
    # the reference's time_length comprehension (imputations.py:80) indexes
    # np.where(times == 0)[0][0] and so CRASHES on a full-length sample —
    # keep every sample strictly shorter than T
    lengths = rng.integers(3, T, size=N)
    times = np.zeros((N, T, 1))
    for i in range(N):
        times[i, :lengths[i], 0] = np.sort(rng.uniform(0.1, 10, lengths[i]))
    X = rng.normal(2.0, 1.0, size=(N, T, F_))
    X[rng.uniform(size=X.shape) < 0.3] = 0.0
    for i in range(N):
        X[i, lengths[i]:] = 0.0

    ref = imputations.kNN_imputation(X.copy(), times.copy())
    ours = knn_imputation(X, times[:, :, 0])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
