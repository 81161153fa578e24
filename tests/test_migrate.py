"""Torch-checkpoint migration (raindrop_tpu/migrate.py) against the
reference's SHIPPED TRAINED artifacts.

These are the strongest parity oracles available in this image: the
reference repo ships genuinely trained torch models
(code/baselines/saved/grud_model_best.pt, saved/grud_mean_grud_para.pt,
mTAND/best_model_val_aupr.pt, saved/best_model.pt) which its own drivers
load for evaluation (GRU-D_baseline.py:421, mTAND_baseline.py:176). Every
test here imports the trained weights through migrate.py and asserts our
forward matches the torch model's forward ON THOSE WEIGHTS — not random
init."""

import contextlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from raindrop_tpu import migrate
from tests import reference_source

GRUD_PT = "/root/reference/code/baselines/saved/grud_model_best.pt"
GRUD_MEAN_PT = "/root/reference/code/baselines/saved/grud_mean_grud_para.pt"
MTAND_PT = "/root/reference/code/baselines/mTAND/best_model_val_aupr.pt"
TRANS_PT = "/root/reference/code/baselines/saved/best_model.pt"


@contextlib.contextmanager
def _pickle_models(module):
    """Route the pickles' `models.<Class>` lookups at the given reference
    module (baselines/models.py vs mTAND/models.py both pickle as
    'models')."""
    saved = sys.modules.get("models")
    sys.modules["models"] = module
    try:
        yield
    finally:
        if saved is None:
            sys.modules.pop("models", None)
        else:
            sys.modules["models"] = saved


def test_grud_shipped_artifact_forward_parity():
    """grud_model_best.pt (trained, full-module pickle): our GRU-D forward
    on the imported weights matches the torch model's own forward."""
    from raindrop_tpu.baselines.grud import grud_apply

    sd = migrate.load_torch_artifact(GRUD_PT)
    params = migrate.import_grud(sd)
    F = params["w_xz"].shape[0]
    assert F == 33 and params["w_hy"].shape == (1, F)
    assert "x_mean" in sd  # hoovered non-state_dict attribute

    models = reference_source.load("models")
    with _pickle_models(models):
        ref = torch.load(GRUD_PT, map_location="cpu", weights_only=False)
    ref.eval()

    # the trained module steps its pickled num_layers (=49, the GRU-D
    # tensorization's hourly step count) through the input's time axis
    T = ref.num_layers
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(F, T)) > 0.4).astype(np.float32)
    vals = rng.normal(size=(F, T)).astype(np.float32) * mask
    delta = rng.uniform(0.1, 2.0, size=(F, T)).astype(np.float32)
    t = lambda a: torch.tensor(a)[None]  # noqa: E731

    with torch.no_grad():
        expect = ref((t(vals), t(mask), t(delta)), dataset_name="P12")
    got, _ = grud_apply(params,
                        jnp.asarray(vals.T[None]),
                        jnp.asarray(mask.T[None]),
                        jnp.asarray(delta.T[None]),
                        apply_sigmoid=True)
    np.testing.assert_allclose(np.asarray(got)[0], expect.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_grud_raw_param_dict_import():
    """grud_mean_grud_para.pt is a bare tensor dict (no module wrapper):
    the importer maps it and defaults x_mean to zeros."""
    params = migrate.import_params("grud", GRUD_MEAN_PT)
    F = params["w_xz"].shape[0]
    assert F == 33
    assert params["x_mean"].shape == (F,)
    np.testing.assert_array_equal(params["x_mean"], np.zeros(F, np.float32))
    # the imported tree slots straight into grud_apply
    from raindrop_tpu.baselines.grud import grud_apply
    out, _ = grud_apply(params, jnp.zeros((2, 3, F)), jnp.zeros((2, 3, F)),
                        jnp.zeros((2, 3, F)))
    assert np.isfinite(np.asarray(out)).all()


def test_mtand_shipped_artifact_forward_parity():
    """best_model_val_aupr.pt (trained P12 enc_mtan_classif, saved at best
    val AUPRC): our mTAND forward on the imported weights matches the
    trained torch model's forward."""
    from raindrop_tpu.baselines.mtand import mtand_apply

    params = migrate.import_params("mtand", MTAND_PT)
    assert params["att_out"]["w"].shape == (128, 82)     # nhidden, 2*41
    assert params["query_points"].shape == (128,)        # hoovered query

    mtand_models = reference_source.load_mtand_models()
    with _pickle_models(mtand_models):
        ref = torch.load(MTAND_PT, map_location="cpu", weights_only=False)
    ref.device = "cpu"        # pickled attribute says 'cuda'
    ref.eval()

    B, T, dim = 4, 20, 41
    rng = np.random.default_rng(1)
    mask = (rng.uniform(size=(B, T, dim)) > 0.6).astype(np.float32)
    vals = rng.normal(size=(B, T, dim)).astype(np.float32) * mask
    tt = np.sort(rng.uniform(0, 1, size=(B, T)).astype(np.float32), axis=1)
    x = np.concatenate([vals, mask], axis=2)

    with torch.no_grad():
        expect = ref(torch.tensor(x), torch.tensor(tt))
    got, _ = mtand_apply(params, jnp.asarray(x), jnp.asarray(tt),
                         num_heads=1)
    np.testing.assert_allclose(np.asarray(got), expect.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_best_model_encoder_layer_forward_parity():
    """best_model.pt pickles an UNPUBLISHED class (Transformer_P12) — the
    stub loader still recovers the full parameter tree, and its trained
    TransformerEncoderLayer (a standard torch module) pins our
    nn/transformer layer forward on trained weights."""
    from raindrop_tpu.nn.transformer import transformer_encoder_layer_apply

    sd = migrate.load_torch_artifact(TRANS_PT)
    assert "encoder_layer.self_attn.in_proj_weight" in sd
    lp = migrate.import_params("encoder_layer", TRANS_PT)
    d = lp["in_proj_w"].shape[1]
    assert d == 64 and lp["lin1"]["w"].shape == (64, 64)

    with migrate._stub_pickle_modules():
        full = torch.load(TRANS_PT, map_location="cpu", weights_only=False)
    nhead = full.encoder_layer.self_attn.num_heads
    # the artifact predates several torch forward-path attributes; rebuild
    # a current-torch layer around the trained weights for the oracle
    layer = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=nhead, dim_feedforward=lp["lin1"]["w"].shape[0],
        dropout=0.0)
    layer.load_state_dict({k: torch.tensor(np.asarray(v, np.float32))
                           for k, v in full.encoder_layer.state_dict()
                           .items()})
    layer = layer.eval()

    B, T = 3, 11
    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, T, d)).astype(np.float32)
    with torch.no_grad():
        expect = layer(torch.tensor(x).transpose(0, 1))  # torch: [T, B, d]
    got = transformer_encoder_layer_apply(lp, jnp.asarray(x), None, nhead)
    np.testing.assert_allclose(np.asarray(got),
                               expect.transpose(0, 1).numpy(),
                               rtol=2e-5, atol=2e-5)


def test_raindrop_import_roundtrip(tmp_path):
    """Reference Raindrop_v2 checkpoint -> import_raindrop reproduces the
    exact parameter tree (full-circle with the jax->torch porting the
    source-parity tests already trust)."""
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.models.raindrop import raindrop_init
    from tests.test_reference_source_parity import (
        _port_raindrop_to_reference)

    models_rd = reference_source.load("models_rd")
    cfg = dataset_config("P19", max_len=12, nlayers=2)
    params = raindrop_init(jax.random.PRNGKey(3), cfg)
    model = models_rd.Raindrop_v2(
        d_inp=cfg.d_inp, d_model=cfg.d_model, nhead=cfg.nhead,
        nhid=cfg.ffn_dim, nlayers=cfg.nlayers, dropout=cfg.dropout,
        max_len=cfg.max_len, d_static=cfg.d_static, n_classes=cfg.n_classes,
        global_structure=torch.ones(cfg.d_inp, cfg.d_inp), static=cfg.static)
    _port_raindrop_to_reference(model, params, cfg)
    path = str(tmp_path / "raindrop_ckpt.pt")
    torch.save(model.state_dict(), path)

    imported = migrate.import_params("raindrop", path)
    flat_ours = jax.tree_util.tree_leaves_with_path(params)
    flat_imp = dict(jax.tree_util.tree_leaves_with_path(imported))
    assert set(map(str, flat_imp)) == set(
        str(p) for p, _ in flat_ours)
    for p, leaf in flat_ours:
        np.testing.assert_allclose(np.asarray(flat_imp[p]),
                                   np.asarray(leaf), rtol=1e-6, atol=1e-6,
                                   err_msg=str(p))


def test_migrate_cli(tmp_path):
    """`python -m raindrop_tpu.migrate` writes a checkpoint loadable by
    train/checkpoint.load_checkpoint into the matching init template."""
    from raindrop_tpu.baselines.grud import grud_init
    from raindrop_tpu.train.checkpoint import load_checkpoint

    out = str(tmp_path / "grud_imported")
    migrate.main(["--model", "grud", "--torch", GRUD_PT, "--out", out])
    template = grud_init(jax.random.PRNGKey(0), 33, 1)
    params, _, meta = load_checkpoint(out, template)
    assert meta["model"] == "grud"
    expect = migrate.import_params("grud", GRUD_PT)
    for k in expect:
        np.testing.assert_allclose(np.asarray(params[k]),
                                   np.asarray(expect[k]), err_msg=k)
