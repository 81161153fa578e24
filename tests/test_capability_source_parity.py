"""FULL-MODEL source parity for the capability paths at real P19 dims.

The shipped reference driver runs Raindrop_v2 with `use_beta=False,
sensor_wise_mask=False` (code/Raindrop.py:103, code/models_rd.py:317); the
paper's edge-pruning (β) and sensor-level-masking capabilities are dormant
switches. test_reference_source_parity.py proves end-to-end parity for the
shipped config; THIS file proves it for the dormant capability paths,
end-to-end at full P19 dimensioning, against the reference's own source:

  * use_beta=True: the reference hard-codes `use_beta = False` as a local
    literal inside forward (code/models_rd.py:317), so the flag cannot be
    reached through any constructor/argument. The oracle here is the
    reference source text with THAT ONE LITERAL flipped — the substitution
    is asserted to be unique, everything else (the per-sample loop, the β
    attention + top-50% pruning in code/Ob_propagation.py:161-185, the
    layer-1→layer-2 pruned-edge handoff) is byte-identical upstream code.
  * sensor_wise_mask=True: reachable via the constructor, but the reference
    sizes mlp_static at d_model+d_pe(+d_inp) while the sensor-wise pooled
    embedding is d_inp*(d_ob+d_pe)(+d_inp) wide — a latent shape crash
    (DEVIATIONS.md #1). The test ports every weight that exists in both and
    replaces the reference's unusably-sized head with one matching ours, so
    everything through pooling is source-vs-ours and the head is
    weight-identical by construction.
"""

from __future__ import annotations

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from raindrop_tpu.config import dataset_config
from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init
from tests import reference_source
from tests.test_reference_source_parity import (
    _port_raindrop_to_reference,
    _t,
)

MODELS_RD_PATH = "/root/reference/code/models_rd.py"


def _load_models_rd_use_beta():
    """models_rd with ONLY the forward's `use_beta = False` literal flipped.

    The substitution target must occur exactly once — if upstream ever
    changes, this fails loudly instead of silently testing something else.
    """
    with open(MODELS_RD_PATH, "r", encoding="utf-8") as f:
        src = f.read()
    assert src.count("use_beta = False") == 1, (
        "models_rd.py no longer has the single use_beta literal this "
        "oracle flips — re-audit code/models_rd.py:317")
    patched = src.replace("use_beta = False", "use_beta = True")
    reference_source._patch_environment()
    mod = types.ModuleType("models_rd_use_beta")
    mod.__file__ = MODELS_RD_PATH + " (use_beta literal flipped)"
    exec(compile(patched, mod.__file__, "exec"), mod.__dict__)
    return mod


def _inputs(cfg, B, seed=7):
    rng = np.random.default_rng(seed)
    T, F_ = cfg.max_len, cfg.d_inp
    lengths = rng.integers(T // 2, T + 1, size=(B,))
    tgrid = np.cumsum(rng.uniform(0.1, 1.0, size=(T, B)), 0).astype(np.float32)
    times = np.where(np.arange(T)[:, None] < lengths[None, :], tgrid, 0.0)
    obs = (rng.uniform(size=(T, B, F_)) > 0.6).astype(np.float32)
    obs *= (times > 0)[:, :, None]
    vals = rng.normal(size=(T, B, F_)).astype(np.float32) * obs
    src = np.concatenate([vals, obs], axis=-1).astype(np.float32)
    static = rng.normal(size=(B, cfg.d_static)).astype(np.float32)
    return src, static, times, lengths


def test_raindrop_v2_use_beta_full_forward_vs_source():
    """End-to-end eval forward with the β/edge-pruning path active, full
    P19 dims (F=34 -> 1156 edges, top-578 kept per sample per layer 1)."""
    cfg = dataset_config("P19", use_beta=True)
    B, F_ = 4, cfg.d_inp
    models_rd = _load_models_rd_use_beta()

    model = models_rd.Raindrop_v2(
        d_inp=cfg.d_inp, d_model=cfg.d_model, nhead=cfg.nhead,
        nhid=cfg.ffn_dim, nlayers=cfg.nlayers, dropout=cfg.dropout,
        max_len=cfg.max_len, d_static=cfg.d_static, MAX=cfg.MAX,
        aggreg="mean", n_classes=cfg.n_classes,
        global_structure=torch.ones(F_, F_), sensor_wise_mask=False,
        static=True)
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    _port_raindrop_to_reference(model, params, cfg)
    model.eval()

    src, static, times, lengths = _inputs(cfg, B)
    with torch.no_grad():
        ref_logits, ref_distance, _ = model(
            _t(src), _t(static), _t(times), torch.tensor(lengths))

    logits, distance = raindrop_apply(
        params, cfg, jnp.asarray(src), jnp.asarray(static),
        jnp.asarray(times), jnp.asarray(lengths))

    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(distance), float(ref_distance),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_beta", [False, True])
def test_raindrop_v2_sensor_wise_full_forward_vs_source(use_beta):
    """End-to-end eval forward with sensor-wise masked aggregation, full
    P19 dims — including combined with the β path.

    The reference head is unusable on this path (latent shape crash,
    DEVIATIONS.md #1): its mlp_static expects d_model+d_pe+d_inp=186
    features but sensor-wise pooling emits d_inp*(d_ob+d_pe)+d_inp=714.
    Every shared-shape weight is ported; the head is replaced by a
    correctly-sized torch Sequential carrying OUR head weights, so the
    comparison is source-vs-ours through pooling and exact-by-construction
    for the head.
    """
    cfg = dataset_config("P19", sensor_wise_mask=True, use_beta=use_beta)
    B, F_ = 3, cfg.d_inp
    models_rd = (_load_models_rd_use_beta() if use_beta
                 else reference_source.load("models_rd"))

    model = models_rd.Raindrop_v2(
        d_inp=cfg.d_inp, d_model=cfg.d_model, nhead=cfg.nhead,
        nhid=cfg.ffn_dim, nlayers=cfg.nlayers, dropout=cfg.dropout,
        max_len=cfg.max_len, d_static=cfg.d_static, MAX=cfg.MAX,
        aggreg="mean", n_classes=cfg.n_classes,
        global_structure=torch.ones(F_, F_), sensor_wise_mask=True,
        static=True)
    params = raindrop_init(jax.random.PRNGKey(1), cfg)
    # the reference-sized head cannot accept sensor-wise pooled features;
    # swap in a correctly-sized head before porting (porting writes .data
    # on whatever modules are present, so shapes must agree first)
    d_final = cfg.d_final
    model.mlp_static = torch.nn.Sequential(
        torch.nn.Linear(d_final, d_final),
        torch.nn.ReLU(),
        torch.nn.Linear(d_final, cfg.n_classes))
    _port_raindrop_to_reference(model, params, cfg)
    model.eval()

    src, static, times, lengths = _inputs(cfg, B, seed=11)
    with torch.no_grad():
        ref_logits, ref_distance, _ = model(
            _t(src), _t(static), _t(times), torch.tensor(lengths))

    logits, distance = raindrop_apply(
        params, cfg, jnp.asarray(src), jnp.asarray(static),
        jnp.asarray(times), jnp.asarray(lengths))

    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(distance), float(ref_distance),
                               rtol=2e-4, atol=2e-4)


def test_raindrop_v2_pam_full_forward_vs_source():
    """End-to-end eval forward on the PAM configuration at FULL dims
    (T=600, F=17, 8 classes, no statics) vs the unmodified source — the
    multiclass/no-static model shape previously covered only by toy-dim
    transcription tests (VERDICT r2 weak #6). Also exercises in_channels =
    600*4 = 2400 node features (attention_backend='dense' here so both
    sides run the same dense math; at T=600 the auto backend would pick
    the packed flash kernel — T>=128 crossover — which has its own parity
    suite in tests/test_flash_attention.py)."""
    cfg = dataset_config("PAM", attention_backend="dense")
    B, F_ = 3, cfg.d_inp
    models_rd = reference_source.load("models_rd")

    model = models_rd.Raindrop_v2(
        d_inp=cfg.d_inp, d_model=cfg.d_model, nhead=cfg.nhead,
        nhid=cfg.ffn_dim, nlayers=cfg.nlayers, dropout=cfg.dropout,
        max_len=cfg.max_len, d_static=0, MAX=cfg.MAX,
        aggreg="mean", n_classes=cfg.n_classes,
        global_structure=torch.ones(F_, F_), sensor_wise_mask=False,
        static=False)
    params = raindrop_init(jax.random.PRNGKey(2), cfg)
    _port_raindrop_to_reference(model, params, cfg)
    model.eval()

    rng = np.random.default_rng(13)
    T = cfg.max_len
    lengths = rng.integers(T // 2, T + 1, size=(B,))
    tgrid = np.cumsum(rng.uniform(0.05, 0.2, size=(T, B)), 0).astype(np.float32)
    times = np.where(np.arange(T)[:, None] < lengths[None, :], tgrid, 0.0)
    obs = (rng.uniform(size=(T, B, F_)) > 0.4).astype(np.float32)
    obs *= (times > 0)[:, :, None]
    vals = rng.normal(size=(T, B, F_)).astype(np.float32) * obs
    src = np.concatenate([vals, obs], axis=-1).astype(np.float32)

    with torch.no_grad():
        ref_logits, ref_distance, _ = model(
            _t(src), None, _t(times), torch.tensor(lengths))

    logits, distance = raindrop_apply(
        params, cfg, jnp.asarray(src), None,
        jnp.asarray(times), jnp.asarray(lengths))

    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(float(distance), float(ref_distance),
                               rtol=1e-3, atol=1e-4)
