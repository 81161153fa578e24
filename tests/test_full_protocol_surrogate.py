"""Full-protocol accuracy surrogate — the strongest metric-reproduction
evidence obtainable without the figshare dataset tensors.

test_training_dynamics_parity.py proves 5 epochs of dynamics track the
reference loop; this file runs the WHOLE experiment protocol of the
reference driver (code/Raindrop.py:160,255-374,380-406: N epochs, plateau
on val AUPRC, best-checkpoint by val AUROC, test with the best params
through the softmax path) on a P12-shaped synthetic split (statics,
missingness, 25% positive class imbalance — data/datasets.synthetic_raw)
against the UNMODIFIED reference model source driven by the transcribed
loop glue, and asserts the final test AUROC/AUPRC land in a tight band.

It also exercises the golden-comparison pipeline end-to-end: the reference
loop's test metrics are written in the reference's golden-results format
([3, n_splits] percent rows acc/auprc/auroc — the layout of
code/results/standard_phy12.npy, producer Transformer_baseline.py:470-471)
and ONE command — `python -m raindrop_tpu.run ... --compare-golden` —
reproduces the table within tolerance.

Dropout is 0 on both sides so both trainings are deterministic given the
shared init and batch stream; the band then measures only accumulated fp
divergence over num_epochs * n_batches Adam steps.
"""

from __future__ import annotations

import copy
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data.datasets import synthetic_split
from raindrop_tpu.data.sampler import balanced_batches, n_batches_per_epoch
from raindrop_tpu.train.trainer import Trainer
from tests import reference_source
from tests.test_reference_source_parity import _port_raindrop_to_reference

LR = 1e-3


def _reference_full_protocol(cfg, split, params0, n_batches, epochs, seed):
    """The reference's WHOLE per-split protocol with the published model
    source: train loop + plateau-on-AUPRC (code/Raindrop.py:255-374), best
    params by val AUROC (:369-374), then test with the softmax path
    (:388-389). Returns (test_metrics dict, history)."""
    from sklearn.metrics import (
        accuracy_score, average_precision_score, roc_auc_score)

    models_rd = reference_source.load("models_rd")
    F_ = cfg.d_inp
    model = models_rd.Raindrop_v2(
        d_inp=cfg.d_inp, d_model=cfg.d_model, nhead=cfg.nhead,
        nhid=cfg.ffn_dim, nlayers=cfg.nlayers, dropout=0.0,
        max_len=cfg.max_len, d_static=cfg.d_static, MAX=cfg.MAX,
        aggreg="mean", n_classes=cfg.n_classes,
        global_structure=torch.ones(F_, F_), sensor_wise_mask=False,
        static=True)
    _port_raindrop_to_reference(model, params0, cfg)

    criterion = torch.nn.CrossEntropyLoss()
    optimizer = torch.optim.Adam(model.parameters(), lr=LR)
    scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optimizer, mode="max", factor=0.1, patience=1, threshold=1e-4,
        threshold_mode="rel", cooldown=0, min_lr=1e-8, eps=1e-8)

    def t(a):
        return torch.tensor(np.asarray(a), dtype=torch.float32)

    Ptr = t(split.Ptrain).permute(1, 0, 2)
    Ptr_time = t(split.Ptrain_time).permute(1, 0)
    Ptr_static = t(split.Ptrain_static)
    ytr = torch.tensor(np.asarray(split.ytrain), dtype=torch.long)
    Pva = t(split.Pval).permute(1, 0, 2)
    Pva_time = t(split.Pval_time).permute(1, 0)
    Pva_static = t(split.Pval_static)
    Pte = t(split.Ptest).permute(1, 0, 2)
    Pte_time = t(split.Ptest_time).permute(1, 0)
    Pte_static = t(split.Ptest_static)

    rng = np.random.default_rng(seed)
    best = {"auroc": 0.0, "state": None}
    history = []
    for _epoch in range(epochs):
        model.train()
        for idx in balanced_batches(split.ytrain, BATCH, 2, rng,
                                    n_batches=n_batches):
            P = Ptr[:, idx, :]
            Ptime = Ptr_time[:, idx]
            lengths = torch.sum(Ptime > 0, dim=0)
            outputs, _, _ = model.forward(P, Ptr_static[idx], Ptime, lengths)
            optimizer.zero_grad()
            loss = criterion(outputs, ytr[idx])
            loss.backward()
            optimizer.step()

        model.eval()
        with torch.no_grad():
            lengths_v = torch.sum(Pva_time > 0, dim=0)
            out_val, _, _ = model.forward(Pva, Pva_static, Pva_time, lengths_v)
            probs = torch.sigmoid(out_val).numpy()   # the sigmoid quirk :349
        auroc = roc_auc_score(split.yval, probs[:, 1])
        auprc = average_precision_score(split.yval, probs[:, 1])
        scheduler.step(auprc)
        history.append({"val_auroc": float(auroc), "val_auprc": float(auprc)})
        if auroc > best["auroc"]:                     # best by AUROC :369-374
            best = {"auroc": auroc,
                    "state": copy.deepcopy(model.state_dict())}

    if best["state"] is not None:
        model.load_state_dict(best["state"])
    model.eval()
    with torch.no_grad():
        lengths_t = torch.sum(Pte_time > 0, dim=0)
        out_t, _, _ = model.forward(Pte, Pte_static, Pte_time, lengths_t)
        probs_t = torch.softmax(out_t, dim=1).numpy()  # test softmax :388
    ypred = probs_t.argmax(1)
    metrics = {
        "acc": accuracy_score(split.ytest, ypred),
        "auroc": roc_auc_score(split.ytest, probs_t[:, 1]),
        "auprc": average_precision_score(split.ytest, probs_t[:, 1]),
    }
    return metrics, history


BATCH = 32
N = 512    # 8:1:1 -> 51-sample val / 51-sample test: large enough that
          # best-epoch selection is not pure small-sample noise
T_LEN = 16
EPOCHS = 20
SEED = 5


def _setup(split_seed):
    cfg = dataset_config("P12", max_len=T_LEN, dropout=0.0)
    split = synthetic_split("P12", n=N, seed=split_seed, T=T_LEN)
    tcfg = TrainConfig(dataset="P12", batch_size=BATCH, num_epochs=EPOCHS,
                       learning_rate=LR, batching_strategy=2, seed=SEED)
    return cfg, split, tcfg


def test_full_protocol_20_epochs_vs_reference_loop():
    cfg, split, tcfg = _setup(split_seed=0)
    n_batches = n_batches_per_epoch(split.ytrain, BATCH, 2)
    trainer = Trainer(cfg, tcfg)
    ours = trainer.train_split(split, seed=SEED, verbose=False)

    init_key = jax.random.split(jax.random.PRNGKey(SEED))[1]
    params0 = jax.device_get(trainer._init(init_key))
    ref_metrics, ref_hist = _reference_full_protocol(
        cfg, split, params0, n_batches, EPOCHS, SEED)

    assert len(ref_hist) == EPOCHS
    # the protocol-selected TEST metrics must land in a tight band of the
    # reference loop's (fp drift over EPOCHS*n_batches Adam steps can move
    # the best-epoch choice between near-ties, so the band is not 0)
    assert abs(ours.test_metrics["auroc"] - ref_metrics["auroc"]) < 0.05, (
        ours.test_metrics, ref_metrics)
    assert abs(ours.test_metrics["auprc"] - ref_metrics["auprc"]) < 0.07, (
        ours.test_metrics, ref_metrics)
    assert abs(ours.test_metrics["accuracy"] - ref_metrics["acc"]) < 0.08, (
        ours.test_metrics, ref_metrics)
    # both selected best-val checkpoints of near-equal quality
    assert abs(ours.best_val_auroc
               - max(h["val_auroc"] for h in ref_hist)) < 0.05
    # the model actually learned — the surrogate is not vacuous
    assert ref_metrics["auroc"] > 0.75
    assert ours.test_metrics["auroc"] > 0.75


def test_compare_golden_cli_end_to_end(tmp_path):
    """One command reproduces a reference-loop-trained metric table: the
    reference protocol's metrics are written in the golden-results npy
    layout and `run.py --compare-golden` must match them within band."""
    cli_seed = 7
    epochs = 6
    # replicate EXACTLY the split + init + sampler streams the CLI will use
    # for split k=1 (run.py make_split: seed*1000+k; run_splits:
    # train_split(seed=tcfg.seed+0))
    cfg = dataset_config("P12", max_len=T_LEN, dropout=0.0)
    split = synthetic_split("P12", n=N, seed=cli_seed * 1000 + 1, T=T_LEN)
    tcfg = TrainConfig(dataset="P12", batch_size=BATCH, num_epochs=epochs,
                       learning_rate=LR, batching_strategy=2, seed=cli_seed)
    n_batches = n_batches_per_epoch(split.ytrain, BATCH, 2)
    trainer = Trainer(cfg, tcfg)
    init_key = jax.random.split(jax.random.PRNGKey(cli_seed))[1]
    params0 = jax.device_get(trainer._init(init_key))
    ref_metrics, _ = _reference_full_protocol(
        cfg, split, params0, n_batches, epochs, cli_seed)

    golden = np.array([[ref_metrics["acc"] * 100.0],
                       [ref_metrics["auprc"] * 100.0],
                       [ref_metrics["auroc"] * 100.0]])
    golden_path = tmp_path / "golden_reference_loop.npy"
    np.save(golden_path, golden)
    out_json = tmp_path / "out.json"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "raindrop_tpu.run",
         "--dataset", "P12", "--synthetic", str(N), "--max-len", str(T_LEN),
         "--dropout", "0.0", "--epochs", str(epochs),
         "--batch-size", str(BATCH), "--lr", str(LR),
         "--n-splits", "1", "--seed", str(cli_seed),
         "--checkpoint-dir", str(tmp_path / "ckpt"),
         "--compare-golden", str(golden_path),
         "--out-json", str(out_json)],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "golden" in proc.stdout.lower(), proc.stdout[-2000:]

    ours = json.loads(out_json.read_text())
    got = ours["missing_0.0"]
    assert abs(got["auroc"]["mean"] - golden[2, 0]) < 5.0, (got, golden)
    assert abs(got["auprc"]["mean"] - golden[1, 0]) < 7.0, (got, golden)
    # the golden-comparison pipeline itself ran and recorded its deltas
    assert "golden_delta" in ours, list(ours)


# ---- PAM: the multiclass / strategy-3 protocol ----------------------------
def test_pam_full_protocol_vs_reference_loop():
    """The 8-class PAM protocol against the unmodified reference source:
    strategy-3 uniform batches (code/Raindrop.py:301-307), sigmoid one-hot
    AUROC/AUPRC on val (:331-337 quirk applied to validation at :349-358),
    best-by-val-AUROC, softmax test metrics incl. macro P/R/F1
    (:395-401). Covers the multiclass metric paths the P12 surrogate
    cannot."""
    from sklearn.metrics import (
        average_precision_score, f1_score, roc_auc_score)
    from raindrop_tpu.train.metrics import one_hot

    n, batch, n_batches, epochs, seed = 400, 32, 20, 12, 9
    cfg = dataset_config("PAM", max_len=T_LEN, dropout=0.0)
    split = synthetic_split("PAM", n=n, seed=1, T=T_LEN)
    tcfg = TrainConfig(dataset="PAM", batch_size=batch, num_epochs=epochs,
                       learning_rate=LR, batching_strategy=3,
                       n_batches_strategy3=n_batches, seed=seed)
    trainer = Trainer(cfg, tcfg)
    ours = trainer.train_split(split, seed=seed, verbose=False)

    # every class present in val/test so sklearn one-hot scores are defined
    assert len(np.unique(split.yval)) == cfg.n_classes
    assert len(np.unique(split.ytest)) == cfg.n_classes

    init_key = jax.random.split(jax.random.PRNGKey(seed))[1]
    params0 = jax.device_get(trainer._init(init_key))

    models_rd = reference_source.load("models_rd")
    F_ = cfg.d_inp
    model = models_rd.Raindrop_v2(
        d_inp=cfg.d_inp, d_model=cfg.d_model, nhead=cfg.nhead,
        nhid=cfg.ffn_dim, nlayers=cfg.nlayers, dropout=0.0,
        max_len=cfg.max_len, d_static=0, MAX=cfg.MAX,
        aggreg="mean", n_classes=cfg.n_classes,
        global_structure=torch.ones(F_, F_), sensor_wise_mask=False,
        static=False)
    _port_raindrop_to_reference(model, params0, cfg)
    criterion = torch.nn.CrossEntropyLoss()
    optimizer = torch.optim.Adam(model.parameters(), lr=LR)
    scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optimizer, mode="max", factor=0.1, patience=1, threshold=1e-4,
        threshold_mode="rel", cooldown=0, min_lr=1e-8, eps=1e-8)

    def t(a):
        return torch.tensor(np.asarray(a), dtype=torch.float32)

    Ptr = t(split.Ptrain).permute(1, 0, 2)
    Ptr_time = t(split.Ptrain_time).permute(1, 0)
    ytr = torch.tensor(np.asarray(split.ytrain), dtype=torch.long)
    Pva = t(split.Pval).permute(1, 0, 2)
    Pva_time = t(split.Pval_time).permute(1, 0)
    Pte = t(split.Ptest).permute(1, 0, 2)
    Pte_time = t(split.Ptest_time).permute(1, 0)

    rng = np.random.default_rng(seed)
    best = {"auroc": 0.0, "state": None}
    for _epoch in range(epochs):
        model.train()
        for idx in balanced_batches(split.ytrain, batch, 3, rng,
                                    n_batches=n_batches):
            P = Ptr[:, idx, :]
            Ptime = Ptr_time[:, idx]
            lengths = torch.sum(Ptime > 0, dim=0)
            outputs, _, _ = model.forward(P, None, Ptime, lengths)
            optimizer.zero_grad()
            loss = criterion(outputs, ytr[idx])
            loss.backward()
            optimizer.step()
        model.eval()
        with torch.no_grad():
            lv = torch.sum(Pva_time > 0, dim=0)
            out_val, _, _ = model.forward(Pva, None, Pva_time, lv)
            probs = torch.sigmoid(out_val).numpy()     # PAM val quirk :349
        oh = one_hot(split.yval, cfg.n_classes)
        auroc = roc_auc_score(oh, probs)
        auprc = average_precision_score(oh, probs)
        scheduler.step(auprc)
        if auroc > best["auroc"]:
            best = {"auroc": auroc,
                    "state": copy.deepcopy(model.state_dict())}

    if best["state"] is not None:
        model.load_state_dict(best["state"])
    model.eval()
    with torch.no_grad():
        lt = torch.sum(Pte_time > 0, dim=0)
        out_t, _, _ = model.forward(Pte, None, Pte_time, lt)
        probs_t = torch.softmax(out_t, dim=1).numpy()
    ypred = probs_t.argmax(1)
    ref_auroc = roc_auc_score(one_hot(split.ytest, cfg.n_classes), probs_t)
    ref_f1 = f1_score(split.ytest, ypred, average="macro")

    assert abs(ours.test_metrics["auroc"] - ref_auroc) < 0.05, (
        ours.test_metrics, ref_auroc)
    assert abs(ours.test_metrics["f1"] - ref_f1) < 0.10, (
        ours.test_metrics, ref_f1)
    assert abs(ours.best_val_auroc - best["auroc"]) < 0.05
    # the 8-class model actually learned under strategy-3 batching
    assert ref_auroc > 0.7 and ours.test_metrics["auroc"] > 0.7


def test_p19_imbalance_full_protocol_vs_reference_loop():
    """The P19-shaped regime: ~4% positives (README.md:73), the protocol's
    hardest metric setting — AUPRC is the fragile metric there and is what
    the plateau scheduler and best-checkpoint selection key on
    (code/Raindrop.py:368,417-421). The P12-like surrogate above never
    stresses it. Same 20-epoch full-protocol comparison against the
    unmodified reference source, asserting AUPRC-band agreement."""
    n = 1600                       # 8:1:1 -> 160-sample val/test partitions
    cfg = dataset_config("P19", max_len=T_LEN, dropout=0.0)
    split = synthetic_split("P19", n=n, seed=11, T=T_LEN,
                            positive_rate=0.04)
    # the regime is real: scarce positives everywhere, >=3 per partition
    # so AUPRC is defined but unstable — exactly the P19 difficulty
    for part in (split.ytrain, split.yval, split.ytest):
        assert 3 <= part.sum() <= 0.10 * len(part), part.sum()
    tcfg = TrainConfig(dataset="P19", batch_size=BATCH, num_epochs=EPOCHS,
                       learning_rate=LR, batching_strategy=2, seed=SEED)
    n_batches = n_batches_per_epoch(split.ytrain, BATCH, 2)
    trainer = Trainer(cfg, tcfg)
    ours = trainer.train_split(split, seed=SEED, verbose=False)

    init_key = jax.random.split(jax.random.PRNGKey(SEED))[1]
    params0 = jax.device_get(trainer._init(init_key))
    ref_metrics, ref_hist = _reference_full_protocol(
        cfg, split, params0, n_batches, EPOCHS, SEED)

    assert len(ref_hist) == EPOCHS
    # AUPRC under 4% positives moves in ~1/n_pos quanta per rank flip;
    # the band is correspondingly wider than the balanced surrogate's but
    # still excludes any systematic divergence
    assert abs(ours.test_metrics["auprc"] - ref_metrics["auprc"]) < 0.15, (
        ours.test_metrics, ref_metrics)
    assert abs(ours.test_metrics["auroc"] - ref_metrics["auroc"]) < 0.06, (
        ours.test_metrics, ref_metrics)
    # the protocol must have actually discriminated: far above the 4%
    # positive-rate AUPRC floor on both sides
    assert ref_metrics["auprc"] > 0.3
    assert ours.test_metrics["auprc"] > 0.3
    assert ref_metrics["auroc"] > 0.8
    assert ours.test_metrics["auroc"] > 0.8
