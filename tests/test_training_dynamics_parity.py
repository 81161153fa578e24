"""Training-DYNAMICS parity against the unmodified reference source.

Forward parity (test_reference_source_parity.py) proves the models compute
the same function; this file proves they *train* the same: the actual
reference training loop — `Raindrop_v2` + torch.optim.Adam +
torch ReduceLROnPlateau + CrossEntropyLoss, transcribing only the loop glue
of reference code/Raindrop.py:255-374 while every heavy component is the
published source — is run for several epochs on a tiny fixed-seed synthetic
split from identical initial weights and identical batch indices, and our
Trainer's per-epoch train losses, val AUROC/AUPRC and LR trajectory must
track it.

This is the strongest optimizer/scheduler/masking-semantics evidence
obtainable without the figshare-hosted dataset tensors: it fails if
optax.adam drifts from torch.optim.Adam (bias correction, eps placement),
if the optax.masked dead-parameter handling diverges from torch's
grad-is-None skipping, if train/plateau.ReduceLROnPlateau's threshold/
patience state machine diverges from torch's, or if the balanced-batch /
masking / metric (sigmoid-quirk) semantics drift.

Dropout is 0 on both sides so the dynamics are deterministic.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data.datasets import synthetic_split
from raindrop_tpu.data.sampler import balanced_batches, n_batches_per_epoch
from raindrop_tpu.train.plateau import ReduceLROnPlateau
from raindrop_tpu.train.trainer import Trainer
from tests import reference_source
from tests.test_reference_source_parity import _port_raindrop_to_reference

SEED = 3
EPOCHS = 5
BATCH = 16
LR = 1e-3  # larger than the reference's 1e-4 so 5 epochs of dynamics are
           # numerically visible; both sides use the same value


def _reference_training_run(cfg, split, params0, n_batches):
    """The reference training protocol with the published model source.

    Loop glue transcribed from code/Raindrop.py:255-374 (optimizer at :256,
    scheduler at :257-259, batch slicing at :299-315, lengths at :317,
    train step at :319-324, val + scheduler.step(aupr) at :344-368); the
    model, its per-sample propagation loop, and the torch optimizer/
    scheduler are all unmodified upstream code.
    """
    from sklearn.metrics import average_precision_score, roc_auc_score

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

    # time-major tensors like the reference driver (code/Raindrop.py:233-239)
    Ptr = t(split.Ptrain).permute(1, 0, 2)
    Ptr_time = t(split.Ptrain_time).permute(1, 0)
    Ptr_static = t(split.Ptrain_static)
    ytr = torch.tensor(np.asarray(split.ytrain), dtype=torch.long)
    Pva = t(split.Pval).permute(1, 0, 2)
    Pva_time = t(split.Pval_time).permute(1, 0)
    Pva_static = t(split.Pval_static)

    # identical batch-index stream to our Trainer: same sampler, same seed
    rng = np.random.default_rng(SEED)
    history = []
    for _epoch in range(EPOCHS):
        model.train()
        for idx in balanced_batches(split.ytrain, BATCH, 2, rng,
                                    n_batches=n_batches):
            P = Ptr[:, idx, :]
            Ptime = Ptr_time[:, idx]
            y = ytr[idx]
            lengths = torch.sum(Ptime > 0, dim=0)
            outputs, _, _ = model.forward(P, Ptr_static[idx], Ptime, lengths)
            optimizer.zero_grad()
            loss = criterion(outputs, y)
            loss.backward()
            optimizer.step()

        model.eval()
        with torch.no_grad():
            lengths_v = torch.sum(Pva_time > 0, dim=0)
            out_val, _, _ = model.forward(Pva, Pva_static, Pva_time, lengths_v)
            probs = torch.sigmoid(out_val).numpy()  # the sigmoid quirk, :349
        auroc = roc_auc_score(split.yval, probs[:, 1])
        auprc = average_precision_score(split.yval, probs[:, 1])
        scheduler.step(auprc)
        history.append({"train_loss": float(loss),
                        "val_auroc": float(auroc), "val_auprc": float(auprc),
                        "lr": optimizer.param_groups[0]["lr"]})
    return history


def test_trainer_dynamics_vs_reference_source():
    cfg = dataset_config("P19", max_len=16, dropout=0.0)
    split = synthetic_split("P19", n=128, seed=0, T=16)
    tcfg = TrainConfig(dataset="P19", batch_size=BATCH, num_epochs=EPOCHS,
                       learning_rate=LR, batching_strategy=2, seed=SEED)
    n_batches = n_batches_per_epoch(split.ytrain, BATCH, 2)
    assert n_batches >= 2, "split too small to exercise the loop"

    trainer = Trainer(cfg, tcfg)
    ours = trainer.train_split(split, seed=SEED, verbose=False).history

    # reproduce the Trainer's init stream so both sides start from the
    # SAME weights (trainer.train_split: key=PRNGKey(seed); split -> init)
    init_key = jax.random.split(jax.random.PRNGKey(SEED))[1]
    params0 = jax.device_get(trainer._init(init_key))
    ref = _reference_training_run(cfg, split, params0, n_batches)

    assert len(ours) == len(ref) == EPOCHS
    ours_losses = np.array([r["train_loss"] for r in ours])
    ref_losses = np.array([r["train_loss"] for r in ref])
    # fp32 drift accumulates over EPOCHS*n_batches Adam steps; a real
    # semantic difference (wrong eps placement, missing bias correction,
    # unmasked dead params, wrong batch stream) diverges far past this
    np.testing.assert_allclose(ours_losses, ref_losses, rtol=5e-3, atol=5e-3)
    for k in ("val_auroc", "val_auprc"):
        np.testing.assert_allclose(
            np.array([r[k] for r in ours]), np.array([r[k] for r in ref]),
            atol=0.02, err_msg=k)
    # early epochs have negligible drift: rank order must be identical
    for k in ("val_auroc", "val_auprc"):
        np.testing.assert_allclose(ours[0][k], ref[0][k], atol=1e-6,
                                   err_msg=f"epoch-0 {k}")
    np.testing.assert_allclose(
        np.array([r["lr"] for r in ours]), np.array([r["lr"] for r in ref]),
        rtol=1e-12, err_msg="LR trajectories (plateau decisions) diverged")


@pytest.mark.parametrize("mode", ["max", "min"])
def test_plateau_scheduler_vs_torch(mode):
    """Exhaustive state-machine parity: our host-side ReduceLROnPlateau vs
    torch's, driven by random metric sequences (including negatives, ties,
    plateaus) — every LR along the way must match exactly."""
    rng = np.random.default_rng(0)
    for trial in range(20):
        lr0 = 10.0 ** rng.uniform(-5, -2)
        patience = int(rng.integers(0, 3))
        factor = float(rng.uniform(0.1, 0.9))
        threshold = float(10.0 ** rng.uniform(-6, -2))
        dummy = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([dummy], lr=lr0)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode=mode, factor=factor, patience=patience,
            threshold=threshold, threshold_mode="rel", cooldown=0,
            min_lr=1e-8, eps=0.0)
        ours = ReduceLROnPlateau(lr0, mode=mode, factor=factor,
                                 patience=patience, threshold=threshold,
                                 min_lr=1e-8)
        # step metric sequence with plateaus and sign changes
        metrics = rng.normal(size=30) * (10.0 ** rng.integers(-4, 2))
        metrics[rng.integers(0, 30, size=10)] = metrics[0]  # forced ties
        for m in metrics:
            tsched.step(float(m))
            lr_ours = ours.step(float(m))
            assert lr_ours == pytest.approx(
                opt.param_groups[0]["lr"], rel=1e-12), (
                trial, mode, m, patience, factor, threshold)
