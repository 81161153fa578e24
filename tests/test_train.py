"""Trainer: metrics parity vs sklearn/reference quirks, plateau scheduler
torch semantics, checkpoint round-trip, end-to-end learning on synthetic
data (single device and 8-device DP mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data import synthetic_split
from raindrop_tpu.models.raindrop import raindrop_init
from raindrop_tpu.train import (
    ReduceLROnPlateau,
    Trainer,
    classification_metrics,
    load_checkpoint,
    save_checkpoint,
)
from raindrop_tpu.train.metrics import binary_probs_sigmoid, softmax_probs


def test_metrics_binary_sigmoid_vs_softmax(rng_np):
    logits = rng_np.normal(size=(200, 2))
    y = rng_np.integers(0, 2, size=200)
    m_sig = classification_metrics(logits, y, 2, prob_mode="sigmoid")
    m_soft = classification_metrics(logits, y, 2, prob_mode="softmax")
    # ranking by sigmoid(logit_1) differs from softmax ranking in general
    assert 0 <= m_sig["auroc"] <= 1 and 0 <= m_soft["auroc"] <= 1
    assert m_sig["accuracy"] == m_soft["accuracy"]  # argmax unchanged
    p = binary_probs_sigmoid(logits)
    assert p.shape == logits.shape and np.all((p > 0) & (p < 1))
    np.testing.assert_allclose(softmax_probs(logits).sum(1), 1.0, atol=1e-12)


def test_metrics_multiclass(rng_np):
    logits = rng_np.normal(size=(100, 8))
    y = rng_np.integers(0, 8, size=100)
    m = classification_metrics(logits, y, 8)
    for k in ("auroc", "auprc", "precision", "recall", "f1", "accuracy"):
        assert 0 <= m[k] <= 1


def test_plateau_matches_torch():
    torch = pytest.importorskip("torch")
    t_opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.1)
    t_sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        t_opt, mode="max", factor=0.1, patience=1, threshold=1e-4,
        threshold_mode="rel", min_lr=1e-8)
    mine = ReduceLROnPlateau(0.1, factor=0.1, patience=1, threshold=1e-4,
                             min_lr=1e-8)
    metrics = [0.5, 0.6, 0.6, 0.6, 0.6, 0.61, 0.2, 0.2, 0.2, 0.9, 0.9, 0.89]
    for m in metrics:
        t_sched.step(m)
        lr = mine.step(m)
        assert lr == pytest.approx(t_opt.param_groups[0]["lr"], rel=1e-12), m


def test_checkpoint_roundtrip(tmp_path):
    cfg = dataset_config("PAM", max_len=8)
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, meta={"epoch": 3})
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored, _, meta = load_checkpoint(path, zeros)
    assert meta["epoch"] == 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored)


def _mini_train(mesh=None):
    cfg = dataset_config("PAM", max_len=16, d_inp=8)
    tcfg = TrainConfig(dataset="PAM", num_epochs=3, learning_rate=1e-3,
                       batch_size=32, batching_strategy=3,
                       n_batches_strategy3=8, seed=0)
    split = synthetic_split("PAM", n=160, seed=0, T=16)
    # synthetic PAM uses the full 17 sensors; shrink model input to match
    cfg = dataset_config("PAM", max_len=16)
    trainer = Trainer(cfg, tcfg, mesh=mesh)
    return trainer.train_split(split, verbose=False), split, trainer


def test_e2e_training_learns():
    res, split, trainer = _mini_train()
    # synthetic class signal is strong; 3 epochs must beat chance (0.5/0.125)
    assert res.test_metrics["auroc"] > 0.6
    assert res.best_val_auroc > 0.6
    assert res.samples_per_sec > 0
    assert len(res.history) == 3


def test_e2e_training_dp_mesh():
    from raindrop_tpu.parallel import make_mesh
    mesh = make_mesh(n_data=8)
    res, split, trainer = _mini_train(mesh=mesh)
    assert res.test_metrics["auroc"] > 0.6


def test_single_vs_mesh_forward_equal():
    """DP sharding must not change the math: same params, same batch,
    logits bitwise-comparable (float32 CPU)."""
    from raindrop_tpu.parallel import make_mesh
    cfg = dataset_config("PAM", max_len=16)
    tcfg = TrainConfig(dataset="PAM", batch_size=32)
    split = synthetic_split("PAM", n=80, seed=1, T=16)
    t1 = Trainer(cfg, tcfg)
    t8 = Trainer(cfg, tcfg, mesh=make_mesh(n_data=8))
    params = raindrop_init(jax.random.PRNGKey(5), cfg)
    out1 = t1.predict(params, split.Ptest, split.Ptest_time, None, batch_size=8)
    out8 = t8.predict(params, split.Ptest, split.Ptest_time, None, batch_size=8)
    np.testing.assert_allclose(out1, out8, rtol=1e-5, atol=1e-6)


def test_checkpoint_orbax_roundtrip(tmp_path):
    import pytest as _pytest
    _pytest.importorskip("orbax.checkpoint")
    from raindrop_tpu.train.checkpoint import (
        load_checkpoint_orbax, save_checkpoint_orbax)
    cfg = dataset_config("PAM", max_len=8)
    params = raindrop_init(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(path, params)
    restored = load_checkpoint_orbax(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored)


def test_scan_epoch_matches_per_step_path():
    """With dropout disabled the scanned-epoch dispatch (train_epoch in
    Trainer._build) must produce EXACTLY the same training trajectory as the
    per-step path: same host RNG -> same batch order, and the step math is
    key-independent at dropout 0."""
    cfg = dataset_config("PAM", max_len=16, dropout=0.0, prop_dropout=0.0)
    split = synthetic_split("PAM", n=160, seed=0, T=16)

    results = {}
    for scan in (True, False):
        tcfg = TrainConfig(dataset="PAM", num_epochs=2, learning_rate=1e-3,
                           batch_size=32, batching_strategy=3,
                           n_batches_strategy3=4, seed=0, scan_epoch=scan)
        res = Trainer(cfg, tcfg).train_split(split, verbose=False)
        results[scan] = res

    a, b = results[True], results[False]
    for ra, rb in zip(a.history, b.history):
        np.testing.assert_allclose(ra["train_loss"], rb["train_loss"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ra["val_auroc"], rb["val_auroc"],
                                   rtol=1e-6)
    # the scanned and dispatched programs fuse differently, so allow
    # float32-accumulation drift in the final params
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-4),
        a.params, b.params)


def test_masked_optimizer_matches_unmasked():
    """The dead-parameter mask (models.raindrop.raindrop_param_mask — the
    torch skip-grad-less-params semantics) must not change the training
    trajectory: masked params get structurally-zero grads, and a zero-grad
    Adam update is exactly zero."""
    cfg = dataset_config("PAM", max_len=16, dropout=0.0, prop_dropout=0.0)
    split = synthetic_split("PAM", n=128, seed=0, T=16)
    tcfg = TrainConfig(dataset="PAM", num_epochs=2, learning_rate=1e-3,
                       batch_size=32, batching_strategy=3,
                       n_batches_strategy3=3, seed=0)
    a = Trainer(cfg, tcfg).train_split(split, verbose=False)  # mask default
    b = Trainer(cfg, tcfg, update_mask=False).train_split(split, verbose=False)
    for ra, rb in zip(a.history, b.history):
        np.testing.assert_allclose(ra["train_loss"], rb["train_loss"],
                                   rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5),
        a.params, b.params)


def test_measure_mfu_epoch_records():
    """tcfg.measure_mfu adds achieved TFLOP/s + MFU to every epoch record
    (production telemetry of the bench's FLOPs accounting)."""
    from raindrop_tpu.config import TrainConfig, dataset_config
    from raindrop_tpu.data.datasets import synthetic_split
    from raindrop_tpu.train.trainer import Trainer

    cfg = dataset_config("P19", max_len=8)
    split = synthetic_split("P19", n=64, seed=0, T=8)
    tcfg = TrainConfig(dataset="P19", num_epochs=2, batch_size=16,
                       measure_mfu=True)
    res = Trainer(cfg, tcfg).train_split(split, verbose=False)
    for rec in res.history:
        assert rec["train_tflops_per_sec"] > 0
        assert 0 < rec["mfu"] < 1


def test_grad_microbatches_step_matches_full_batch():
    """grad_microbatches=N averages chunk gradients inside the step —
    numerically the full-batch update (mean of chunk means), to fp
    reduction tolerance. Dropout 0: the chunked rng stream legitimately
    differs from the full-batch one."""
    import dataclasses

    import jax
    import numpy as np
    from raindrop_tpu.config import TrainConfig, dataset_config
    from raindrop_tpu.data import synthetic_split

    cfg = dataset_config("P19", max_len=8, dropout=0.0)
    split = synthetic_split("P19", n=64, seed=0, T=8)
    tcfg = TrainConfig(dataset="P19", batch_size=16, num_epochs=1,
                       batching_strategy=2)
    idx = np.arange(16)

    def one_step(tc):
        tr = Trainer(cfg, tc)
        params = tr._init(jax.random.PRNGKey(0))
        opt_state = tr.optimizer.init(params)
        batch = tr._device_batch(split.Ptrain[idx], split.Ptrain_time[idx],
                                 split.Ptrain_static[idx], split.ytrain[idx])
        params, _, loss, logits = tr._train_step(
            params, opt_state, batch, jax.random.PRNGKey(1))
        return float(loss), np.asarray(logits), jax.device_get(params)

    l1, lg1, p1 = one_step(tcfg)
    l4, lg4, p4 = one_step(dataclasses.replace(tcfg, grad_microbatches=4))
    assert np.isclose(l4, l1, rtol=1e-5)
    np.testing.assert_allclose(lg4, lg1, rtol=1e-4, atol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p4),
            jax.tree_util.tree_leaves_with_path(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5, err_msg=str(path))
