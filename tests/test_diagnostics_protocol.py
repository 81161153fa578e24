"""Tests for the reference's training-time diagnostics + protocol options:
confusion matrix / classification report (code/Raindrop.py:341-342,399-406),
the GRU-D frozen-parameter diff (GRU-D_baseline.py:355-363), the GRU-D BCE
objective (GRU-D_baseline.py:289), and the mTAND per-run-resplit protocol
(mTAND_baseline.py:72-88)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data.datasets import synthetic_split
from raindrop_tpu.train.metrics import (
    classification_report_str,
    confusion_matrix_np,
)
from raindrop_tpu.utils.diagnostics import frozen_param_report


# ------------------------------------------------------- confusion / report
@pytest.mark.parametrize("n_classes,labels", [
    (2, [0, 1]),
    (8, list(range(8))),
    (8, [0, 1]),       # the reference's hard-coded train-time labels=[0,1]
])
def test_confusion_matrix_sklearn_parity(n_classes, labels):
    from sklearn.metrics import confusion_matrix

    rng = np.random.default_rng(0)
    y = rng.integers(0, n_classes, size=200)
    ypred = rng.integers(0, n_classes, size=200)
    ours = confusion_matrix_np(y, ypred, labels)
    ref = confusion_matrix(y, ypred, labels=labels)
    np.testing.assert_array_equal(ours, ref)


def test_classification_report_is_sklearn():
    from sklearn.metrics import classification_report

    rng = np.random.default_rng(1)
    y = rng.integers(0, 3, size=60)
    ypred = rng.integers(0, 3, size=60)
    assert classification_report_str(y, ypred) == classification_report(
        y, ypred, zero_division=0)


def test_trainer_emits_test_diagnostics():
    from raindrop_tpu.train.trainer import Trainer

    cfg = dataset_config("P19", max_len=8)
    split = synthetic_split("P19", n=64, seed=0, T=8)
    tcfg = TrainConfig(dataset="P19", batch_size=8, num_epochs=1,
                       batching_strategy=2)
    res = Trainer(cfg, tcfg).train_split(split, seed=0, verbose=False)
    assert res.test_confusion.shape == (2, 2)
    assert res.test_confusion.sum() == len(split.ytest)
    assert "precision" in res.test_report


# -------------------------------------------------------- frozen-param diff
def test_frozen_param_report():
    old = {"a": {"w": np.ones((3, 3)), "b": np.zeros(3)},
           "c": np.full(4, 2.0)}
    new = {"a": {"w": np.ones((3, 3)) * 1.1, "b": np.zeros(3)},
           "c": np.full(4, 2.0)}
    frozen = frozen_param_report(old, new)
    assert any("b" in f for f in frozen)
    assert any("c" in f for f in frozen)
    assert not any("w" in f for f in frozen)
    assert frozen_param_report(old, old) == frozen_param_report(old, old)


def test_raindrop_dead_params_reported_frozen():
    """After one real train step, exactly the optimizer-masked (dead
    reference) parameters must show as frozen — a regression net around
    raindrop_param_mask (DEVIATIONS.md #10)."""
    from raindrop_tpu.train.trainer import Trainer

    cfg = dataset_config("P19", max_len=8)
    split = synthetic_split("P19", n=48, seed=1, T=8)
    tcfg = TrainConfig(dataset="P19", batch_size=8, num_epochs=1,
                       batching_strategy=2, learning_rate=1e-2)
    trainer = Trainer(cfg, tcfg)
    params0 = jax.device_get(trainer._init(jax.random.PRNGKey(0)))
    opt_state = trainer.optimizer.init(params0)
    batch = trainer._device_batch(split.Ptrain[:8], split.Ptrain_time[:8],
                                  split.Ptrain_static[:8], split.ytrain[:8])
    params1, _, _, _ = trainer._train_step(
        jax.device_get(params0), opt_state, batch, jax.random.PRNGKey(1))
    frozen = set(frozen_param_report(params0, jax.device_get(params1)))
    # dead reference params (DEVIATIONS.md #10) stay frozen...
    assert any("encoder" in f for f in frozen)
    assert any("lin_key" in f for f in frozen)
    assert any("map_weights" in f for f in frozen)  # use_beta=False
    # ...and every live parameter moved
    for live in ("R_u", "lin_value", "mlp_static", "transformer_encoder"):
        assert not any(live in f for f in frozen), (live, sorted(frozen))


# ------------------------------------------------------------ GRU-D BCE head
def test_grud_bce_equals_bce_with_logits():
    """softmax CE over [0, z] with integer labels == BCEWithLogits(z, y):
    the exact reference GRU-D objective (GRU-D_baseline.py:289)."""
    import optax
    import torch

    rng = np.random.default_rng(0)
    z = rng.normal(size=(16, 1)).astype(np.float32)
    y = rng.integers(0, 2, size=(16,))
    logits2 = jnp.concatenate([jnp.zeros_like(z), jnp.asarray(z)], -1)
    ours = optax.softmax_cross_entropy_with_integer_labels(
        logits2, jnp.asarray(y)).mean()
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(z[:, 0]), torch.tensor(y, dtype=torch.float32))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_grud_bce_adapter_shapes_and_training():
    from raindrop_tpu.baselines.adapters import make_baseline
    from raindrop_tpu.train.trainer import Trainer

    cfg = dataset_config("P19", max_len=8)
    init_fn, apply_fn = make_baseline("grud_bce", cfg)
    split = synthetic_split("P19", n=48, seed=2, T=8)
    tcfg = TrainConfig(dataset="P19", batch_size=8, num_epochs=1,
                       batching_strategy=2, learning_rate=1e-2)
    trainer = Trainer(cfg, tcfg, apply_fn=apply_fn, init_fn=init_fn,
                      update_mask=False)
    res = trainer.train_split(split, seed=0, verbose=False)
    assert np.isfinite(res.test_metrics["auroc"])
    # column 0 of the logits is identically 0 (the [0, z] embedding)
    logits = trainer.predict(res.params, split.Ptest, split.Ptest_time,
                             split.Ptest_static)
    np.testing.assert_array_equal(logits[:, 0], 0.0)


# ------------------------------------------------------------ per-run resplit
def test_run_splits_resplit_per_run():
    """With resplit_per_run, make_split is called once per run with the run
    index and different partitions actually reach the trainer."""
    from raindrop_tpu.train.trainer import run_splits

    cfg = dataset_config("P19", max_len=8)
    tcfg = TrainConfig(dataset="P19", batch_size=8, num_epochs=1,
                       n_splits=1, n_runs=2, batching_strategy=2,
                       resplit_per_run=True, checkpoint_dir="/tmp/rd_ckpt_rs")
    seen = []

    def make_split(k, run=0):
        seen.append((k, run))
        return synthetic_split("P19", n=48, seed=1000 * k + run, T=8)

    out = run_splits(make_split, cfg, tcfg, verbose=False)
    assert seen == [(1, 0), (1, 1)]
    assert np.isfinite(out["summary"]["auroc"]["mean"])


def test_load_split_resplit_seed_partitions(tmp_path):
    """resplit_seed draws deterministic, disjoint, size-correct 8:1:1
    partitions that differ between seeds (mTAND per-run protocol)."""
    from raindrop_tpu.data.datasets import load_split, synthetic_raw

    # build a minimal on-disk PAM-layout dataset (no statics, array dtype)
    P, y = synthetic_raw("PAM", 40, 0, T=8)
    d = tmp_path / "processed_data"
    d.mkdir(parents=True)
    np.save(d / "PTdict_list.npy", P)
    np.save(d / "arr_outcomes.npy", y.reshape(-1, 1).astype(np.float64))

    s1 = load_split(str(tmp_path), "PAM", 1, resplit_seed=7)
    s1b = load_split(str(tmp_path), "PAM", 1, resplit_seed=7)
    s2 = load_split(str(tmp_path), "PAM", 1, resplit_seed=8)
    assert len(s1.ytrain) == 32 and len(s1.yval) == 4 and len(s1.ytest) == 4
    np.testing.assert_array_equal(s1.ytrain, s1b.ytrain)  # deterministic
    assert not np.array_equal(s1.Ptest, s2.Ptest)         # seed moves it


def test_grud_bce_rejects_multiclass():
    from raindrop_tpu.baselines.adapters import make_baseline

    with pytest.raises(ValueError, match="binary"):
        make_baseline("grud_bce", dataset_config("PAM", max_len=8))


# ------------------------------------------------------- FLOPs / MFU
def test_compiled_flops_counts_matmul():
    """compiled_flops reads XLA's cost model: a [M,K]@[K,N] matmul must
    report ~2*M*K*N model FLOPs (the basis of bench.py's MFU fields)."""
    from raindrop_tpu.utils.diagnostics import compiled_flops, mfu

    M, K, N = 64, 128, 256

    @jax.jit
    def f(x, w):
        return x @ w

    x = jax.ShapeDtypeStruct((M, K), jnp.float32)
    w = jax.ShapeDtypeStruct((K, N), jnp.float32)
    flops = compiled_flops(f, x, w)
    if flops is None:
        pytest.skip("backend exposes no cost model")
    assert flops >= 2 * M * K * N
    assert flops < 4 * M * K * N  # same order — not a trip-count blowup
    assert mfu(flops, peak_flops=flops * 10) == pytest.approx(0.1)
    assert mfu(None) is None


def test_compiled_flops_accepts_pytree_args_and_never_raises():
    from raindrop_tpu.utils.diagnostics import compiled_flops

    @jax.jit
    def g(tree, y):
        return tree["a"] @ tree["b"] + y

    tree = {"a": jnp.ones((8, 16)), "b": jnp.ones((16, 8))}
    flops = compiled_flops(g, tree, jnp.ones((8, 8)))
    assert flops is None or flops >= 2 * 8 * 16 * 8
    # bad input: wrong arity — must return None, not raise
    assert compiled_flops(g, tree) is None


# ------------------------------------------------------- run tracking (§5.5)
def test_run_tracker_lifecycle(tmp_path):
    """The W&B-slot callback interface: run_splits drives start -> N x
    log_epoch -> finish on a user sink; a JSONL sink records them; a
    raising sink is disabled without killing the run."""
    from raindrop_tpu.config import TrainConfig
    from raindrop_tpu.data.datasets import synthetic_split
    from raindrop_tpu.train.trainer import run_splits
    from raindrop_tpu.utils.tracking import JSONLTracker, RunTracker

    cfg = dataset_config("P19", max_len=8)
    tcfg = TrainConfig(dataset="P19", num_epochs=2, batch_size=8,
                       n_splits=1, seed=0,
                       checkpoint_dir=str(tmp_path / "ckpt"))

    class Recorder(RunTracker):
        def __init__(self):
            self.events = []

        def start(self, config):
            self.events.append(("start", config))

        def log_epoch(self, record):
            self.events.append(("epoch", record))

        def finish(self, summary):
            self.events.append(("finish", summary))

    rec = Recorder()
    run_splits(lambda k: synthetic_split("P19", n=48, seed=k, T=8),
               cfg, tcfg, verbose=False, tracker=rec)
    kinds = [e[0] for e in rec.events]
    assert kinds == ["start", "epoch", "epoch", "finish"]
    assert rec.events[0][1]["dataset"] == "P19"
    assert {"epoch", "train_loss", "val_auroc", "val_auprc",
            "lr"} <= set(rec.events[1][1])
    assert "auroc" in rec.events[-1][1]

    # JSONL sink round-trips the same lifecycle
    path = tmp_path / "track.jsonl"
    run_splits(lambda k: synthetic_split("P19", n=48, seed=k, T=8),
               cfg, tcfg, verbose=False, tracker=JSONLTracker(str(path)))
    import json as _json
    lines = [_json.loads(ln) for ln in path.read_text().splitlines()]
    assert [ln["event"] for ln in lines] == ["start", "epoch", "epoch",
                                             "finish"]

    class Exploder(RunTracker):
        def log_epoch(self, record):
            raise RuntimeError("sink down")

    # a failing sink must not kill training
    out = run_splits(lambda k: synthetic_split("P19", n=48, seed=k, T=8),
                     cfg, tcfg, verbose=False, tracker=Exploder())
    assert np.isfinite(out["summary"]["auroc"]["mean"])
