"""Every baseline adapter must train through the shared Trainer on
synthetic data (shapes, jit, finite loss, metrics produced)."""

import numpy as np
import pytest

from raindrop_tpu.baselines.adapters import BASELINES, make_baseline
from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data import synthetic_split
from raindrop_tpu.train import Trainer


@pytest.fixture(scope="module")
def tiny_split():
    return synthetic_split("P19", n=80, seed=0, T=8)


@pytest.mark.parametrize("name", BASELINES)
def test_adapter_trains(name, tiny_split):
    cfg = dataset_config("P19", max_len=8, nlayers=1, nhead=1)
    tcfg = TrainConfig(dataset="P19", num_epochs=1, learning_rate=1e-3,
                       batch_size=16, batching_strategy=2,
                       aux_loss_weight=1.0 if name == "ipnet" else 0.0)
    init_fn, apply_fn = make_baseline(name, cfg)
    trainer = Trainer(cfg, tcfg, apply_fn=apply_fn, init_fn=init_fn)
    res = trainer.train_split(tiny_split, verbose=False)
    assert np.isfinite(res.history[-1]["train_loss"]), name
    assert 0.0 <= res.test_metrics["auroc"] <= 1.0, name
    assert res.test_metrics["accuracy"] >= 0.0, name


def test_mtand_adapter_num_heads(tiny_split):
    """num_heads must reach mtand_apply, not only mtand_init: with
    num_heads=2 the init sizes att_out at input_dim*num_heads, so an
    apply left at the default num_heads=1 crashes with a dot_general
    contracting-dimension mismatch (advisor finding, round 4)."""
    cfg = dataset_config("P19", max_len=8, nlayers=1, nhead=1)
    tcfg = TrainConfig(dataset="P19", num_epochs=1, learning_rate=1e-3,
                       batch_size=16, batching_strategy=2)
    init_fn, apply_fn = make_baseline("mtand", cfg, {"num_heads": 2})
    trainer = Trainer(cfg, tcfg, apply_fn=apply_fn, init_fn=init_fn)
    res = trainer.train_split(tiny_split, verbose=False)
    assert np.isfinite(res.history[-1]["train_loss"])
