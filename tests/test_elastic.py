"""Failure detection + elastic recovery (parallel/elastic.py).

The reference has no fault handling (SURVEY.md §5.3); these tests pin the
new framework's contract: a run killed mid-training and restarted from its
last durable checkpoint is indistinguishable from an uninterrupted run, and
heartbeat staleness is detected by the monitor.
"""

import numpy as np
import pytest

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data import synthetic_split
from raindrop_tpu.parallel.elastic import (
    FaultInjector,
    Heartbeat,
    HeartbeatMonitor,
    SimulatedFailure,
    run_elastic,
)
from raindrop_tpu.train import Trainer


def _setup():
    cfg = dataset_config("PAM", max_len=12, nlayers=1, nhead=1)
    split = synthetic_split("PAM", n=120, seed=0, T=12)
    tcfg = TrainConfig(dataset="PAM", num_epochs=4, learning_rate=1e-3,
                       batch_size=24, batching_strategy=3,
                       n_batches_strategy3=4, seed=3)
    return cfg, tcfg, split


def test_elastic_restart_matches_uninterrupted_run(tmp_path):
    cfg, tcfg, split = _setup()

    full = Trainer(cfg, tcfg).train_split(
        split, checkpoint_path=str(tmp_path / "full"), verbose=False)

    # crash at epoch 1 (after its checkpoint is durable), auto-restart
    result, restarts = run_elastic(
        Trainer(cfg, tcfg), split,
        checkpoint_path=str(tmp_path / "elastic"),
        fault_injector=FaultInjector([1]), max_restarts=2)

    assert restarts == 1
    assert [r["epoch"] for r in result.history] == [0, 1, 2, 3]
    for k in ("auroc", "auprc", "accuracy"):
        assert result.test_metrics[k] == pytest.approx(
            full.test_metrics[k], abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(result.params["mlp_static"]["lin0"]["w"]),
        np.asarray(full.params["mlp_static"]["lin0"]["w"]),
        rtol=1e-6, atol=1e-7)


def test_elastic_restart_before_first_checkpoint(tmp_path):
    """A death at epoch 0 restarts from scratch and still completes."""
    cfg, tcfg, split = _setup()
    result, restarts = run_elastic(
        Trainer(cfg, tcfg), split,
        checkpoint_path=str(tmp_path / "early"),
        fault_injector=FaultInjector([0]), max_restarts=2)
    # epoch 0's _last checkpoint is written BEFORE the hook fires, so the
    # restart resumes from epoch 1 — every epoch still runs exactly once
    assert restarts == 1
    assert [r["epoch"] for r in result.history] == [0, 1, 2, 3]


def test_elastic_exhausts_restarts(tmp_path):
    cfg, tcfg, split = _setup()
    with pytest.raises(SimulatedFailure):
        run_elastic(
            Trainer(cfg, tcfg), split,
            checkpoint_path=str(tmp_path / "dead"),
            fault_injector=FaultInjector([0, 1, 2, 3]), max_restarts=2)


def test_heartbeat_monitor_detects_staleness(tmp_path):
    d = str(tmp_path / "hb")
    hb0 = Heartbeat(d, process_id=0)
    hb1 = Heartbeat(d, process_id=1)
    hb0.beat(step=5)
    hb1.beat(step=5)
    mon = HeartbeatMonitor(d, timeout_s=60.0)
    assert mon.all_alive(2)
    assert mon.stale() == []

    import json
    import time as _t

    # two minutes with no beats: both processes flagged
    assert mon.stale(now=_t.time() + 120.0) == [0, 1]
    assert not mon.all_alive(2, now=_t.time() + 120.0)
    # process 0 goes silent (backdate its beat); process 1 keeps beating
    with open(hb0.path) as f:
        beat = json.load(f)
    beat["time"] -= 300.0
    with open(hb0.path, "w") as f:
        json.dump(beat, f)
    hb1.beat(step=7)
    assert mon.stale() == [0]
    assert not mon.all_alive(2)


def test_heartbeat_background_thread(tmp_path):
    d = str(tmp_path / "hb2")
    with Heartbeat(d, process_id=0, interval_s=0.05) as hb:
        import time as _t
        _t.sleep(0.2)
        hb.beat(step=3)
    beats = HeartbeatMonitor(d).read()
    assert len(beats) == 1
    assert beats[0]["step"] == 3
    assert beats[0]["count"] >= 3
