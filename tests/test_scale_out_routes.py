"""Product routes for the scale-out slots (round-5): --context-parallel
(sp/ring), --pipeline-microbatches, --edge-partition must train the
FLAGSHIP model through the Trainer and match the single-device step
exactly (dropout 0 -> same math, different schedule; fp tolerance for
collective reduction order)."""

import numpy as np
import pytest

import jax

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data import synthetic_split
from raindrop_tpu.parallel import make_mesh
from raindrop_tpu.parallel.mesh import shard_params
from raindrop_tpu.train import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


def _one_step(mesh, cfg, tcfg, split, idx):
    trainer = Trainer(cfg, tcfg, mesh=mesh)
    params = trainer._init(jax.random.PRNGKey(0))
    if mesh is not None:
        params = shard_params(mesh, params)
    opt_state = trainer.optimizer.init(params)
    batch = trainer._device_batch(
        split.Ptrain[idx], split.Ptrain_time[idx],
        split.Ptrain_static[idx], split.ytrain[idx])
    params, opt_state, loss, logits = trainer._train_step(
        params, opt_state, batch, jax.random.PRNGKey(1))
    return float(loss), np.asarray(jax.device_get(logits)), jax.device_get(params)


@pytest.fixture(scope="module")
def setup():
    # dropout 0: every backend computes identical math (dropout streams
    # legitimately differ between attention backends)
    cfg = dataset_config("P19", max_len=8, dropout=0.0)
    split = synthetic_split("P19", n=32, seed=0, T=8)
    idx = np.arange(8)
    tcfg0 = TrainConfig(dataset="P19", batch_size=8, num_epochs=1,
                        batching_strategy=2)
    ref = _one_step(None, cfg, tcfg0, split, idx)
    return cfg, split, idx, tcfg0, ref


def _assert_matches(got, ref):
    loss_1, logits_1, params_1 = ref
    loss_n, logits_n, params_n = got
    assert np.isclose(loss_n, loss_1, rtol=2e-4), (loss_n, loss_1)
    np.testing.assert_allclose(logits_n, logits_1, rtol=1e-3, atol=1e-4)
    for (p1, l1), (pn, ln) in zip(
            jax.tree_util.tree_leaves_with_path(params_1),
            jax.tree_util.tree_leaves_with_path(params_n)):
        np.testing.assert_allclose(np.asarray(ln), np.asarray(l1),
                                   rtol=1e-3, atol=1e-4, err_msg=str(p1))


@pytest.mark.parametrize("impl", ["sp", "ring"])
def test_context_parallel_step_matches_single_device(setup, impl):
    """--context-parallel sp|ring: temporal attention sharded on T over
    'model' == the single-device dense step."""
    cfg, split, idx, tcfg0, ref = setup
    import dataclasses
    tcfg = dataclasses.replace(tcfg0, context_parallel=impl)
    got = _one_step(make_mesh(2, 4), cfg, tcfg, split, idx)
    _assert_matches(got, ref)


def test_edge_partition_step_matches_single_device(setup):
    """--edge-partition: propagation edges sharded over 'model' with
    psum/pmax combines == the single-device dense step."""
    cfg, split, idx, tcfg0, ref = setup
    import dataclasses
    tcfg = dataclasses.replace(tcfg0, edge_partition=True)
    got = _one_step(make_mesh(4, 2), cfg, tcfg, split, idx)
    _assert_matches(got, ref)


def test_pipeline_step_matches_single_device(setup):
    """--pipeline-microbatches: encoder layers as GPipe stages over
    'model' (one per layer) == the single-device step."""
    cfg, split, idx, tcfg0, ref = setup
    import dataclasses
    tcfg = dataclasses.replace(tcfg0, pipeline_microbatches=2)
    got = _one_step(make_mesh(4, 2), cfg, tcfg, split, idx)
    _assert_matches(got, ref)


def test_context_parallel_full_protocol(setup):
    """A full train_split through the CP route trains to the same quality
    band as the unsharded trainer. (Bitwise step equivalence is asserted
    above; over multiple optimization steps ~1e-6 collective-reduction
    differences compound chaotically, so end-of-training metrics on a
    16-sample test set can legitimately differ by a rank flip — this test
    checks the ROUTE trains, not bit-stability of a chaotic system.)"""
    cfg, _, _, tcfg0, _ = setup
    import dataclasses
    split = synthetic_split("P19", n=160, seed=3, T=8)
    tcfg = dataclasses.replace(tcfg0, context_parallel="sp", num_epochs=2)
    r1 = Trainer(cfg, tcfg0, mesh=None).train_split(split, verbose=False)
    rn = Trainer(cfg, tcfg, mesh=make_mesh(2, 4)).train_split(
        split, verbose=False)
    assert rn.test_metrics["auroc"] >= 0.75, rn.test_metrics
    assert r1.test_metrics["auroc"] >= 0.75, r1.test_metrics
    assert np.isfinite(rn.history[-1]["train_loss"])


def test_scale_out_flags_require_mesh():
    cfg = dataset_config("P19", max_len=8)
    tcfg = TrainConfig(dataset="P19", context_parallel="sp")
    with pytest.raises(ValueError, match="mesh"):
        Trainer(cfg, tcfg)


def test_dropout_training_is_finite_under_cp():
    """With dropout active the CP route uses the sharding-invariant hash
    stream — different stream than dense (by construction), but training
    must run and stay finite."""
    cfg = dataset_config("P19", max_len=8, dropout=0.3)
    split = synthetic_split("P19", n=32, seed=0, T=8)
    tcfg = TrainConfig(dataset="P19", batch_size=8, num_epochs=1,
                       batching_strategy=2, context_parallel="ring")
    res = Trainer(cfg, tcfg, mesh=make_mesh(2, 4)).train_split(
        split, verbose=False)
    assert np.isfinite(res.history[-1]["train_loss"])
