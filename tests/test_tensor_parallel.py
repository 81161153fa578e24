"""Distributed tier: Megatron-style tensor-parallel param sharding over the
'model' mesh axis must be numerically identical to pure-DP and single-device
training (SURVEY.md §4 distributed tests; the reference has no model
parallelism at all — SURVEY.md §2.5)."""

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from raindrop_tpu.config import TrainConfig, dataset_config
from raindrop_tpu.data import synthetic_split
from raindrop_tpu.parallel import make_mesh
from raindrop_tpu.parallel.mesh import shard_params, tensor_parallel_specs
from raindrop_tpu.train import Trainer


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


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_dp_tp_step_matches_single_device(shape):
    cfg = dataset_config("P19", max_len=8)
    tcfg = TrainConfig(dataset="P19", batch_size=8, num_epochs=1,
                       batching_strategy=2)
    split = synthetic_split("P19", n=32, seed=0, T=8)
    idx = np.arange(8)

    loss_1, logits_1, params_1 = _one_step(None, cfg, tcfg, split, idx)
    mesh = make_mesh(n_data=shape[0], n_model=shape[1])
    loss_m, logits_m, params_m = _one_step(mesh, cfg, tcfg, split, idx)

    assert np.isfinite(loss_m)
    np.testing.assert_allclose(loss_m, loss_1, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(logits_m, logits_1, rtol=2e-4, atol=2e-4)
    flat_1 = jax.tree.leaves(params_1)
    flat_m = jax.tree.leaves(params_m)
    for a, b in zip(flat_1, flat_m):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_tensor_parallel_specs_shard_the_hot_matmuls():
    cfg = dataset_config("P19", max_len=8)
    from raindrop_tpu.models.raindrop import raindrop_init
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    specs = tensor_parallel_specs(params, n_model=2)

    t0 = specs["transformer_encoder"]["layer0"]
    assert t0["lin1"]["w"] == P("model", None)        # column-parallel FFN in
    assert t0["lin2"]["w"] == P(None, "model")        # row-parallel FFN out
    assert t0["in_proj_w"] == P("model", None)
    assert t0["out_proj"]["w"] == P(None, "model")
    assert specs["ob_propagation"]["lin_value"]["w"] == P("model", None)
    # indivisible / small leaves stay replicated
    assert specs["R_u"] == P()
    assert specs["mlp_static"]["lin0"]["w"] == P()
    assert specs["mlp_static"]["lin1"]["w"] == P()  # head MLP, not FFN lin1


def test_tensor_parallel_specs_replicate_when_indivisible():
    # odd dims can never split over model=2 -> everything replicated
    leaf = {"lin1": {"w": np.zeros((7, 5)), "b": np.zeros((7,))}}
    specs = tensor_parallel_specs(leaf, n_model=2)
    assert specs["lin1"]["w"] == P()
    assert specs["lin1"]["b"] == P()
