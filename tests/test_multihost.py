"""Multi-host input pipeline (parallel/multihost.py): deterministic
disjoint sampler shards, global-batch assembly from process-local data,
and per-host sharded checkpoint save/load — everything validatable in a
single process over the 8-virtual-device CPU mesh (true multi-process runs
exercise the same code paths; see the module docstring)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from raindrop_tpu.parallel import make_mesh
from raindrop_tpu.parallel.multihost import (
    global_batch,
    load_sharded_checkpoint,
    local_batch_indices,
    save_sharded_checkpoint,
    sharded_balanced_batches,
)


# ------------------------------------------------------------- sampler shards
def test_local_batch_indices_disjoint_cover():
    idx = np.arange(1000, 1128)
    shards = [local_batch_indices(idx, p, 8) for p in range(8)]
    assert all(len(s) == 16 for s in shards)
    flat = np.concatenate(shards)
    np.testing.assert_array_equal(flat, idx)          # disjoint + covering
    with pytest.raises(ValueError):
        local_batch_indices(np.arange(10), 0, 3)      # non-divisible


def test_sharded_balanced_batches_deterministic_disjoint():
    """Every 'process' draws the same seeded sampler; shard streams must be
    deterministic, mutually disjoint per batch, and their union must equal
    the unsharded stream."""
    y = (np.arange(200) % 4 == 0).astype(np.int64)    # 25% positives
    from raindrop_tpu.data.sampler import balanced_batches

    full = list(balanced_batches(y, 32, 2, np.random.default_rng(5),
                                 n_batches=4))
    per_proc = [list(sharded_balanced_batches(
        y, 32, 2, np.random.default_rng(5), n_batches=4,
        process_index=p, process_count=4)) for p in range(4)]
    # determinism across re-runs
    again = list(sharded_balanced_batches(
        y, 32, 2, np.random.default_rng(5), n_batches=4,
        process_index=2, process_count=4))
    for a, b in zip(per_proc[2], again):
        np.testing.assert_array_equal(a, b)
    for bi, gidx in enumerate(full):
        parts = [per_proc[p][bi] for p in range(4)]
        np.testing.assert_array_equal(np.concatenate(parts), gidx)


# ------------------------------------------------------------- global batches
def test_global_batch_equals_sharded_device_put():
    """Single-process: make_array_from_process_local_data must equal a
    plain sharded device_put of the same data (the multi-host path's
    degenerate case — the API contract the fleet relies on)."""
    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(0)
    local = {"P": rng.normal(size=(8, 6, 4)).astype(np.float32),
             "y": rng.integers(0, 2, size=(8,))}
    out = global_batch(mesh, local)
    for k, v in local.items():
        spec = P("data", *([None] * (v.ndim - 1)))
        want = jax.device_put(v, NamedSharding(mesh, spec))
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(want))
        assert out[k].sharding.is_equivalent_to(want.sharding, v.ndim)


def test_trainer_device_batch_idx_path():
    """Trainer._device_batch(idx=...) equals slicing then sharding."""
    from raindrop_tpu.config import TrainConfig, dataset_config
    from raindrop_tpu.data.datasets import synthetic_split
    from raindrop_tpu.train.trainer import Trainer

    cfg = dataset_config("P19", max_len=8)
    split = synthetic_split("P19", n=48, seed=0, T=8)
    tcfg = TrainConfig(dataset="P19", batch_size=8, num_epochs=1)
    tr = Trainer(cfg, tcfg, mesh=make_mesh(n_data=4, n_model=2))
    idx = np.asarray([3, 1, 4, 1, 5, 9, 2, 6])
    b = tr._device_batch(split.Ptrain, split.Ptrain_time,
                         split.Ptrain_static, split.ytrain, idx=idx)
    np.testing.assert_array_equal(np.asarray(b["P"]), split.Ptrain[idx])
    np.testing.assert_array_equal(np.asarray(b["y"]), split.ytrain[idx])


# --------------------------------------------------------- sharded checkpoints
def test_sharded_checkpoint_roundtrip(tmp_path):
    """Model-sharded params over an 8-device mesh: the shard file carries
    one entry per unique device shard plus replicated leaves, and reloads
    bit-identically."""
    from raindrop_tpu.parallel.mesh import shard_params
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.models.raindrop import raindrop_init

    mesh = make_mesh(n_data=4, n_model=2)
    cfg = dataset_config("P19", max_len=8)
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    host = jax.device_get(params)
    sharded = shard_params(mesh, params)

    path = str(tmp_path / "ckpt")
    fname = save_sharded_checkpoint(path, sharded)
    assert fname.endswith(".shard0-of1.npz")
    back = load_sharded_checkpoint(path, like=params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        host, back)


def test_sharded_checkpoint_detects_missing_coverage(tmp_path):
    """Deleting a shard's contribution must fail loudly, not reassemble
    silently-zero weights."""
    mesh = make_mesh(n_data=1, n_model=8)
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    arr = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
    path = str(tmp_path / "c2")
    save_sharded_checkpoint(path, {"w": arr})
    # corrupt: rewrite the file without one shard entry
    f = path + ".shard0-of1.npz"
    with np.load(f) as z:
        n_before = len(z.files)
        kept = {k: z[k] for k in z.files if not k.endswith("@0,7")}
    assert len(kept) == n_before - 1  # exactly one shard entry removed
    np.savez(f, **kept)
    with pytest.raises(ValueError, match="cover"):
        load_sharded_checkpoint(path)


# ---------------------------------------------------------- end-to-end (mesh)
def test_trainer_mesh_epoch_with_idx_batches():
    """One full mesh-sharded training epoch through the new idx-based batch
    path produces a finite loss and updated params."""
    from raindrop_tpu.config import TrainConfig, dataset_config
    from raindrop_tpu.data.datasets import synthetic_split
    from raindrop_tpu.train.trainer import Trainer

    cfg = dataset_config("P19", max_len=8)
    split = synthetic_split("P19", n=64, seed=1, T=8)
    tcfg = TrainConfig(dataset="P19", batch_size=8, num_epochs=1,
                       batching_strategy=2)
    tr = Trainer(cfg, tcfg, mesh=make_mesh(n_data=4, n_model=2))
    res = tr.train_split(split, seed=0, verbose=False)
    assert np.isfinite(res.test_metrics["auroc"])


def test_sharded_checkpoint_rejects_mixed_generations(tmp_path):
    """Shard files from runs with different process counts must not be
    silently merged (stale-generation corruption)."""
    mesh = make_mesh(n_data=1, n_model=8)
    x = jax.device_put(jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
                       NamedSharding(mesh, P(None, "model")))
    path = str(tmp_path / "c3")
    save_sharded_checkpoint(path, {"w": x})
    # simulate a stale file from an earlier 4-process run
    f0 = path + ".shard0-of1.npz"
    stale = path + ".shard0-of4.npz"
    import shutil
    shutil.copy(f0, stale)
    with pytest.raises(ValueError, match="mixed shard generations"):
        load_sharded_checkpoint(path)
    # a fresh save cleans the stale generation and load works again
    save_sharded_checkpoint(path, {"w": x})
    import os
    assert not os.path.exists(stale)
    out = load_sharded_checkpoint(path)
    np.testing.assert_array_equal(out["w"], np.asarray(jax.device_get(x)))
