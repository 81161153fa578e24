"""Global-structure utilities and the mTAND ragged-record collate stack,
verified against direct torch transcriptions of the reference semantics
(code/Raindrop.py:35-55, code/utils_rd.py:260-265,
code/baselines/mTAND/utils.py:51-66,569-622, mTAND/physionet.py:10-44)."""

import numpy as np
import pytest
import torch

from raindrop_tpu.data import (
    data_min_max,
    records_from_dense,
    variable_time_collate,
)
from raindrop_tpu.graph import diffuse, generate_global_structure, masked_softmax


# ---- torch oracles (independent transcriptions of the reference math) ----

def torch_masked_softmax(A, epsilon=1e-9):
    A_max = torch.max(A, dim=1, keepdim=True)[0]
    A_exp = torch.exp(A - A_max) * (A != 0).float()
    return A_exp / (torch.sum(A_exp, dim=0, keepdim=True) + epsilon)


def torch_global_structure(data, K, n_sensors):
    from sklearn.metrics.pairwise import cosine_similarity

    obs = data[:, :, :n_sensors]
    sims = torch.zeros(obs.shape[0], n_sensors, n_sensors)
    for row in range(obs.shape[0]):
        sims[row] = torch.from_numpy(
            cosine_similarity(obs[row].T.numpy()))
    ave = sims.mean(dim=0)
    index = torch.argsort(ave, dim=0, stable=True)
    gs = (index < K) * ave
    return torch_masked_softmax(gs)


def torch_diffuse(unit, N=10):
    n_time = unit.shape[-1]
    keep = n_time // N - 1
    return torch.max(unit[:, :keep * N].reshape([-1, keep, N]), dim=-1).values


def torch_collate(batch, data_min, data_max):
    """variable_time_collate_fn + normalize_masked_data, classify=True."""
    D = batch[0][2].shape[1]
    maxlen = max(ex[1].shape[0] for ex in batch)
    tt = torch.zeros(len(batch), maxlen)
    vals = torch.zeros(len(batch), maxlen, D)
    mask = torch.zeros(len(batch), maxlen, D)
    labels = torch.zeros(len(batch))
    for b, (_, t, v, m, y) in enumerate(batch):
        n = t.shape[0]
        tt[b, :n] = t
        vals[b, :n] = v
        mask[b, :n] = m
        labels[b] = y
    att_max = data_max.clone()
    att_max[att_max == 0.0] = 1.0
    vals = (vals - data_min) / att_max
    vals[mask == 0] = 0
    if torch.max(tt) != 0.0:
        tt = tt / torch.max(tt)
    return torch.cat([vals, mask, tt.unsqueeze(-1)], dim=2), labels


# ------------------------------- tests ------------------------------------

def test_masked_softmax_matches_reference_axis_quirk():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(7, 7)).astype(np.float32)
    A[rng.uniform(size=A.shape) < 0.3] = 0.0
    got = masked_softmax(A)
    want = torch_masked_softmax(torch.from_numpy(A)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("compat", [True, False])
def test_generate_global_structure(compat):
    rng = np.random.default_rng(1)
    F, N, T = 9, 12, 20
    data = rng.normal(size=(N, T, F)).astype(np.float32)
    data[rng.uniform(size=data.shape) < 0.5] = 0.0
    got = generate_global_structure(data, K=4, n_sensors=F, compat=compat)
    if compat:
        want = torch_global_structure(torch.from_numpy(data), 4, F).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    else:
        # intended semantics: exactly K nonzero (kept) entries per column
        # wherever similarities are distinct
        assert got.shape == (F, F)
        assert ((got != 0).sum(axis=0) <= 4).all()


def test_diffuse_matches_reference():
    rng = np.random.default_rng(2)
    unit = rng.normal(size=(5, 63)).astype(np.float32)
    got = diffuse(unit, N=10)
    want = torch_diffuse(torch.from_numpy(unit), N=10).numpy()
    assert got.shape == (5, 5)
    np.testing.assert_allclose(got, want)


def test_ragged_records_and_min_max():
    rng = np.random.default_rng(3)
    N, T, D = 6, 15, 4
    times = np.cumsum(rng.uniform(0.1, 1, size=(N, T)), 1).astype(np.float32)
    lengths = rng.integers(3, T, size=N)
    for i in range(N):
        times[i, lengths[i]:] = 0.0
    vals = rng.normal(size=(N, T, D)).astype(np.float32)
    vals[rng.uniform(size=vals.shape) < 0.4] = 0.0
    for i in range(N):
        vals[i, lengths[i]:] = 0.0
    labels = rng.integers(0, 2, size=N)

    recs = records_from_dense(vals, times, labels)
    assert [r.tt.shape[0] for r in recs] == list(lengths)
    dmin, dmax = data_min_max(recs)
    flat = np.concatenate([np.where(v != 0, v, np.nan).reshape(-1, D)
                           for v in [vals[i, :lengths[i]] for i in range(N)]])
    np.testing.assert_allclose(dmin, np.nanmin(flat, 0), rtol=1e-6)
    np.testing.assert_allclose(dmax, np.nanmax(flat, 0), rtol=1e-6)


def test_variable_time_collate_matches_torch_oracle():
    rng = np.random.default_rng(4)
    N, T, D = 8, 12, 5
    times = np.cumsum(rng.uniform(0.1, 1, size=(N, T)), 1).astype(np.float32)
    lengths = rng.integers(2, T, size=N)
    for i in range(N):
        times[i, lengths[i]:] = 0.0
    vals = np.abs(rng.normal(size=(N, T, D))).astype(np.float32)
    vals[rng.uniform(size=vals.shape) < 0.4] = 0.0
    for i in range(N):
        vals[i, lengths[i]:] = 0.0
    labels = rng.integers(0, 2, size=N)

    recs = records_from_dense(vals, times, labels)
    dmin, dmax = data_min_max(recs)
    got, got_y = variable_time_collate(recs, dmin, dmax)

    batch = [(r.record_id, torch.from_numpy(r.tt), torch.from_numpy(r.vals),
              torch.from_numpy(r.mask), float(r.label)) for r in recs]
    want, want_y = torch_collate(batch, torch.from_numpy(dmin),
                                 torch.from_numpy(dmax))
    assert got.shape == tuple(want.shape) == (N, lengths.max(), 2 * D + 1)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got_y, want_y.numpy().astype(np.int64))


def test_collate_feeds_mtand_native():
    """The collate output [B, L, 2D+1] is exactly the mTAND model input
    (reference mTAND/utils.py:616-617: values ‖ mask ‖ scaled time)."""
    import jax
    import jax.numpy as jnp

    from raindrop_tpu.baselines.mtand import mtand_apply, mtand_init

    rng = np.random.default_rng(6)
    N, T, D = 8, 10, 3
    recs = records_from_dense(
        np.abs(rng.normal(size=(N, T, D))).astype(np.float32),
        np.cumsum(rng.uniform(0.1, 1, size=(N, T)), 1).astype(np.float32),
        rng.integers(0, 2, size=N))
    combined, y = variable_time_collate(recs)
    params = mtand_init(jax.random.PRNGKey(0), 2 * D, nhidden=8,
                        embed_time=16, n_classes=2)
    logits, _ = mtand_apply(params, jnp.asarray(combined[..., :2 * D]),
                            jnp.asarray(combined[..., -1]))
    assert logits.shape == (N, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_collate_static_max_len():
    rng = np.random.default_rng(5)
    recs = records_from_dense(
        np.abs(rng.normal(size=(4, 10, 3))).astype(np.float32),
        np.cumsum(rng.uniform(0.1, 1, size=(4, 10)), 1).astype(np.float32),
        np.zeros(4, np.int64))
    out, _ = variable_time_collate(recs, max_len=16)
    assert out.shape == (4, 16, 7)
