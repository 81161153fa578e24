"""Data layer: normalization parity vs a direct loop transcription of the
reference semantics, settings transforms, balanced sampler."""

import numpy as np
import pytest

from raindrop_tpu.data import (
    balanced_batches,
    get_stats,
    get_stats_static,
    mask_normalize,
    mask_normalize_static,
    n_batches_per_epoch,
    remove_sensors_fixed,
    remove_sensors_random,
    synthetic_split,
    demographic_indices,
)


def _loop_stats(P):
    """Literal per-feature loop with the reference's formulas
    (code/utils_rd.py:149-161) as an oracle."""
    N, T, F = P.shape
    Pf = P.transpose(2, 0, 1).reshape(F, -1)
    mf, stdf = np.zeros(F), np.ones(F)
    for f in range(F):
        v = Pf[f]
        v = v[v > 0]
        mf[f] = np.mean(v)
        stdf[f] = max(np.std(v), 1e-7)
    return mf, stdf


def test_stats_match_reference_loop(rng_np):
    P = np.abs(rng_np.normal(2.0, 1.0, size=(50, 12, 7)))
    P *= rng_np.uniform(size=P.shape) > 0.5
    mf, stdf = get_stats(P)
    mf2, stdf2 = _loop_stats(P)
    np.testing.assert_allclose(mf, mf2, rtol=1e-12)
    np.testing.assert_allclose(stdf, stdf2, rtol=1e-12)


def test_mask_normalize_semantics(rng_np):
    P = np.abs(rng_np.normal(2.0, 1.0, size=(20, 8, 5)))
    obs = rng_np.uniform(size=P.shape) > 0.4
    P = P * obs
    mf, stdf = get_stats(P)
    out = mask_normalize(P, mf, stdf)
    assert out.shape == (20, 8, 10)
    # missing entries zeroed, mask columns binary
    np.testing.assert_array_equal(out[:, :, :5][P <= 0], 0.0)
    np.testing.assert_array_equal(out[:, :, 5:], (P > 0).astype(float))
    # observed entries z-scored
    i = np.argwhere(P > 0)[0]
    expect = (P[tuple(i)] - mf[i[2]]) / (stdf[i[2]] + 1e-18)
    assert out[i[0], i[1], i[2]] == pytest.approx(expect)


def test_static_compat_reproduces_reference_bug(rng_np):
    """compat=True must yield ms=0/ss=1 (the reference's list==0 bug,
    code/utils_rd.py:195) so normalization reduces to relu."""
    Ps = rng_np.normal(1.0, 2.0, size=(30, 9))
    ms, ss = get_stats_static(Ps, "P12", compat=True)
    np.testing.assert_array_equal(ms, 0.0)
    np.testing.assert_array_equal(ss, 1.0)
    out = mask_normalize_static(Ps, ms, ss)
    np.testing.assert_allclose(out, np.maximum(Ps / (1 + 1e-18), 0.0), atol=1e-12)
    # fixed path: continuous features actually normalized
    ms2, ss2 = get_stats_static(Ps, "P12", compat=False)
    assert not np.allclose(ms2, 0.0)


def test_remove_sensors_fixed():
    P = np.ones((4, 3, 10))  # F=5 + mask 5
    out = remove_sensors_fixed(P, np.array([3, 1, 0, 2, 4]), missing_ratio=0.4)
    assert np.all(out[:, :, [3, 1]] == 0)
    assert np.all(out[:, :, [0, 2, 4]] == 1)
    assert np.all(out[:, :, 5:] == 1)  # mask columns untouched (reference quirk)
    assert np.all(P[:, :, 3] == 1)     # input not mutated


def test_remove_sensors_random(rng_np):
    P = np.ones((6, 3, 8))  # F=4
    out = remove_sensors_random(P, 0.5, rng_np)
    zeroed = (out[:, 0, :4] == 0).sum(axis=1)
    np.testing.assert_array_equal(zeroed, 2)  # round(0.5*4) per sample
    # different samples get different subsets (with high probability)
    patterns = {tuple(out[i, 0, :4]) for i in range(6)}
    assert len(patterns) > 1


def test_balanced_sampler_strategy2(rng_np):
    y = np.array([0] * 80 + [1] * 10)
    nb = n_batches_per_epoch(y, 20, 2)
    assert nb == min(80 // 10, 30 // 10)
    batches = list(balanced_batches(y, 20, 2, rng_np))
    assert len(batches) == nb
    for b in batches:
        assert len(b) == 20
        assert (y[b] == 1).sum() == 10  # half positives via 3x expansion
    # strategy 3: uniform without replacement
    b3 = list(balanced_batches(y, 16, 3, rng_np, n_batches=5))
    assert len(b3) == 5 and all(len(np.unique(b)) == 16 for b in b3)


def test_sampler_sharding_disjoint_deterministic():
    y = np.array([0] * 64 + [1] * 64)
    full = list(balanced_batches(y, 32, 2, np.random.default_rng(7)))
    shards = [list(balanced_batches(y, 32, 2, np.random.default_rng(7),
                                    shard_id=s, num_shards=4))
              for s in range(4)]
    for i, b in enumerate(full):
        got = np.concatenate([shards[s][i] for s in range(4)])
        np.testing.assert_array_equal(got, b)  # same seed => same global batch


def test_synthetic_split_shapes():
    sp = synthetic_split("P19", n=60, seed=0, T=12)
    assert sp.Ptrain.shape == (48, 12, 68)       # 2*34 channels
    assert sp.Ptrain_static.shape == (48, 6)
    assert sp.Ptrain_time.shape == (48, 12)
    assert sp.yval.shape == (6,) and sp.ytest.shape == (6,)
    # times are hours and padded tail is zero
    assert sp.Ptrain_time.max() <= 48.0 + 1e-6
    sp2 = synthetic_split("PAM", n=40, seed=0, T=16)
    assert sp2.Ptrain_static is None
    assert sp2.Ptrain.shape == (32, 16, 34)


def test_demographic_indices():
    statics = np.zeros((6, 9))
    statics[:, 0] = [30, 70, 0, 64, 65, 80]       # ages (0 = unknown)
    statics[:, 1] = [1, 0, 1, 0, 1, 0]            # Gender=0 (female)
    statics[:, 2] = [0, 1, 0, 1, 0, 1]            # Gender=1 (male)
    under, over = demographic_indices(statics, "P12", "age")
    np.testing.assert_array_equal(under, [0, 3])
    np.testing.assert_array_equal(over, [1, 4, 5])
    male, female = demographic_indices(statics, "P12", "gender")
    np.testing.assert_array_equal(male, [1, 3, 5])
    np.testing.assert_array_equal(female, [0, 2, 4])


def test_time_lengths_full_sample_with_zero_first_timestamp():
    """A fully-observed sample whose only zero timestamp is the legitimate
    t=0 first observation must get length T (the reference crashes with
    IndexError there; returning 0 would silently skip imputing it —
    round-3 review finding)."""
    from raindrop_tpu.data.imputation import _time_lengths, mean_imputation

    X_time = np.array([
        [0.0, 1.0, 2.0, 3.0],    # full-length, starts at t=0
        [0.5, 1.0, 0.0, 0.0],    # padded after 2 steps
        [0.0, 1.0, 0.0, 0.0],    # starts at t=0, padded after 2 steps
        [1.0, 2.0, 3.0, 4.0],    # full-length, no zeros
    ])
    np.testing.assert_array_equal(_time_lengths(X_time), [4, 2, 2, 4])
    # and the full-length t0=0 sample actually gets imputed
    X = np.zeros((1, 4, 2))
    X[0, 1, 0] = 5.0  # one observation; the rest missing in-range
    out = mean_imputation(X, X_time[:1], np.array([9.0, 7.0]))
    assert out[0, 0, 0] == 9.0 and out[0, 3, 1] == 7.0
