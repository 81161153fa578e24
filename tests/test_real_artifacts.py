"""Integration against the reference's REAL shipped data artifacts.

The big PTdict_list.npy tensors live on figshare and are not in the repo,
but the reference ships everything else: raw P12 outcome files, processed
outcome arrays, 5 frozen split-index files per dataset, the Setting-2
information-gain sensor rankings, the Setting-4 demographic index files,
and the golden result arrays. These tests run raindrop_tpu's pipeline
against those actual files (read-only) — real-data validation, not
synthetic-schema validation.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")


def test_parse_outcomes_reproduces_shipped_artifact():
    """parse_outcomes on the real Outcomes-{a,b,c}.txt + the outlier
    blacklist reproduce processed_data/arr_outcomes.npy EXACTLY
    (reference ParseData.py:28-37 + remove_outliers.py:8-21)."""
    from raindrop_tpu.data.preprocess import P12_BLACKLIST, parse_outcomes

    raw = parse_outcomes(os.path.join(REF, "P12data/rawdata"))
    assert raw.shape == (12000, 6)
    keep = ~np.isin(raw[:, 0].astype(int).astype(str), list(P12_BLACKLIST))
    filt = raw[keep].astype(np.int64)
    ref = np.load(os.path.join(REF, "P12data/processed_data/arr_outcomes.npy"),
                  allow_pickle=True).astype(np.int64)
    np.testing.assert_array_equal(filt, ref)


def test_param_vocabularies_match_shipped():
    """Our static/extended-static vocabularies match the shipped
    {static,extended_static,ts}_params.npy files."""
    from raindrop_tpu.data.preprocess import STATIC_PARAMS

    proc = os.path.join(REF, "P12data/processed_data")
    static = np.load(os.path.join(proc, "static_params.npy"), allow_pickle=True)
    assert list(static) == list(STATIC_PARAMS)
    ext = np.load(os.path.join(proc, "extended_static_params.npy"),
                  allow_pickle=True)
    assert list(ext) == ["Age", "Gender=0", "Gender=1", "Height", "ICUType=1",
                         "ICUType=2", "ICUType=3", "ICUType=4", "Weight"]
    ts = np.load(os.path.join(proc, "ts_params.npy"), allow_pickle=True)
    assert len(ts) == 36  # F for P12 (code/Raindrop.py:110)


@pytest.mark.parametrize("ds,pattern,n_total", [
    ("P12data", "phy12_split{k}.npy", 11988),
    ("P19data", "phy19_split{k}_new.npy", 38803),
    ("PAMdata", "PAM_split_{k}.npy", 5333),
])
def test_real_split_files_are_8_1_1_partitions(ds, pattern, n_total):
    """The 5 frozen split files (Setting 1) are disjoint 8:1:1 partitions of
    the full index range — the loader's assumptions hold on the real files
    (reference Generate_splitID.py, utils_rd.py:103-105)."""
    for k in range(1, 6):
        path = os.path.join(REF, ds, "splits", pattern.format(k=k))
        if not os.path.exists(path):
            pytest.skip(f"{path} not shipped")
        tr, va, te = np.load(path, allow_pickle=True)
        tr, va, te = np.asarray(tr), np.asarray(va), np.asarray(te)
        n = len(tr) + len(va) + len(te)
        assert n == n_total
        assert len(tr) == int(0.8 * n_total)
        allidx = np.concatenate([tr, va, te])
        assert len(np.unique(allidx)) == n  # disjoint, full cover
        assert allidx.min() == 0 and allidx.max() == n_total - 1


def test_information_gain_rankings_drive_setting2():
    """The real Setting-2 sensor rankings ([F, 2] of (index, name), consumed
    via column 0 — reference code/Raindrop.py:228-229) are permutations, and
    remove_sensors_fixed zeroes exactly the top-ranked sensors."""
    from raindrop_tpu.data.settings import remove_sensors_fixed

    saved = os.path.join(REF, "code/baselines/saved")
    for name, F in [("IG_density_scores_P12.npy", 36),
                    ("IG_density_scores_P19.npy", 34),
                    ("IG_density_scores_PAM.npy", 17)]:
        ranking = np.load(os.path.join(saved, name), allow_pickle=True)
        idx = ranking[:, 0].astype(int)
        assert sorted(idx.tolist()) == list(range(F))  # a permutation

        P = np.ones((3, 4, 2 * F), np.float32)
        n_missing = round(0.3 * F)
        out = remove_sensors_fixed(P, idx, 0.3)
        zeroed = np.where(np.all(out[:, :, :F] == 0, axis=(0, 1)))[0]
        np.testing.assert_array_equal(np.sort(idx[:n_missing]), zeroed)


def test_demographic_indices_consumable():
    """Setting-4 group index files partition the P19 cohort."""
    saved = os.path.join(REF, "code/baselines/saved")
    male = np.load(os.path.join(saved, "P19_idx_male.npy"), allow_pickle=True)
    female = np.load(os.path.join(saved, "P19_idx_female.npy"), allow_pickle=True)
    assert len(np.intersect1d(male, female)) == 0
    under = np.load(os.path.join(saved, "P19_idx_under_65.npy"), allow_pickle=True)
    over = np.load(os.path.join(saved, "P19_idx_over_65.npy"), allow_pickle=True)
    assert len(np.intersect1d(under, over)) == 0
    assert len(under) + len(over) <= 38803


def test_load_split_indices_on_real_files():
    """datasets.load_split_indices consumes the real split files by their
    actual on-disk naming (phy12_split{k} / phy19_split{k}_new / PAM_split_{k})."""
    from raindrop_tpu.data.datasets import load_split_indices

    for base, ds in [("P12data", "P12"), ("P19data", "P19"),
                     ("PAMdata", "PAM")]:
        tr, va, te = load_split_indices(os.path.join(REF, base), ds, 1)
        assert len(tr) > len(va) and len(tr) > len(te)
        assert len(np.intersect1d(tr, va)) == 0


def test_golden_results_match_baseline_md():
    """The golden result arrays (code/results/*.npy) hold the numbers
    recorded in BASELINE.md — the regression fixture the metric parity
    work targets."""
    res = np.load(os.path.join(REF, "code/results/standard_phy12.npy"),
                  allow_pickle=True)
    acc, auprc, auroc = np.asarray(res, dtype=float)
    np.testing.assert_allclose(np.mean(acc), 74.6, atol=0.05)
    np.testing.assert_allclose(np.mean(auprc), 47.8, atol=0.05)
    np.testing.assert_allclose(np.mean(auroc), 80.7, atol=0.05)
