"""Preprocessing pipeline: synthetic raw PhysioNet text -> artifacts with
the reference schema, end-to-end through the CLI functions."""

import os

import numpy as np
import pytest

from raindrop_tpu.data.preprocess import (
    EXTENDED_STATIC_PARAMS,
    extended_static,
    generate_splits,
    grud_tensors,
    irregular_sampling,
    parse_outcomes,
    parse_patients,
    remove_outliers,
)


def _write_raw(tmp_path, n_patients=4):
    raw = tmp_path / "rawdata"
    (raw / "set-a").mkdir(parents=True)
    rng = np.random.default_rng(0)
    with open(raw / "Outcomes-a.txt", "w") as f:
        f.write("RecordID,SAPS-I,SOFA,Length_of_stay,Survival,In-hospital_death\n")
        for i in range(n_patients):
            f.write(f"{140000+i},10,5,{int(rng.integers(1,30))},-1,"
                    f"{int(rng.integers(0,2))}\n")
    for i in range(n_patients):
        pid = 140000 + i
        lines = ["Time,Parameter,Value",
                 "00:00,RecordID,%d" % pid,
                 "00:00,Age,%d" % rng.integers(20, 90),
                 "00:00,Gender,%d" % rng.integers(0, 2),
                 "00:00,Height,170",
                 "00:00,ICUType,%d" % rng.integers(1, 5),
                 "00:00,Weight,70"]
        # RecordID row is part of the 5 static rows in the real files; the
        # reference takes rows 0:5 after the header. Mimic the real layout:
        lines = ["Time,Parameter,Value",
                 "00:00,Age,%d" % rng.integers(20, 90),
                 "00:00,Gender,%d" % rng.integers(0, 2),
                 "00:00,Height,170",
                 "00:00,ICUType,%d" % rng.integers(1, 5),
                 "00:00,Weight,70"]
        for t in range(10):
            hh, mm = divmod(int(rng.integers(0, 50 * 60)), 60)
            param = rng.choice(["HR", "Temp", "Glucose"])
            lines.append(f"{hh:02d}:{mm:02d},{param},{rng.uniform(1, 100):.1f}")
        with open(raw / "set-a" / f"{pid}.txt", "w") as f:
            f.write("\n".join(lines) + "\n")
    return str(raw)


def test_parse_and_sample_end_to_end(tmp_path):
    pytest.importorskip("pandas")
    raw = _write_raw(tmp_path)
    outcomes = parse_outcomes(raw)
    assert outcomes.shape == (4, 6)
    P_list, ts_params = parse_patients(raw)
    assert len(P_list) == 4
    assert set(ts_params) <= {"HR", "Temp", "Glucose"}
    pt = irregular_sampling(P_list, ts_params, max_len=30)
    assert pt[0]["arr"].shape == (30, len(ts_params))
    assert pt[0]["time"].shape == (30, 1)
    assert len(pt[0]["extended_static"]) == len(EXTENDED_STATIC_PARAMS)
    # 48h cap: no timestamp at/over 2880 minutes survives
    assert all(p["time"].max() < 48 * 60 for p in pt)
    # observations landed where their timestamps are
    lengths = [p["length"] for p in pt]
    assert all(0 < l <= 30 for l in lengths)

    pt2, out2 = remove_outliers(pt, outcomes, blacklist={str(140001)})
    assert len(pt2) == 3 and out2.shape[0] == 3

    xmd = grud_tensors(pt2)
    assert xmd.shape == (3, 3, len(ts_params), 30)


def test_extended_static_one_hot():
    ext = extended_static((45.0, 1, 170.0, 3, 80.0))
    assert ext == [45.0, 0, 1, 170.0, 0, 0, 1, 0, 80.0]
    ext2 = extended_static((45.0, 0, 170.0, -1, 80.0))   # unknown ICU type
    assert ext2[1] == 1 and sum(ext2[4:8]) == 0


def test_generate_splits(tmp_path):
    generate_splits(100, str(tmp_path), "test_split", seed=0)
    tr, va, te = np.load(tmp_path / "test_split1.npy", allow_pickle=True)
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    assert len(set(tr) | set(va) | set(te)) == 100
    assert len(list(tmp_path.glob("test_split*.npy"))) == 5


def test_ig_ranking_cli(tmp_path):
    """The Setting-2 sensor-ranking producer CLI (the reference's
    standalone RF_information_gain.py) writes a valid permutation."""
    import numpy as np
    from raindrop_tpu.data.datasets import synthetic_raw
    from raindrop_tpu.data.preprocess import main as pp_main

    P, y = synthetic_raw("P19", 60, 0, T=8)  # binary labels (Setting 2)
    d = tmp_path / "processed_data"
    d.mkdir(parents=True)
    np.save(d / "PT_dict_list_6.npy", P)
    np.save(d / "arr_outcomes_6.npy",
            y.reshape(-1, 1).astype(np.float64))
    s = tmp_path / "splits"
    s.mkdir()
    n = len(y)
    perm = np.random.default_rng(0).permutation(n)
    np.save(s / "phy19_split1_new.npy",
            np.array([perm[:48], perm[48:54], perm[54:]], dtype=object),
            allow_pickle=True)
    out = str(tmp_path / "ig.npy")
    pp_main(["ig", "--root", str(tmp_path), "--dataset", "P19",
             "--out", out])
    ranking = np.load(out)
    assert sorted(ranking.tolist()) == list(range(34))
