"""Offline dataset preprocessing (L5) — raw PhysioNet text -> .npy artifacts.

Reimplements the reference's one-shot scripts as a reusable CLI
(reference P12data/process_scripts/: ParseData.py, IrregularSampling.py,
remove_outliers.py, Generate_splitID.py, sanity_check.py; PAMdata and
P19data splits follow the same 8:1:1 recipe), producing the exact artifact
schema the loaders consume:

  processed_data/arr_outcomes.npy    [N, 6] outcome table
  processed_data/ts_params.npy       36 time-series parameter names
  processed_data/static_params.npy / extended_static_params.npy
  processed_data/PTdict_list.npy     per-patient dicts {'id', 'static',
      'extended_static', 'arr' [215, 36], 'time' [215, 1], 'length'}
  splits/phy12_split{1..5}.npy       (idx_train, idx_val, idx_test)

Usage:
  python -m raindrop_tpu.data.preprocess parse   --raw P12data/rawdata --out P12data/processed_data
  python -m raindrop_tpu.data.preprocess splits  --n 11988 --out P12data/splits --prefix phy12_split
  python -m raindrop_tpu.data.preprocess sanity  --root P12data
  python -m raindrop_tpu.data.preprocess grud    --root P12data --out saved/
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np

# Static descriptor layout (reference ParseData.py:82, IrregularSampling.py:36)
STATIC_PARAMS = ["Age", "Gender", "Height", "ICUType", "Weight"]
EXTENDED_STATIC_PARAMS = ["Age", "Gender=0", "Gender=1", "Height",
                          "ICUType=1", "ICUType=2", "ICUType=3", "ICUType=4",
                          "Weight"]
# 12 blacklisted patients (reference remove_outliers.py:8; README.md:75)
P12_BLACKLIST = {"140501", "150649", "140936", "143656", "141264", "145611",
                 "142998", "147514", "142731", "150309", "155655", "156254"}
MAX_TMINS = 48 * 60            # 48h window (IrregularSampling.py:18)
P12_MAX_LEN = 215


def parse_outcomes(raw_dir: str) -> np.ndarray:
    """Outcomes-{a,b,c}.txt -> [N, 6] array (ParseData.py:7-37)."""
    import pandas as pd

    frames = []
    for s in "abc":
        path = os.path.join(raw_dir, f"Outcomes-{s}.txt")
        if os.path.exists(path):
            frames.append(pd.read_csv(path, sep=",", header=0,
                                      names=["RecordID", "SAPS-I", "SOFA",
                                             "Length_of_stay", "Survival",
                                             "In-hospital_death"]))
    return np.concatenate([np.array(f) for f in frames], axis=0)


def parse_patients(raw_dir: str, ts_params: Optional[List[str]] = None):
    """Per-patient record files -> P_list dicts (ParseData.py:88-122).

    When ts_params is None the parameter vocabulary is extracted from the
    data, excluding the 5 static fields (ParseData.py:59-75).
    """
    import pandas as pd

    set_dirs = sorted(d for d in os.listdir(raw_dir)
                      if d.startswith("set-")
                      and os.path.isdir(os.path.join(raw_dir, d)))
    records = []
    for d in set_dirs:
        for f in sorted(os.listdir(os.path.join(raw_dir, d))):
            if f.endswith(".txt"):
                records.append(os.path.join(raw_dir, d, f))

    if ts_params is None:
        vocab = set()
        for path in records:
            df = pd.read_csv(path, sep=",", header=1,
                             names=["time", "param", "value"])
            vocab.update(str(p) for p in df["param"].dropna())
        vocab -= set(STATIC_PARAMS) | {"nan"}
        ts_params = sorted(vocab)

    P_list = []
    for path in records:
        df = pd.read_csv(path, sep=",", header=1,
                         names=["time", "param", "value"])
        arr = np.array(df)
        static = tuple(arr[i, 2] for i in range(5))  # first 5 rows = statics
        ts_list = []
        for t, param, value in arr[5:]:
            if param in ts_params:
                hrs, mins = float(str(t)[0:2]), float(str(t)[3:5])
                ts_list.append((hrs, mins, 60.0 * hrs + mins, param, value))
        P_list.append({"id": os.path.splitext(os.path.basename(path))[0],
                       "static": static, "ts": ts_list})
    return P_list, ts_params


def extended_static(static) -> list:
    """One-hot Gender/ICUType (IrregularSampling.py:53-66)."""
    ext = [static[0], 0, 0, static[2], 0, 0, 0, 0, static[4]]
    if static[1] == 0:
        ext[1] = 1
    elif static[1] == 1:
        ext[2] = 1
    icu = static[3]
    if icu in (1, 2, 3, 4):
        ext[3 + int(icu)] = 1
    return ext


def irregular_sampling(P_list, ts_params, max_len: int = P12_MAX_LEN,
                       max_tmins: float = MAX_TMINS):
    """P_list -> PTdict_list dense arrays (IrregularSampling.py:40-89):
    unique timestamps under the 48h cap index the rows; multiple params at
    one timestamp share a row; later duplicates overwrite."""
    ts_index = {p: i for i, p in enumerate(ts_params)}
    F = len(ts_params)
    out = []
    for p in P_list:
        unq = []
        for s in p["ts"]:
            if s[2] < max_tmins and s[2] not in unq:
                unq.append(s[2])
        unq = np.asarray(unq)
        Parr = np.zeros((max_len, F))
        Tarr = np.zeros((max_len, 1))
        for hrs, mins, tmins, param, value in p["ts"]:
            if tmins < max_tmins:
                ti = int(np.where(unq == tmins)[0][0])
                Parr[ti, ts_index[param]] = value
                Tarr[ti, 0] = tmins
        out.append({"id": p["id"], "static": p["static"],
                    "extended_static": extended_static(p["static"]),
                    "arr": Parr, "time": Tarr, "length": len(unq)})
    return out


def remove_outliers(PTdict_list, arr_outcomes, blacklist=P12_BLACKLIST):
    """Drop blacklisted patients (remove_outliers.py:8-21)."""
    keep = [i for i, p in enumerate(PTdict_list)
            if str(p["id"]) not in blacklist]
    arr = np.empty(len(keep), dtype=object)
    arr[:] = [PTdict_list[i] for i in keep]
    return arr, arr_outcomes[keep]


def generate_splits(n: int, out_dir: str, prefix: str, n_splits: int = 5,
                    seed: Optional[int] = None):
    """5x random 8:1:1 permutation splits (Generate_splitID.py:1-21).

    Deviation: optional seed for reproducibility (the reference uses the
    unseeded global numpy RNG)."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_train, n_val = round(n * 0.8), round(n * 0.1)
    for j in range(n_splits):
        p = rng.permutation(n)
        # ragged tuple -> explicit object array (implicit ragged arrays were
        # removed in numpy >= 1.24; the artifact layout is unchanged)
        split = np.empty(3, dtype=object)
        split[0], split[1], split[2] = (p[:n_train],
                                        p[n_train:n_train + n_val],
                                        p[n_train + n_val:])
        np.save(os.path.join(out_dir, f"{prefix}{j + 1}.npy"), split,
                allow_pickle=True)


def sanity_check(root: str) -> dict:
    """Shape report of the processed artifacts (sanity_check.py:1-10)."""
    report = {}
    pd_dir = os.path.join(root, "processed_data")
    for name in os.listdir(pd_dir):
        if name.endswith(".npy"):
            a = np.load(os.path.join(pd_dir, name), allow_pickle=True)
            report[name] = getattr(a, "shape", None)
    return report


def grud_tensors(PTdict_list, stats=None):
    """Build GRU-D (x, mask, delta) tensors [N, 3, F, T]
    (reference GRU-D_data_preparation.py:55-200 df_to_x_m_d)."""
    arrs = np.stack([p["arr"] for p in PTdict_list])        # [N, T, F]
    times = np.stack([np.asarray(p["time"]).reshape(-1)
                      for p in PTdict_list]) / 60.0          # hours
    mask = (arrs > 0).astype(np.float32)
    from raindrop_tpu import native
    if native.available():
        delta = native.build_delta(mask, times)  # C++/OpenMP host kernel
    else:
        import jax.numpy as jnp

        from raindrop_tpu.baselines.grud import build_delta
        delta = np.asarray(build_delta(jnp.asarray(mask), jnp.asarray(times)))
    x = arrs.transpose(0, 2, 1)
    return np.stack([x, mask.transpose(0, 2, 1),
                     delta.transpose(0, 2, 1)], axis=1).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser("raindrop_tpu.data.preprocess")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("parse")
    p1.add_argument("--raw", required=True)
    p1.add_argument("--out", required=True)
    p1.add_argument("--max-len", type=int, default=P12_MAX_LEN)
    p2 = sub.add_parser("splits")
    p2.add_argument("--n", type=int, required=True)
    p2.add_argument("--out", required=True)
    p2.add_argument("--prefix", default="phy12_split")
    p2.add_argument("--seed", type=int, default=None)
    p3 = sub.add_parser("sanity")
    p3.add_argument("--root", required=True)
    p4 = sub.add_parser("grud")
    p4.add_argument("--root", required=True)
    p4.add_argument("--out", required=True)
    # Setting-2 sensor-ranking producer (the reference's standalone
    # code/baselines/RF_information_gain.py, which writes the
    # IG_density_scores_<ds>.npy files consumed at Raindrop.py:227-231)
    p5 = sub.add_parser("ig")
    p5.add_argument("--root", required=True, help="dataset root")
    # binary datasets only: the ranking scores one RF AUROC per sensor
    # (settings.py), undefined for PAM's 8 classes — the reference script
    # likewise only targets the binary sets
    p5.add_argument("--dataset", default="P12",
                    choices=["P12", "P19", "eICU"])
    p5.add_argument("--split", type=int, default=1)
    p5.add_argument("--out", required=True, help="output .npy ranking path")
    p5.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.cmd == "parse":
        os.makedirs(args.out, exist_ok=True)
        outcomes = parse_outcomes(args.raw)
        P_list, ts_params = parse_patients(args.raw)
        pt = irregular_sampling(P_list, ts_params, max_len=args.max_len)
        pt, outcomes = remove_outliers(pt, outcomes)
        np.save(os.path.join(args.out, "arr_outcomes.npy"), outcomes)
        np.save(os.path.join(args.out, "ts_params.npy"), ts_params)
        np.save(os.path.join(args.out, "static_params.npy"), STATIC_PARAMS)
        np.save(os.path.join(args.out, "extended_static_params.npy"),
                EXTENDED_STATIC_PARAMS)
        np.save(os.path.join(args.out, "PTdict_list.npy"), pt)
        print(f"wrote {len(pt)} patients, {len(ts_params)} params -> {args.out}")
    elif args.cmd == "splits":
        generate_splits(args.n, args.out, args.prefix, seed=args.seed)
        print(f"wrote 5 splits -> {args.out}")
    elif args.cmd == "sanity":
        for k, v in sanity_check(args.root).items():
            print(f"{k}: shape {v}")
    elif args.cmd == "grud":
        pt = np.load(os.path.join(args.root, "processed_data",
                                  "PTdict_list.npy"), allow_pickle=True)
        xmd = grud_tensors(pt)
        os.makedirs(args.out, exist_ok=True)
        np.save(os.path.join(args.out, "grud_dataset.npy"), xmd)
        print(f"wrote {xmd.shape} -> {args.out}/grud_dataset.npy")
    elif args.cmd == "ig":
        from raindrop_tpu.data.datasets import load_split
        from raindrop_tpu.data.settings import information_gain_ranking

        sp = load_split(args.root, args.dataset, args.split)
        F = sp.Ptrain.shape[2] // 2
        ranking = information_gain_ranking(sp.Ptrain[:, :, :F], sp.ytrain,
                                           seed=args.seed)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        np.save(args.out, ranking)
        print(f"wrote sensor ranking {ranking[:5]}... -> {args.out}")


if __name__ == "__main__":
    main()
