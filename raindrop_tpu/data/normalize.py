"""Host-side normalization with exact reference semantics, vectorized.

The reference normalizes with per-feature Python loops over numpy views
(reference code/utils_rd.py:149-257). Here every op is a single vectorized
numpy expression — same numbers, no loops — because this runs on the host
per split (once), then the arrays are device_put to the TPU.

Conventions preserved (see SURVEY.md §2.1):
  * a value is "observed" iff it is > 0 (code/utils_rd.py:157,168);
  * z-score with train-split stats, then missing entries re-zeroed, then the
    observed mask is concatenated -> [N, T, 2F] (code/utils_rd.py:164-175);
  * static stats: the reference's `if bool_categorical == 0:` compares a
    list to 0 and is always False, so static means stay 0 / stds stay 1 and
    mask_normalize_static only zeroes entries <= 0 (code/utils_rd.py:195,
    203-218). `compat=True` (default) reproduces that; `compat=False` gives
    the intended per-continuous-feature z-score (the baselines' fixed copy,
    code/baselines/utils_phy12.py:321).
  * P12/P19 times are minutes/60 -> hours (code/utils_rd.py:235); PAM gets a
    synthetic linspace(0, T, T)/60 timeline (code/utils_rd.py:244-253).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def _native():
    """The C++/OpenMP host runtime (native/raindrop_host.cpp), or None.

    The numpy code below defines the semantics; the native module matches
    it (bit-identical elementwise, ~1e-13 reductions) and takes over the
    large-array loops. Disable with RAINDROP_TPU_NATIVE=0.
    """
    if os.environ.get("RAINDROP_TPU_NATIVE", "1") == "0":
        return None
    from raindrop_tpu import native
    return native if native.available() else None

# Static-feature categorical masks, reference code/utils_rd.py:184-192.
STATIC_CATEGORICAL = {
    "P12": np.array([0, 1, 1, 0, 1, 1, 1, 1, 0], bool),
    "P19": np.array([0, 1, 0, 0, 0, 0], bool),
    "eICU": np.array([1] * 397 + [0] * 2, bool),
}


def get_stats(P: np.ndarray, eps: float = 1e-7) -> Tuple[np.ndarray, np.ndarray]:
    """Per-sensor mean/std over strictly-positive entries (code/utils_rd.py:149-161).

    P: [N, T, F]. Returns (mf [F], stdf [F]); stdf floored at eps.
    """
    nat = _native()
    if nat is not None:
        return nat.get_stats(P, eps)
    F = P.shape[-1]
    flat = P.reshape(-1, F)
    obs = flat > 0
    cnt = obs.sum(axis=0)
    safe = np.maximum(cnt, 1)
    mf = np.where(cnt > 0, (flat * obs).sum(axis=0) / safe, np.nan)
    var = (((flat - mf[None]) * obs) ** 2).sum(axis=0) / safe
    stdf = np.maximum(np.sqrt(var), eps)
    return mf, stdf


def mask_normalize(P: np.ndarray, mf: np.ndarray, stdf: np.ndarray) -> np.ndarray:
    """z-score, re-zero missing, concat mask -> [N, T, 2F] (code/utils_rd.py:164-175)."""
    nat = _native()
    if nat is not None and P.ndim == 3:
        return nat.mask_normalize(P, np.asarray(mf), np.asarray(stdf))
    M = (P > 0).astype(P.dtype)
    Pn = (P - mf[None, None]) / (stdf[None, None] + 1e-18) * M
    return np.concatenate([Pn, M], axis=2)


def get_stats_static(
    Ps: np.ndarray, dataset: str = "P12", compat: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Static-feature stats (code/utils_rd.py:178-200).

    compat=True reproduces the reference's always-skipped loop (means 0,
    stds 1). compat=False computes positive-entry stats for continuous
    features only (the baselines' fix, code/baselines/utils_phy12.py:321).
    """
    S = Ps.shape[1]
    ms = np.zeros(S)
    ss = np.ones(S)
    if compat:
        return ms, ss
    cat = STATIC_CATEGORICAL[dataset]
    obs = Ps > 0
    cnt = obs.sum(axis=0)
    safe = np.maximum(cnt, 1)
    mean = (Ps * obs).sum(axis=0) / safe
    std = np.sqrt((((Ps - mean[None]) * obs) ** 2).sum(axis=0) / safe)
    ms = np.where(cat, 0.0, mean)
    ss = np.where(cat, 1.0, std)
    return ms, ss


def mask_normalize_static(Ps: np.ndarray, ms: np.ndarray, ss: np.ndarray) -> np.ndarray:
    """z-score statics then zero entries that END UP <= 0.

    Quirk preserved: the reference zeroes post-normalization non-positive
    values (code/utils_rd.py:211-214), not pre-normalization missing ones.
    With compat stats (ms=0, ss=1) this equals relu(Ps).
    """
    Pn = (Ps - ms[None]) / (ss[None] + 1e-18)
    return np.where(Pn <= 0, 0.0, Pn)


def tensorize_normalize(
    arrs: np.ndarray,          # [N, T, F] raw values
    times: np.ndarray,         # [N, T] timestamps in minutes
    statics: np.ndarray,       # [N, S]
    y: np.ndarray,             # [N] or [N, 1]
    mf, stdf, ms, ss,
):
    """P12/P19/eICU tensorization (code/utils_rd.py:221-241).

    Returns (P [N, T, 2F] f32, Pstatic [N, S] f32, Ptime [N, T] hours f32,
    y [N] int32).
    """
    P = mask_normalize(arrs.astype(np.float64), mf, stdf).astype(np.float32)
    Pt = (times.astype(np.float64) / 60.0).astype(np.float32)
    Ps = mask_normalize_static(statics.astype(np.float64), ms, ss).astype(np.float32)
    return P, Ps, Pt, np.asarray(y).reshape(-1).astype(np.int32)


def tensorize_normalize_no_static(arrs: np.ndarray, y: np.ndarray, mf, stdf):
    """PAM tensorization with a synthetic uniform timeline
    (code/utils_rd.py:244-257: linspace(0, T, T) minutes -> /60 hours)."""
    N, T, _ = arrs.shape
    P = mask_normalize(arrs.astype(np.float64), mf, stdf).astype(np.float32)
    tim = (np.linspace(0, T, T) / 60.0).astype(np.float32)
    Pt = np.broadcast_to(tim[None], (N, T)).copy()
    return P, None, Pt, np.asarray(y).reshape(-1).astype(np.int32)
