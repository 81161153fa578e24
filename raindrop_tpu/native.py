"""ctypes bindings for the native host-side data runtime (native/).

The device compute path is XLA/Pallas; the host-side hot loops of the data
layer — per-sensor stats, mask-normalization, GRU-D delta construction,
Setting-2 sensor zeroing — are implemented in C++/OpenMP
(native/raindrop_host.cpp) and loaded here via ctypes. Everything degrades
gracefully: `available()` is False when the shared library is absent and
cannot be built (no compiler), and data/normalize.py falls back to its
vectorized-numpy implementations, which define the semantics
(reference code/utils_rd.py:149-257; GRU-D_data_preparation.py:55-200).

Build on demand: `ensure_built()` invokes `make -C native` once per
process; the resulting native/librdhost.so is cached on disk.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librdhost.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64 = ctypes.c_int64
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


_ABI_VERSION = 2


def ensure_built(force: bool = False) -> bool:
    """Build native/librdhost.so if missing (or force). Returns success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    if not os.path.exists(os.path.join(_NATIVE_DIR, "raindrop_host.cpp")):
        return False
    try:
        cmd = ["make", "-C", _NATIVE_DIR] + (["-B"] if force else [])
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not ensure_built():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.rd_abi_version.restype = ctypes.c_int
        if lib.rd_abi_version() != _ABI_VERSION:
            # Stale build from an older source tree — rebuild once. dlopen
            # caches by pathname, so re-CDLLing _LIB_PATH would hand back
            # the already-mapped stale image; load the rebuilt library
            # under a versioned filename instead.
            if not ensure_built(force=True):
                return None
            vers_path = os.path.join(_NATIVE_DIR,
                                     f"librdhost.abi{_ABI_VERSION}.so")
            try:
                import shutil

                shutil.copy2(_LIB_PATH, vers_path)
                lib = ctypes.CDLL(vers_path)
            except OSError:
                return None
            lib.rd_abi_version.restype = ctypes.c_int
            if lib.rd_abi_version() != _ABI_VERSION:
                return None
        lib.rd_get_stats.argtypes = [_f64p, _i64, _i64, _f64p, _f64p,
                                     ctypes.c_double]
        lib.rd_mask_normalize.argtypes = [_f64p, _i64, _i64, _i64,
                                          _f64p, _f64p, _f32p]
        lib.rd_mask_normalize_static.argtypes = [_f64p, _i64, _i64,
                                                 _f64p, _f64p, _f32p]
        lib.rd_build_delta.argtypes = [_f32p, _f64p, _i64, _i64, _i64, _f32p]
        lib.rd_zero_sensors.argtypes = [_f32p, _i64, _i64, _i64, _i64p, _i64]
        lib.rd_gather_rows.argtypes = [_f32p, _i64, _i64p, _i64, _f32p]
        lib.rd_gather_time_major.argtypes = [_f32p, _i64, _i64, _i64p,
                                             _i64, _f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def get_stats(P: np.ndarray, eps: float = 1e-7
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Native getStats: per-sensor mean/std over positive entries.
    P: [N, T, F] or [R, F]. Matches data/normalize.get_stats to ~1e-13."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    flat = np.ascontiguousarray(P.reshape(-1, P.shape[-1]), np.float64)
    R, F = flat.shape
    mf = np.empty(F, np.float64)
    stdf = np.empty(F, np.float64)
    lib.rd_get_stats(flat, R, F, mf, stdf, eps)
    return mf, stdf


def mask_normalize(P: np.ndarray, mf: np.ndarray, stdf: np.ndarray
                   ) -> np.ndarray:
    """Native mask_normalize -> [N, T, 2F] float32 (bit-identical to the
    numpy path given the same stats)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    P = np.ascontiguousarray(P, np.float64)
    N, T, F = P.shape
    out = np.empty((N, T, 2 * F), np.float32)
    lib.rd_mask_normalize(P, N, T, F,
                          np.ascontiguousarray(mf, np.float64),
                          np.ascontiguousarray(stdf, np.float64), out)
    return out


def mask_normalize_static(Ps: np.ndarray, ms: np.ndarray, ss: np.ndarray
                          ) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    Ps = np.ascontiguousarray(Ps, np.float64)
    N, S = Ps.shape
    out = np.empty((N, S), np.float32)
    lib.rd_mask_normalize_static(Ps, N, S,
                                 np.ascontiguousarray(ms, np.float64),
                                 np.ascontiguousarray(ss, np.float64), out)
    return out


def build_delta(mask: np.ndarray, times: np.ndarray) -> np.ndarray:
    """Native GRU-D delta: [N, T, F] float32."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    mask = np.ascontiguousarray(mask, np.float32)
    N, T, F = mask.shape
    times = np.ascontiguousarray(times, np.float64)
    out = np.empty((N, T, F), np.float32)
    lib.rd_build_delta(mask, times, N, T, F, out)
    return out


def _check_bounds(idx: np.ndarray, n: int) -> None:
    """The C gathers do raw pointer arithmetic — an out-of-range index
    would segfault instead of raising like the numpy fallback; validate
    here (O(B), negligible next to the gather itself)."""
    if idx.size and (idx.min() < 0 or idx.max() >= n):
        raise IndexError(
            f"gather index out of bounds for axis of size {n}: "
            f"[{int(idx.min())}, {int(idx.max())}]")


def gather_rows(P: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Native batched row gather: out[b] = P[idx[b]] for any [N, ...]
    float32 array (rows are the flattened trailing dims)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    P = np.ascontiguousarray(P, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    _check_bounds(idx, P.shape[0])
    rowlen = int(np.prod(P.shape[1:], dtype=np.int64))
    out = np.empty((len(idx),) + P.shape[1:], np.float32)
    lib.rd_gather_rows(P.reshape(P.shape[0], -1), rowlen, idx, len(idx),
                       out.reshape(len(idx), -1))
    return out


def gather_time_major(P: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Native fused gather + [N, T, C] -> [T, B, C] transpose (the model's
    time-major input contract, reference code/Raindrop.py:233-239)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    P = np.ascontiguousarray(P, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    N, T, C = P.shape
    _check_bounds(idx, N)
    out = np.empty((T, len(idx), C), np.float32)
    lib.rd_gather_time_major(P, T, C, idx, len(idx), out)
    return out


def zero_sensors(P: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """In-place Setting-2 sensor removal on [N, T, 2F] float32; returns P."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    assert P.dtype == np.float32 and P.flags.c_contiguous
    N, T, F2 = P.shape
    idx = np.ascontiguousarray(idx, np.int64)
    lib.rd_zero_sensors(P, N, T, F2 // 2, idx, len(idx))
    return P
