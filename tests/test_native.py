"""Native C++ host runtime (native/raindrop_host.cpp) vs the numpy
reference implementations in data/normalize.py and baselines/grud.py.

The numpy paths define the semantics (themselves pinned against the torch
reference in test_data.py); the native library must reproduce them —
bit-identical for elementwise ops, ~1e-12 relative for reductions."""

import numpy as np
import pytest

from raindrop_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built")


def _numpy_paths():
    """The pure-numpy implementations: the dispatch in data/normalize.py
    reads RAINDROP_TPU_NATIVE at call time, so flipping the env var is
    enough — no reload needed."""
    import os

    os.environ["RAINDROP_TPU_NATIVE"] = "0"
    from raindrop_tpu.data import normalize

    return normalize


@pytest.fixture()
def ref():
    norm = _numpy_paths()
    yield norm
    import os

    os.environ["RAINDROP_TPU_NATIVE"] = "1"


def test_get_stats_matches_numpy(ref):
    rng = np.random.default_rng(0)
    P = np.abs(rng.normal(3.0, 2.0, size=(200, 30, 17)))
    P *= rng.uniform(size=P.shape) > 0.5
    P[:, :, 3] = 0.0  # a never-observed sensor
    mf_n, sd_n = ref.get_stats(P)
    mf_c, sd_c = native.get_stats(P)
    np.testing.assert_allclose(mf_c[np.isfinite(mf_n)],
                               mf_n[np.isfinite(mf_n)], rtol=1e-12)
    assert np.isnan(mf_c[3]) and np.isnan(mf_n[3])
    fin = np.isfinite(sd_n)
    np.testing.assert_allclose(sd_c[fin], sd_n[fin], rtol=1e-12)
    # numpy's NaN mean propagates into the std (maximum(NaN, eps) is NaN)
    assert np.isnan(sd_c[3]) and np.isnan(sd_n[3])


def test_mask_normalize_bit_identical(ref):
    rng = np.random.default_rng(1)
    P = np.abs(rng.normal(3.0, 2.0, size=(64, 21, 9)))
    P *= rng.uniform(size=P.shape) > 0.4
    mf, sd = ref.get_stats(P)
    mf = np.nan_to_num(mf)
    out_np = ref.mask_normalize(P.astype(np.float64), mf, sd).astype(np.float32)
    out_c = native.mask_normalize(P, mf, sd)
    assert out_c.dtype == np.float32
    np.testing.assert_array_equal(out_c, out_np)  # bitwise


def test_mask_normalize_static_bit_identical(ref):
    rng = np.random.default_rng(2)
    Ps = rng.normal(1.0, 2.0, size=(128, 9))
    ms, ss = ref.get_stats_static(Ps, "P12", compat=True)
    out_np = ref.mask_normalize_static(Ps, ms, ss).astype(np.float32)
    out_c = native.mask_normalize_static(Ps, ms, ss)
    np.testing.assert_array_equal(out_c, out_np)


def test_build_delta_matches_jax(ref):
    import jax.numpy as jnp

    from raindrop_tpu.baselines.grud import build_delta

    rng = np.random.default_rng(3)
    N, T, F = 12, 25, 7
    mask = (rng.uniform(size=(N, T, F)) > 0.6).astype(np.float32)
    times = np.cumsum(rng.uniform(0.1, 1.5, size=(N, T)), axis=1)
    d_jax = np.asarray(build_delta(jnp.asarray(mask),
                                   jnp.asarray(times, jnp.float32)))
    d_c = native.build_delta(mask, times)
    np.testing.assert_allclose(d_c, d_jax, rtol=1e-5, atol=1e-5)
    assert np.all(d_c[:, 0] == 0.0)


def test_zero_sensors_matches_settings(ref):
    from raindrop_tpu.data.settings import remove_sensors_fixed

    rng = np.random.default_rng(4)
    F = 11
    P = rng.normal(size=(32, 13, 2 * F)).astype(np.float32)
    ranked = rng.permutation(F)[:4].astype(np.int64)
    want = remove_sensors_fixed(P.copy(), ranked, len(ranked))
    got = native.zero_sensors(np.ascontiguousarray(P.copy()), ranked)
    np.testing.assert_array_equal(got, want)


def test_normalize_module_dispatches_to_native():
    """With the library built, data/normalize.py uses the native path and a
    full tensorize round trip equals the numpy path."""
    from raindrop_tpu.data import normalize as norm

    rng = np.random.default_rng(5)
    arrs = np.abs(rng.normal(2.0, 1.0, size=(40, 12, 6)))
    arrs *= rng.uniform(size=arrs.shape) > 0.5
    times = np.cumsum(rng.uniform(1, 20, size=(40, 12)), axis=1)
    statics = rng.normal(size=(40, 9))
    y = rng.integers(0, 2, size=40)

    mf, sd = norm.get_stats(arrs)
    mf = np.nan_to_num(mf)
    ms, ss = norm.get_stats_static(statics, "P12")
    P1, Ps1, Pt1, y1 = norm.tensorize_normalize(arrs, times, statics, y,
                                                mf, sd, ms, ss)
    ref = _numpy_paths()
    try:
        P2, Ps2, Pt2, y2 = ref.tensorize_normalize(arrs, times, statics, y,
                                                   mf, sd, ms, ss)
    finally:
        import os
        os.environ["RAINDROP_TPU_NATIVE"] = "1"
    np.testing.assert_array_equal(P1, P2)
    np.testing.assert_array_equal(Ps1, Ps2)
    np.testing.assert_array_equal(Pt1, Pt2)
    np.testing.assert_array_equal(y1, y2)
