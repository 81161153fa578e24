"""Independent numpy transcription of the IP-Net Keras/TF1 interpolation
layers as an oracle for baselines/ipnet.py.

TF1 is not installable on this image, so the published layers
(reference code/baselines/IP_Net/src/interpolation_layer.py:17-120) cannot
run directly. This oracle is a SECOND, line-by-line transcription written
directly against the Keras source with numpy broadcasting kept in the
reference's exact tile/axis arrangement (including the tiled-then-reduced
logsumexp axes), so a misread of any axis in the jnp implementation cannot
survive both transcriptions agreeing.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raindrop_tpu.baselines.ipnet import (
    _cross_channel_interp,
    _single_channel_interp,
    ipnet_init,
)


def _logsumexp(a, axis):
    m = np.max(a, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    return np.squeeze(m, axis) + np.log(
        np.sum(np.exp(a - m), axis=axis))


def single_channel_interp_np(kernel, x, ref_points, hours_look_ahead,
                             reconstruction=False):
    """interpolation_layer.py:17-75, kept in the reference's own tensor
    arrangement: [batch, features, time] inputs, tile to
    [B, F, T, output_dim], logsumexp over axis=2 (time)."""
    B, F4, T = x.shape
    d_dim = F4 // 4
    x_t = x[:, :d_dim, :]
    d = x[:, 2 * d_dim:3 * d_dim, :]
    if reconstruction:
        output_dim = T
        m = x[:, 3 * d_dim:, :]
        ref_t = np.tile(d[:, :, None, :], (1, 1, output_dim, 1))
    else:
        m = x[:, d_dim:2 * d_dim, :]
        ref_t = np.linspace(0, hours_look_ahead, ref_points).reshape(1, -1)
        output_dim = ref_points
    dd = np.tile(d[:, :, :, None], (1, 1, 1, output_dim))
    mask = np.tile(m[:, :, :, None], (1, 1, 1, output_dim))
    x_tt = np.tile(x_t[:, :, :, None], (1, 1, 1, output_dim))
    norm = (dd - ref_t) * (dd - ref_t)
    pos_kernel = np.log(1 + np.exp(kernel))
    alpha = np.ones((d_dim, T, output_dim)) * pos_kernel[:, None, None]
    with np.errstate(divide="ignore"):
        log_mask = np.log(np.maximum(mask, 1e-30))  # matches jnp impl's clamp
    w = _logsumexp(-alpha * norm + log_mask, axis=2)
    w1 = np.tile(w[:, :, None, :], (1, 1, T, 1))
    w1 = np.exp(-alpha * norm + log_mask - w1)
    y = np.sum(w1 * x_tt, axis=2)
    if reconstruction:
        return np.concatenate([y, w], axis=1)
    w_t = _logsumexp(-10.0 * alpha * norm + log_mask, axis=2)  # kappa = 10
    w_t = np.tile(w_t[:, :, None, :], (1, 1, T, 1))
    w_t = np.exp(-10.0 * alpha * norm + log_mask - w_t)
    y_trans = np.sum(w_t * x_tt, axis=2)
    return np.concatenate([y, w, y_trans], axis=1)


def cross_channel_interp_np(cci, x, reconstruction=False):
    """interpolation_layer.py:78-120 verbatim: transpose to
    [B, output_dim, d_dim], tile w to [B, out, F, F], logsumexp over
    axis=2 — i.e. the softmax normalizes over CHANNELS, not time."""
    B, F3, output_dim = x.shape
    d_dim = cci.shape[0]
    y = x[:, :d_dim, :]
    w = x[:, d_dim:2 * d_dim, :]
    intensity = np.exp(w)
    y = np.transpose(y, (0, 2, 1))                    # [B, out, F]
    w = np.transpose(w, (0, 2, 1))
    w2 = w
    w4 = np.tile(w[:, :, :, None], (1, 1, 1, d_dim))  # [B, out, F, F]
    den = _logsumexp(w4, axis=2)                      # [B, out, F] over CHANNELS
    w = np.exp(w2 - den)
    mean = np.mean(y, axis=1)
    mean = np.tile(mean[:, None, :], (1, output_dim, 1))
    w2_out = np.dot(w * (y - mean), cci) + mean
    rep1 = np.transpose(w2_out, (0, 2, 1))            # [B, F, out]
    if not reconstruction:
        y_trans = x[:, 2 * d_dim:3 * d_dim, :]
        y_trans = y_trans - rep1
        rep1 = np.concatenate([rep1, intensity, y_trans], axis=1)
    return rep1


def _inputs(rng, B=3, F=5, T=11):
    vals = rng.normal(size=(B, F, T)).astype(np.float64)
    mask = (rng.uniform(size=(B, F, T)) > 0.4).astype(np.float64)
    # every channel observes at least once (the defined regime)
    mask[:, :, 0] = 1.0
    times = np.sort(rng.uniform(0, 48.0, size=(B, F, T)), axis=-1)
    hold = mask * (rng.uniform(size=(B, F, T)) > 0.3)
    return np.concatenate([vals * mask, mask, times, hold], axis=1)


@pytest.mark.parametrize("reconstruction", [False, True])
def test_single_channel_interp_vs_numpy_oracle(reconstruction):
    rng = np.random.default_rng(0)
    x = _inputs(rng)
    params = ipnet_init(jax.random.PRNGKey(0), 5, ref_points=7,
                        hours_look_ahead=48.0)
    # non-trivial kernel so alpha actually shapes the RBF widths
    params["sci_kernel"] = jnp.asarray(
        rng.normal(size=(5,)).astype(np.float32))
    ours = np.asarray(_single_channel_interp(
        params, jnp.asarray(x, jnp.float32), reconstruction=reconstruction))
    ref = single_channel_interp_np(
        np.asarray(params["sci_kernel"], np.float64), x, 7, 48.0,
        reconstruction=reconstruction)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("reconstruction", [False, True])
def test_cross_channel_interp_vs_numpy_oracle(reconstruction):
    rng = np.random.default_rng(1)
    B, F, R = 3, 5, 7
    x = rng.normal(size=(B, 3 * F, R)).astype(np.float64)
    params = ipnet_init(jax.random.PRNGKey(0), F)
    cci = rng.normal(size=(F, F)).astype(np.float64) * 0.3 + np.eye(F)
    params["cci_w"] = jnp.asarray(cci, jnp.float32)
    ours = np.asarray(_cross_channel_interp(
        params, jnp.asarray(x, jnp.float32), reconstruction=reconstruction))
    ref = cross_channel_interp_np(cci, x, reconstruction=reconstruction)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


# ---- analytic micro-oracle ------------------------------------------------
def test_single_channel_interp_analytic_closed_form():
    """Independent of BOTH the jnp implementation and the numpy
    transcription: hand-compute the published RBF interpolation formula
    (interpolation_layer.py:38-66 — a mask-weighted Nadaraya-Watson
    estimate y[r] = sum_t m_t e^{-kappa*alpha*(d_t-r)^2} x_t / norm,
    alpha = softplus(kernel), kappa in {1, 10}) with plain Python floats
    on a 2-observation channel and require the framework to match."""
    import math

    import jax.numpy as jnp
    from raindrop_tpu.baselines.ipnet import (
        _single_channel_interp, ipnet_init)

    F, T, R, hours = 1, 2, 3, 2.0
    params = ipnet_init(jax.random.PRNGKey(0), F, ref_points=R,
                        hours_look_ahead=hours)
    # sci_kernel zero-init => alpha = softplus(0) = ln 2
    alpha = math.log(2.0)
    x_vals = [0.7, -1.3]
    d = [0.25, 1.5]
    m = [1.0, 1.0]
    x = jnp.asarray([[x_vals, m, d, [0.0, 0.0]]], jnp.float32)  # [1, 4F, T]
    out = np.asarray(_single_channel_interp(params, x))         # [1, 3F, R]

    ref_ts = [hours * r / (R - 1) for r in range(R)]            # linspace
    for kappa, row in ((1.0, 0), (10.0, 2)):
        for r, t_r in enumerate(ref_ts):
            ws = [mi * math.exp(-kappa * alpha * (di - t_r) ** 2)
                  for di, mi in zip(d, m)]
            expect = sum(w * xv for w, xv in zip(ws, x_vals)) / sum(ws)
            assert out[0, row, r] == pytest.approx(expect, rel=1e-5), (
                kappa, r)
    # middle row is the log-intensity: log sum_t m_t e^{-alpha (d_t-r)^2}
    for r, t_r in enumerate(ref_ts):
        expect_w = math.log(sum(
            mi * math.exp(-alpha * (di - t_r) ** 2)
            for di, mi in zip(d, m)))
        assert out[0, 1, r] == pytest.approx(expect_w, rel=1e-5)


def test_cross_channel_interp_analytic_closed_form():
    """Hand-computed cross-channel mixing (interpolation_layer.py:88-120):
    with the identity-init mixing matrix, mixed[r, f] = mean_f +
    softmax_over_channels(w)[r, f] * (y[r, f] - mean_f), where mean_f is
    the channel's mean over the R reference points."""
    import math

    import jax.numpy as jnp
    from raindrop_tpu.baselines.ipnet import (
        _cross_channel_interp, ipnet_init)

    F, R = 2, 2
    params = ipnet_init(jax.random.PRNGKey(0), F)      # cci_w = identity
    y = [[1.0, 3.0], [2.0, -2.0]]                      # [F, R]
    w = [[0.1, 0.5], [0.3, 0.2]]                       # log-intensities
    y_trans = [[0.0, 0.0], [0.0, 0.0]]
    x = jnp.asarray([y + w + y_trans], jnp.float32).reshape(1, 3 * F, R)
    out = np.asarray(_cross_channel_interp(params, x))  # [1, 3F, R]

    means = [sum(row) / R for row in y]
    for r in range(R):
        den = sum(math.exp(w[g][r]) for g in range(F))
        for f in range(F):
            sm = math.exp(w[f][r]) / den
            expect = means[f] + sm * (y[f][r] - means[f])
            assert out[0, f, r] == pytest.approx(expect, rel=1e-5), (f, r)
        # intensity rows are exp(w)
        for f in range(F):
            assert out[0, F + f, r] == pytest.approx(
                math.exp(w[f][r]), rel=1e-5)
