"""IP-Net (interpolation-prediction network) baseline.

Reference code/baselines/IP_Net/src/ — the repo's only non-PyTorch piece
(TensorFlow-1 Keras). Re-expressed in jnp:

  * single_channel_interp (interpolation_layer.py:17-75): RBF-kernel
    temporal interpolation of each channel onto `ref_points` reference
    timestamps, with a softplus-positive learned bandwidth per channel;
    outputs smooth interpolant y, log-intensity w, and a kappa=10
    'transient' interpolant y_trans.
  * cross_channel_interp (:78-120): softmax-over-time weighting and a
    learned d x d mixing (identity-initialized) of de-meaned smooth
    interpolants; outputs [smooth, intensity, transient - smooth].
  * classifier (IP_Net_baseline.py:80-96): GRU(hid) over the interpolated
    sequence + softmax head; auxiliary autoencoder reconstruction with the
    masked-MSE customloss (:101-118) — provided here as
    `ipnet_reconstruction_loss`.

Input x: [B, 4F, T] rows = (values, mask, timestamps, held-out mask),
exactly the Keras model's input contract (IP_Net_baseline.py:81).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.baselines.mtand import _gru_init, _gru_scan
from raindrop_tpu.nn.init import torch_linear_params
from raindrop_tpu.utils.staticmeta import Meta
from raindrop_tpu.nn.linear import linear_apply


def ipnet_init(key, num_features: int, *, ref_points: int = 192,
               hours_look_ahead: float = 48.0, hid: int = 100,
               n_classes: int = 2):
    k = jax.random.split(key, 3)
    return {
        "sci_kernel": jnp.zeros((num_features,)),     # constant-0 init (:31)
        "cci_w": jnp.eye(num_features),               # identity init (:88)
        "gru": _gru_init(k[0], 3 * num_features, hid),
        "dense": torch_linear_params(k[1], hid, n_classes),
        "_meta": Meta(ref_points=ref_points, hours=hours_look_ahead),
    }


def _single_channel_interp(params, x, *, reconstruction: bool = False):
    """x: [B, 4F, T] -> [B, 3F, R] (or [B, 2F, T] for reconstruction)."""
    meta = params["_meta"]
    F = x.shape[1] // 4
    x_t = x[:, :F]                                    # values [B, F, T]
    d = x[:, 2 * F:3 * F]                             # timestamps
    if reconstruction:
        m = x[:, 3 * F:]                              # held-out mask
        ref_t = d[:, :, None, :]                      # interpolate back onto obs times
        out_dim = x.shape[2]
    else:
        m = x[:, F:2 * F]
        ref_t = jnp.linspace(0.0, meta["hours"], meta["ref_points"])[
            None, None, None, :]
        out_dim = meta["ref_points"]

    dd = d[:, :, :, None]                             # [B, F, T, 1]
    norm = (dd - ref_t) ** 2                          # [B, F, T, R]
    alpha = jax.nn.softplus(params["sci_kernel"])[None, :, None, None]
    # 1e-38 is subnormal in f32 and XLA flushes subnormals to zero
    # (log(0) = -inf); 1e-30 stays normal on every backend
    log_m = jnp.log(jnp.maximum(m, 1e-30))[:, :, :, None]

    def interp(kappa):
        logits = -kappa * alpha * norm + log_m
        w = jax.nn.logsumexp(logits, axis=2)          # [B, F, R]
        wt = jnp.exp(logits - w[:, :, None, :])
        y = jnp.sum(wt * x_t[:, :, :, None], axis=2)  # [B, F, R]
        return y, w

    y, w = interp(1.0)
    if reconstruction:
        return jnp.concatenate([y, w], axis=1)
    y_trans, _ = interp(10.0)
    return jnp.concatenate([y, w, y_trans], axis=1)


def _cross_channel_interp(params, x, *, reconstruction: bool = False):
    """x: [B, 3F, R] -> [B, 3F, R] (or [B, F, T] for reconstruction).

    d_dim is the Keras layer's build-time F (interpolation_layer.py:84) —
    the reconstruction input is only 2F wide but slices with the same F.
    """
    F = params["cci_w"].shape[0]
    y = x[:, :F].transpose(0, 2, 1)                   # [B, R, F]
    w = x[:, F:2 * F].transpose(0, 2, 1)
    intensity = jnp.exp(w)
    # softmax over CHANNELS: the reference tiles w to [B, out, F, F] and
    # logsumexps axis=2 — the channel axis, NOT time
    # (interpolation_layer.py:104-107; axis verified against the
    # independent numpy transcription in tests/test_ipnet_numpy_oracle.py,
    # which caught the previous over-time normalization)
    den = jax.nn.logsumexp(w, axis=-1, keepdims=True)  # [B, R, 1]
    w_norm = jnp.exp(w - den)
    mean = jnp.mean(y, axis=1, keepdims=True)
    mixed = (w_norm * (y - mean)) @ params["cci_w"] + mean
    rep = mixed.transpose(0, 2, 1)                    # [B, F, R]
    if reconstruction:
        return rep
    y_trans = x[:, 2 * F:] - rep                      # transient - smooth
    return jnp.concatenate([rep, intensity.transpose(0, 2, 1), y_trans], axis=1)


def ipnet_apply(params, x: jnp.ndarray, *, train: bool = False, rng=None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [B, 4F, T] -> (logits [B, n_classes], reconstruction [B, 2F, T])."""
    interp = _cross_channel_interp(params, _single_channel_interp(params, x))
    reconst = _cross_channel_interp(
        params, _single_channel_interp(params, x, reconstruction=True),
        reconstruction=True)
    seq = interp.transpose(0, 2, 1)                   # [B, R, 3F]
    h = _gru_scan(params["gru"], seq)
    logits = linear_apply(params["dense"], h)
    F = x.shape[1] // 4
    w = _single_channel_interp(params, x, reconstruction=True)[:, F:]
    return logits, jnp.concatenate([reconst, w], axis=1)[:, :2 * F]


def ipnet_reconstruction_loss(x_true: jnp.ndarray, reconst: jnp.ndarray,
                              stds: jnp.ndarray) -> jnp.ndarray:
    """Masked std-normalized MSE on held-out observations
    (IP_Net_baseline.py:101-118). x_true [B, 4F, T]; reconst [B, >=F, T]."""
    F = x_true.shape[1] // 4
    y = x_true[:, :F]
    m = x_true[:, F:2 * F] * (1.0 - x_true[:, 3 * F:])
    err = ((y - reconst[:, :F]) ** 2) * m
    count = jnp.maximum(jnp.sum(m, axis=2), 1.0)
    per_chan = jnp.sum(err, axis=2) / count / (stds[None, :] ** 2)
    return jnp.mean(jnp.sum(per_chan, axis=1) / F)
