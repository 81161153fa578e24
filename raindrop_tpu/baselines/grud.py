"""GRU-D baseline — decay-gated diagonal GRU over (x, mask, delta).

Reference code/baselines/models.py:337-655: a *diagonal* GRU-D (all gate
weights are element-wise vectors, hidden dim == input dim — the reference's
own simplification) with input/hidden decay

  gamma_x = exp(-relu(w_dg_x * delta + b_dg_x))
  gamma_h = exp(-relu(w_dg_h * delta + b_dg_h))
  x_t     = m*x + (1-m)*(gamma_x*x + (1-gamma_x)*x_mean)
  h       = gamma_h * h; standard elementwise GRU gates (z, r, h_tilde)
  out     = W_hy h + b_y  (sigmoid for binary datasets, models.py:653-654)

The reference steps time in a Python loop with batch=1 DataLoader
(GRU-D_baseline.py:220-222,306); here time is a jax.lax.scan and the batch
is a vmapped leading axis — whole-batch single kernel.

The 4 dropout variants (Moon / Gal / mloss / none, models.py:584-646) are
preserved via the `dropout_type` switch.

Delta tensors follow GRU-D_data_preparation.py:142-148: delta accumulates
through missing steps (see data/grud_prep.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.utils.dropout import dropout as _dropout


def grud_init(key, input_size: int, output_size: int, x_mean=None):
    """All weights uniform(-1/sqrt(hidden), 1/sqrt(hidden))
    (reference models.py:600-603 reset_parameters)."""
    hidden = input_size
    stdv = 1.0 / jnp.sqrt(jnp.asarray(float(hidden)))
    names = ["w_dg_x", "w_dg_h", "w_xz", "w_hz", "w_mz", "w_xr", "w_hr",
             "w_mr", "w_xh", "w_hh", "w_mh",
             "b_dg_x", "b_dg_h", "b_z", "b_r", "b_h"]
    ks = jax.random.split(key, len(names) + 2)
    params = {n: jax.random.uniform(k, (input_size,), minval=-stdv, maxval=stdv)
              for n, k in zip(names, ks)}
    params["w_hy"] = jax.random.uniform(
        ks[-2], (output_size, hidden), minval=-stdv, maxval=stdv)
    params["b_y"] = jax.random.uniform(
        ks[-1], (output_size,), minval=-stdv, maxval=stdv)
    # x_mean is a trainable parameter in the reference (models.py:346)
    params["x_mean"] = (jnp.zeros((input_size,)) if x_mean is None
                        else jnp.asarray(x_mean, jnp.float32).reshape(-1))
    return params


def grud_apply(
    params,
    x: jnp.ndarray,          # [B, T, F] values
    mask: jnp.ndarray,       # [B, T, F] observed mask
    delta: jnp.ndarray,      # [B, T, F] time since last observation
    *,
    dropout_rate: float = 0.0,
    dropout_type: str = "mloss",
    train: bool = False,
    rng=None,
    apply_sigmoid: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (output [B, n_out], final hidden [B, F])."""
    B, T, F = x.shape
    p = params
    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_rngs = jax.random.split(rng, T)

    def cell(h, inp):
        xt, mt, dt, r = inp                               # each [B, F]
        gamma_x = jnp.exp(-jax.nn.relu(p["w_dg_x"] * dt + p["b_dg_x"]))
        gamma_h = jnp.exp(-jax.nn.relu(p["w_dg_h"] * dt + p["b_dg_h"]))
        xt = mt * xt + (1 - mt) * (gamma_x * xt + (1 - gamma_x) * p["x_mean"])

        if dropout_type == "Gal" and dropout_rate > 0:
            h = _dropout(r, h, dropout_rate, train)
        h = gamma_h * h
        z = jax.nn.sigmoid(p["w_xz"] * xt + p["w_hz"] * h + p["w_mz"] * mt + p["b_z"])
        rg = jax.nn.sigmoid(p["w_xr"] * xt + p["w_hr"] * h + p["w_mr"] * mt + p["b_r"])
        h_tilde = jnp.tanh(p["w_xh"] * xt + p["w_hh"] * (rg * h)
                           + p["w_mh"] * mt + p["b_h"])
        if dropout_type == "mloss" and dropout_rate > 0:
            h_tilde = _dropout(r, h_tilde, dropout_rate, train)
        h = (1 - z) * h + z * h_tilde
        if dropout_type == "Moon" and dropout_rate > 0:
            h = _dropout(r, h, dropout_rate, train)
        return h, None

    h0 = jnp.zeros((B, F))
    xs = (x.transpose(1, 0, 2), mask.transpose(1, 0, 2),
          delta.transpose(1, 0, 2), step_rngs)
    h, _ = jax.lax.scan(cell, h0, xs)
    out = h @ p["w_hy"].T + p["b_y"]
    if apply_sigmoid:  # binary datasets squash with sigmoid + BCE (models.py:653)
        out = jax.nn.sigmoid(out)
    return out, h


def build_delta(mask: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    """GRU-D delta tensor: time since the sensor was last observed,
    accumulating through missing steps (reference
    GRU-D_data_preparation.py:142-148):

      delta[0] = 0; delta[t] = gap(t) + (1-m[t-1]) * delta[t-1]

    mask [B, T, F]; times [B, T] (same units as the reference's hours).
    """
    B, T, F = mask.shape
    gaps = jnp.diff(times, axis=1, prepend=times[:, :1])    # [B, T]
    gaps = jnp.broadcast_to(gaps[:, :, None], (B, T, F))

    def step(prev_delta, inp):
        gap_t, m_prev = inp
        d = gap_t + (1 - m_prev) * prev_delta
        return d, d

    m_prev = jnp.concatenate(
        [jnp.ones((B, 1, F)), mask[:, :-1]], axis=1).transpose(1, 0, 2)
    _, deltas = jax.lax.scan(step, jnp.zeros((B, F)),
                             (gaps.transpose(1, 0, 2), m_prev))
    return deltas.transpose(1, 0, 2).at[:, 0].set(0.0)
