"""DGM2-O baseline — ODE-RNN with cluster emission.

Reference code/baselines/models.py:983-1462 (adapted there from
thuwuyinjun/DGM2) with the driver's configuration (DGM2_baseline.py:304-323):
latent_dim=10, cluster_num=20, Euler solver (rtol 1e-3), GRU_unit_cluster
with n_units=10, use_mask=False; classifier = Linear(T*10 + d_static,
n_classes) over the flattened latent states (models.py:1235-1242).

The reference's per-step Python loop with data-dependent intermediate-step
counts (models.py:1379-1395) becomes a jax.lax.scan: the driver always
feeds the shared uniform timeline (evaluate_DGM2, utils_phy12.py:480-482),
whose uniform gaps always take the single-Euler-increment branch
(gap < minimum_step = 2*mean_gap), so one Euler step per observation is
the exact reference behavior on the shipped path. `euler_substeps` > 1
refines the integration for non-uniform timelines.

The cluster-emission chain (emit_probs with decayed mixing,
models.py:1264-1289) is computed like the reference does — its output
`latent_ys` is returned as aux (the classifier ignores it, also like the
reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.nn.init import torch_linear_params
from raindrop_tpu.utils.staticmeta import Meta
from raindrop_tpu.nn.linear import linear_apply


def dgm2_init(key, input_dim: int, seq_len: int, n_classes: int, *,
              latent_dim: int = 10, cluster_num: int = 20, d_static: int = 0,
              ode_units: int = 10):
    k = jax.random.split(key, 8)
    return {
        # ODE func net: create_net(10, 10) = Linear(10, 10) > Tanh >
        # Linear(10, 10) — n_units defaults to 10 in the driver's config
        # (DGM2_baseline.py:74-84, :305-308)
        "ode_l1": torch_linear_params(k[0], latent_dim, ode_units),
        "ode_l2": torch_linear_params(k[1], ode_units, latent_dim),
        # GRU_unit_cluster gates (models.py:985-1053), use_mask=False
        "update_gate": torch_linear_params(k[2], latent_dim + input_dim, latent_dim),
        "reset_gate": torch_linear_params(k[3], latent_dim + input_dim, latent_dim),
        "new_state": torch_linear_params(k[4], latent_dim + input_dim, latent_dim),
        # emission (models.py:1180-1197)
        "infer_emitter_z": torch_linear_params(
            k[5], latent_dim + cluster_num, cluster_num),
        "decayed_layer": torch_linear_params(k[6], 1, 1),
        "mlp": torch_linear_params(k[7], seq_len * latent_dim + d_static,
                                   n_classes),
        "_meta": Meta(latent_dim=latent_dim, cluster_num=cluster_num),
    }


def _ode_func(p, y):
    return linear_apply(p["ode_l2"], jnp.tanh(linear_apply(p["ode_l1"], y)))


def _gru_update(p, y, x):
    """GRU_unit_cluster.forward (models.py:1036-1053)."""
    cat = jnp.concatenate([y, x], axis=-1)
    z = jax.nn.sigmoid(linear_apply(p["update_gate"], cat))
    r = jax.nn.sigmoid(linear_apply(p["reset_gate"], cat))
    n = linear_apply(p["new_state"], jnp.concatenate([y * r, x], axis=-1))
    return (1 - z) * n + z * y


def dgm2_apply(
    params,
    data: jnp.ndarray,           # [B, T, F] values (use_mask=False path)
    time_steps: jnp.ndarray,     # [T] shared timeline
    static: Optional[jnp.ndarray] = None,
    *,
    euler_substeps: int = 1,
    train: bool = False,
    rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p = params
    meta = p["_meta"]
    B, T, F = data.shape
    L = meta["latent_dim"]
    C = meta["cluster_num"]

    # per-step gaps; step 0 uses the reference's fictitious 0.01 lead-in
    # (models.py:1352)
    gaps = jnp.concatenate(
        [jnp.asarray([0.01]), jnp.diff(time_steps)])          # [T]

    def ode_step(y, dt):
        h = dt / euler_substeps
        for _ in range(euler_substeps):
            y = y + _ode_func(p, y) * h
        return y

    def cell(y, inp):
        x_t, dt = inp
        y_ode = ode_step(y, dt)
        y_new = _gru_update(p, y_ode, x_t)
        return y_new, y_new

    y0 = jnp.zeros((B, L))
    _, states = jax.lax.scan(cell, y0, (data.transpose(1, 0, 2), gaps))
    states = states.transpose(1, 0, 2)                        # [B, T, L]

    # cluster emission chain (models.py:1423-1436): aux output
    def emit(prob, inp):
        state, dt, is_first = inp
        decayed = jnp.where(
            is_first, 0.5,
            jnp.exp(-jnp.abs(linear_apply(p["decayed_layer"],
                                          dt.reshape(1, 1))))[0, 0])
        del decayed  # concat_data=True path ignores the decay (models.py:1281-1284)
        z = jax.nn.softmax(linear_apply(
            p["infer_emitter_z"], jnp.concatenate([prob, state], -1)), axis=-1)
        return z, z

    first = jnp.zeros((T,), bool).at[0].set(True)
    _, latent_ys = jax.lax.scan(
        emit, jnp.zeros((B, C)), (states.transpose(1, 0, 2), gaps, first))

    vec = states.reshape(B, T * L)
    if static is not None:
        vec = jnp.concatenate([vec, static], axis=1)
    return linear_apply(p["mlp"], vec), latent_ys.transpose(1, 0, 2)
