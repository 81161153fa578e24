"""MTGNN baseline — graph-learning temporal convolution network.

Reference code/baselines/models.py:836-979 + code/baselines/layer.py
(adapted there from nnzhan/MTGNN). Published driver configuration
(MTGNN_baseline.py:281-289): gcn_depth=2, node_dim=T, conv=residual=16,
skip=32, end=64, dilation_exponential=2, kernel set [2,3,6,7], layers=5,
in_dim=1 (values only), layer_norm non-affine, out_dim=1; classifier is a
single Linear over the squeezed node outputs (+ statics for binary).

Components:
  * graph_constructor (layer.py:152-190): learned node embeddings ->
    relu(tanh(alpha*(M1 M2^T - M2 M1^T))), per-row top-k sparsification.
    The reference adds torch.rand noise before top-k (layer.py:186) making
    the adjacency non-deterministic per forward; here a seeded uniform
    noise is used when `rng` is given, none otherwise. k is clamped to
    n_nodes (the reference's topk(20) crashes outright on PAM's 17 nodes).
  * dilated_inception (layer.py:133-149): 4 parallel dilated convs
    (kernels 2/3/6/7), truncated to the shortest output, concatenated.
  * mixprop GCN (layer.py:55-76): h_{l+1} = a*x + (1-a) A_norm h, concat
    all depths, 1x1-conv linear.
  * per-layer LayerNorm over [C, N, T_l] without affine (layer.py:297).

All convs lower to lax.conv_general_dilated in NCHW — MXU-friendly.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.utils.dropout import dropout as _dropout
from raindrop_tpu.utils.staticmeta import Meta

KERNEL_SET = (2, 3, 6, 7)


def _conv_init(key, c_in, c_out, kh, kw):
    """torch Conv2d default init: kaiming-uniform(a=sqrt5) + fan-in bias."""
    fan_in = c_in * kh * kw
    bound_w = math.sqrt(6.0 / ((1 + 5) * fan_in / 2))  # gain for a=sqrt(5)
    k1, k2 = jax.random.split(key)
    w = jax.random.uniform(k1, (c_out, c_in, kh, kw), minval=-bound_w, maxval=bound_w)
    bb = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(k2, (c_out,), minval=-bb, maxval=bb)
    return {"w": w, "b": b}


def _conv2d(p, x, dilation=(1, 1)):
    """NCHW conv, VALID padding (torch default)."""
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="VALID",
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["b"][None, :, None, None]


def _rf(layers: int, q: int, kernel: int = 7) -> int:
    """Receptive field (models.py:861-864)."""
    if q > 1:
        return int(1 + (kernel - 1) * (q ** layers - 1) / (q - 1))
    return layers * (kernel - 1) + 1


def mtgnn_init(key, n_nodes: int, seq_length: int, n_classes: int, *,
               d_static: int = 0, gcn_depth: int = 2, node_dim: Optional[int] = None,
               conv_channels: int = 16, residual_channels: int = 16,
               skip_channels: int = 32, end_channels: int = 64,
               layers: int = 5, dilation_exponential: int = 2,
               subgraph_size: int = 20, tanhalpha: float = 3.0,
               propalpha: float = 0.05, in_dim: int = 1):
    node_dim = node_dim or seq_length
    rf = _rf(layers, dilation_exponential)
    t_eff = max(seq_length, rf)
    ks = jax.random.split(key, 12 + 6 * layers)
    ki = iter(ks)

    def lin(k, i, o):
        return _conv_init(k, i, o, 1, 1)

    params = {
        "gc": {
            "emb1": jax.random.normal(next(ki), (n_nodes, node_dim)),
            "emb2": jax.random.normal(next(ki), (n_nodes, node_dim)),
            "lin1": lin(next(ki), node_dim, node_dim),
            "lin2": lin(next(ki), node_dim, node_dim),
        },
        "start_conv": _conv_init(next(ki), in_dim, residual_channels, 1, 1),
        "skip0": _conv_init(next(ki), in_dim, skip_channels, 1, t_eff),
        "layers": [],
    }
    new_dilation = 1
    for j in range(1, layers + 1):
        rf_j = _rf(j, dilation_exponential)
        t_j = t_eff - rf_j + 1
        lk = jax.random.split(next(ki), 8)
        cout4 = conv_channels // len(KERNEL_SET)
        params["layers"].append({
            "filter": [_conv_init(lk[0], residual_channels, cout4, 1, k)
                       for k in KERNEL_SET],
            "gate": [_conv_init(lk[1], residual_channels, cout4, 1, k)
                     for k in KERNEL_SET],
            "skip": _conv_init(lk[2], conv_channels, skip_channels, 1, t_j),
            "gconv1_mlp": lin(lk[3], (gcn_depth + 1) * conv_channels,
                              residual_channels),
            "gconv2_mlp": lin(lk[4], (gcn_depth + 1) * conv_channels,
                              residual_channels),
        })
        new_dilation *= dilation_exponential
    params["skipE"] = _conv_init(next(ki), residual_channels, skip_channels,
                                 1, t_eff - rf + 1)
    params["end1"] = _conv_init(next(ki), skip_channels, end_channels, 1, 1)
    params["end2"] = _conv_init(next(ki), end_channels, 1, 1, 1)
    # classifier over squeezed node outputs (+ statics), models.py:925-927
    fan = n_nodes + d_static
    kk = jax.random.split(next(ki), 2)
    bw = 1.0 / math.sqrt(fan)
    params["mlp_out"] = {
        "w": jax.random.uniform(kk[0], (n_classes, fan), minval=-bw, maxval=bw),
        "b": jax.random.uniform(kk[1], (n_classes,), minval=-bw, maxval=bw),
    }
    params["_meta"] = Meta(gcn_depth=gcn_depth, propalpha=propalpha,
                           tanhalpha=tanhalpha,
                           k=min(subgraph_size, n_nodes), layers=layers,
                           seq_length=seq_length, rf=rf,
                           q=dilation_exponential)
    return params


def _graph(params, meta, rng=None):
    gc = params["gc"]
    alpha = meta["tanhalpha"]
    v1 = jnp.tanh(alpha * (gc["emb1"] @ gc["lin1"]["w"][:, :, 0, 0].T
                           + gc["lin1"]["b"]))
    v2 = jnp.tanh(alpha * (gc["emb2"] @ gc["lin2"]["w"][:, :, 0, 0].T
                           + gc["lin2"]["b"]))
    a = v1 @ v2.T - v2 @ v1.T
    adj = jax.nn.relu(jnp.tanh(alpha * a))
    noise = (jax.random.uniform(rng, adj.shape) * 0.01 if rng is not None
             else 0.0)
    k = meta["k"]
    idx = jnp.argsort(-(adj + noise), axis=1)[:, :k]
    mask = jnp.zeros_like(adj).at[
        jnp.arange(adj.shape[0])[:, None], idx].set(1.0)
    return adj * mask


def _mixprop(mlp, x, adj, gdep, alpha):
    """layer.py:55-76: out = 1x1conv(concat_l (a x + (1-a) A_norm h_l))."""
    n = adj.shape[0]
    A = adj + jnp.eye(n)
    A = A / jnp.sum(A, axis=1, keepdims=True)
    h = x
    outs = [h]
    for _ in range(gdep):
        h = alpha * x + (1 - alpha) * jnp.einsum("ncwl,vw->ncvl", h, A)
        outs.append(h)
    return _conv2d(mlp, jnp.concatenate(outs, axis=1))


def _inception(convs, x, dilation):
    outs = [_conv2d(p, x, dilation=(1, dilation)) for p in convs]
    t_min = outs[-1].shape[3]
    return jnp.concatenate([o[..., -t_min:] for o in outs], axis=1)


def _layer_norm_3d(x):
    """Non-affine LayerNorm over (C, N, T) per sample (layer_norm_affline=
    False in the driver, MTGNN_baseline.py:284)."""
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5)


def mtgnn_apply(
    params,
    values: jnp.ndarray,        # [B, T, N] raw (already normalized) values
    static: Optional[jnp.ndarray] = None,
    *,
    dropout_rate: float = 0.3,
    train: bool = False,
    rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    meta = params["_meta"]
    B, T, N = values.shape
    x = values.transpose(0, 2, 1)[:, None]          # [B, 1, N, T] (in_dim=1)
    rf = meta["rf"]
    if T < rf:                                       # left-pad (models.py:934)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (rf - T, 0)))
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_adj, r_drop = jax.random.split(rng)
    adj = _graph(params, meta, r_adj if train else None)

    skip = _conv2d(params["skip0"],
                   _dropout(r_drop, x, dropout_rate, train))
    h = _conv2d(params["start_conv"], x)
    for i, lp in enumerate(params["layers"]):
        residual = h
        dilation = meta["q"] ** i
        filt = jnp.tanh(_inception(lp["filter"], h, dilation))
        gate = jax.nn.sigmoid(_inception(lp["gate"], h, dilation))
        h = filt * gate
        h = _dropout(jax.random.fold_in(r_drop, i), h, dropout_rate, train)
        skip = skip + _conv2d(lp["skip"], h)
        h = (_mixprop(lp["gconv1_mlp"], h, adj, meta["gcn_depth"], meta["propalpha"])
             + _mixprop(lp["gconv2_mlp"], h, adj.T, meta["gcn_depth"], meta["propalpha"]))
        h = h + residual[..., -h.shape[3]:]
        h = _layer_norm_3d(h)

    skip = _conv2d(params["skipE"], h) + skip
    h = jax.nn.relu(skip)
    h = jax.nn.relu(_conv2d(params["end1"], h))
    h = _conv2d(params["end2"], h)                   # [B, 1, N, 1]
    out = h[:, 0, :, 0]                              # [B, N]
    if static is not None:
        out = jnp.concatenate([out, static], axis=1)
    logits = out @ params["mlp_out"]["w"].T + params["mlp_out"]["b"]
    return logits, jnp.zeros(())
