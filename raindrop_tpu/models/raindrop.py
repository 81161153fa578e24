"""Raindrop (v2) — graph-guided classifier for irregular multivariate series.

TPU-native re-design of the reference flagship model `Raindrop_v2`
(reference code/models_rd.py:194-387). Same math, same parameters, same
returns (logits, alpha-distance regularizer) — but fully batched, jit-able
and static-shaped:

  * The per-sample graph-propagation Python loop (code/models_rd.py:322-343)
    is replaced by one batched dense layer on the complete graph (default
    config) or a vmapped COO layer (use_beta / custom graphs).
  * The positional encoding's CPU round-trip (code/models_rd.py:33-43) is a
    pure jnp op.
  * Time-major [T, B, ...] inputs are kept at the API boundary for reference
    parity; internally everything is batch-major.

Input contract (code/models_rd.py:278-287):
  src     [T, B, 2F]  z-scored values (cols :F) ++ observed mask (cols F:2F)
  static  [B, d_static] or None
  times   [T, B]      timestamps in hours (0 = padding)
  lengths [B]         number of non-zero timestamps per sample
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from raindrop_tpu.config import RaindropConfig
from raindrop_tpu.graph.propagate import (
    alpha_pairwise_distance,
    ob_propagate_coo,
    ob_propagate_dense_complete,
    ob_propagation_init,
    raindrop_propagate_beta_dense,
)
from raindrop_tpu.graph.structure import complete_graph_edges
from raindrop_tpu.nn.init import glorot, tiny_uniform, torch_linear_params
from raindrop_tpu.nn.linear import linear_apply, mlp_apply, mlp_init
from raindrop_tpu.nn.aggregate import masked_mean_pool, padding_mask, sensor_wise_pool
from raindrop_tpu.nn.transformer import transformer_encoder_init, transformer_encoder_apply
from raindrop_tpu.ops.pe import time_positional_encoding
from raindrop_tpu.utils.dropout import dropout as _dropout


def raindrop_init(key, cfg: RaindropConfig):
    """Initialize all parameters (reference code/models_rd.py:208-276)."""
    dtype = jnp.dtype(cfg.dtype)
    k = jax.random.split(key, 8)
    d_model = cfg.d_model
    in_ch = cfg.max_len * cfg.d_ob

    params = {
        # gating vector R_u [1, F*d_ob], glorot init (code/models_rd.py:241,276)
        "R_u": glorot(k[0], (1, d_model), dtype),
        # encoder Linear exists-but-unused in the reference forward
        # (created at code/models_rd.py:228, never called) — kept for
        # checkpoint-compat; weights tiny-uniform like the reference.
        "encoder": {
            "w": tiny_uniform(k[1], (d_model, d_model), cfg.init_range, dtype),
            "b": torch_linear_params(k[1], d_model, d_model, dtype)["b"],
        },
        "ob_propagation": ob_propagation_init(
            k[2], in_ch, in_ch, cfg.d_inp, cfg.d_ob, dtype=dtype),
        "ob_propagation_layer2": ob_propagation_init(
            k[3], in_ch, in_ch, cfg.d_inp, cfg.d_ob, dtype=dtype),
        "transformer_encoder": transformer_encoder_init(
            k[4], cfg.d_transformer, cfg.nhead, cfg.ffn_dim, cfg.nlayers, dtype),
        "mlp_static": mlp_init(k[5], [cfg.d_final, cfg.d_final, cfg.n_classes], dtype),
    }
    if cfg.static:
        emb = torch_linear_params(k[6], cfg.d_static, cfg.d_inp, dtype)
        emb["w"] = tiny_uniform(k[7], (cfg.d_inp, cfg.d_static), cfg.init_range, dtype)
        params["emb"] = emb
    return params


def raindrop_param_mask(cfg: RaindropConfig):
    """True for every parameter the forward actually uses (same tree
    structure as raindrop_init).

    torch.optim.Adam skips parameters whose .grad stays None, so the
    reference never touches its dead parameters (the unused `encoder`,
    code/models_rd.py:228; Ob_propagation's lin_key/lin_query/lin_skip/
    weight/bias/nodewise_weights, and — when use_beta=False — increase_dim/
    map_weights). Feed this to optax.masked for the same semantics (and to
    skip their optimizer-state traffic: ~1.5M of 2.8M params are dead in
    the shipped P19 config).
    """
    def prop_mask():
        return {
            "lin_key": {"w": False, "b": False},
            "lin_query": {"w": False, "b": False},
            "lin_value": {"w": True, "b": True},
            "lin_skip": {"w": False, "b": False},
            "weight": False,
            "bias": False,
            "nodewise_weights": False,
            "increase_dim": {"w": cfg.use_beta, "b": cfg.use_beta},
            "map_weights": cfg.use_beta,
        }

    def like(tree, value):
        return jax.tree.map(lambda _: value, tree)

    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    mask = {
        "R_u": True,
        "encoder": like(params["encoder"], False),
        "ob_propagation": prop_mask(),
        "ob_propagation_layer2": prop_mask(),
        "transformer_encoder": like(params["transformer_encoder"], True),
        "mlp_static": like(params["mlp_static"], True),
    }
    if cfg.static:
        mask["emb"] = like(params["emb"], True)
    return mask


def _edge_list(F_: int, global_adj, dtype):
    """Complete-graph edge list + per-edge weights (from global_adj when
    given, else the all-ones default) — shared by the COO and Pallas
    propagation backends so their inputs are identical by construction."""
    edge_index, edge_weights = complete_graph_edges(F_)
    ei = jnp.asarray(edge_index)
    if global_adj is not None:
        w = global_adj[ei[0], ei[1]].astype(dtype)
    else:
        w = jnp.asarray(edge_weights, dtype)
    return ei, w


def _to_node_features(h: jnp.ndarray, F: int, d_ob: int) -> jnp.ndarray:
    """[B, T, F*d_ob] -> [B, F, T*d_ob] (code/models_rd.py:326-327)."""
    B, T, _ = h.shape
    return h.reshape(B, T, F, d_ob).transpose(0, 2, 1, 3).reshape(B, F, T * d_ob)


def _from_node_features(x: jnp.ndarray, T: int, d_ob: int) -> jnp.ndarray:
    """[B, F, T*d_ob] -> [B, T, F*d_ob] (code/models_rd.py:338-340)."""
    B, F, _ = x.shape
    return x.reshape(B, F, T, d_ob).transpose(0, 2, 1, 3).reshape(B, T, F * d_ob)


def raindrop_apply(
    params,
    cfg: RaindropConfig,
    src: jnp.ndarray,                      # [T, B, 2F]
    static: Optional[jnp.ndarray],         # [B, d_static] or None
    times: jnp.ndarray,                    # [T, B]
    lengths: jnp.ndarray,                  # [B]
    *,
    train: bool = False,
    rng=None,
    global_adj: Optional[jnp.ndarray] = None,  # [F, F] edge weights; default ones
    mesh=None,                      # for the scale-out routes below
    context_parallel: str = "none",  # 'none' | 'sp' | 'ring': shard the
                                     # temporal attention's T axis over the
                                     # mesh 'model' axis (parallel/sequence.py)
    pipeline_parallel: int = 0,      # microbatches > 0: run the encoder
                                     # layers as GPipe stages over 'model'
                                     # (parallel/pipeline.py)
    edge_partition: bool = False,    # shard the propagation edge set over
                                     # 'model' (parallel/edge_partition.py)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass. Returns (logits [B, n_classes], distance scalar)."""
    if context_parallel != "none" and pipeline_parallel:
        raise ValueError("context_parallel and pipeline_parallel both "
                         "claim the temporal transformer; pick one")
    if (context_parallel != "none" or pipeline_parallel or edge_partition) \
            and mesh is None:
        raise ValueError("scale-out routes need a mesh "
                         "(parallel.make_mesh(n_data, n_model))")
    F_, d_ob, T = cfg.d_inp, cfg.d_ob, cfg.max_len
    dtype = jnp.dtype(cfg.dtype)
    if cfg.compute_dtype is not None and cfg.compute_dtype != cfg.dtype:
        # Mixed precision: run the whole forward in compute_dtype (bf16 on
        # TPU rides the MXU's native bf16xbf16->f32 path); master params
        # stay in cfg.dtype, and the gradient of this cast casts back, so
        # the optimizer state is full-precision.
        compute = jnp.dtype(cfg.compute_dtype)
        params = jax.tree.map(
            lambda x: x.astype(compute) if jnp.issubdtype(x.dtype, jnp.floating)
            else x, params)
        dtype = compute
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_drop, r_prop1, r_prop2, r_trans = jax.random.split(rng, 4)

    values = src[:, :, :F_].astype(dtype)                 # [T, B, F]
    observed = src[:, :, F_: 2 * F_].astype(dtype)        # [T, B, F]
    B = values.shape[1]

    # --- sensor-level gated embedding (code/models_rd.py:290-296) ---
    h = jnp.repeat(values, d_ob, axis=-1) * params["R_u"]  # repeat_interleave ∘ R_u
    h = jax.nn.relu(h)
    pe = time_positional_encoding(times, cfg.d_pe, T, dtype)   # [T, B, d_pe]
    h = _dropout(r_drop, h, cfg.dropout, train)

    h_b = h.transpose(1, 0, 2)                             # [B, T, F*d_ob]
    pe_b = pe.transpose(1, 0, 2)                           # [B, T, d_pe]

    # --- graph propagation, 2 layers (code/models_rd.py:306-343) ---
    x_nodes = _to_node_features(h_b, F_, d_ob)             # [B, F, T*d_ob]
    dense_ok = global_adj is None and cfg.prop_backend != "coo"
    pallas_ok = (cfg.prop_backend == "pallas" and not cfg.use_beta
                 and not (train and cfg.prop_dropout > 0.0))
    ep_ok = (edge_partition and not cfg.use_beta
             and not (train and cfg.prop_dropout > 0.0))
    if ep_ok:
        # Edge-partitioned aggregation (parallel/edge_partition.py): the
        # shared-topology edge set shards over the mesh 'model' axis; each
        # device segment-softmaxes its edge shard and psum/pmax combine
        # over ICI. Same two-layer semantics as the Pallas/dense paths
        # (x_i messages, pre-softmax alpha handoff). Softmax-weight
        # dropout falls through to the XLA paths like prop_backend=pallas.
        from raindrop_tpu.parallel.edge_partition import (
            spmm_segment_softmax_sharded)

        ei, edge_weights = _edge_list(F_, global_adj, dtype)
        n_model = mesh.shape["model"]
        if ei.shape[1] % n_model:
            raise ValueError(
                f"the mesh 'model' axis size {n_model} must divide the "
                f"edge count {ei.shape[1]} for edge partitioning")
        gamma = jnp.broadcast_to(
            edge_weights[None].astype(jnp.float32), (B, ei.shape[1]))
        v1 = jax.nn.relu(linear_apply(params["ob_propagation"]["lin_value"],
                                      x_nodes)).astype(jnp.float32)
        out1, _ = spmm_segment_softmax_sharded(
            mesh, v1, gamma, ei[0], ei[1], gather_target=True)
        v2 = jax.nn.relu(linear_apply(
            params["ob_propagation_layer2"]["lin_value"],
            out1.astype(dtype))).astype(jnp.float32)
        out2, _ = spmm_segment_softmax_sharded(
            mesh, v2, gamma, ei[0], ei[1], gather_target=True)
        out2 = out2.astype(dtype)
        alpha_all = gamma.astype(dtype)                    # pre-softmax alpha
    elif pallas_ok:
        # Fused Pallas SpMM + segment-softmax backend (ops/sparse_pallas.py)
        # for GENERAL shared-topology graphs — complete or custom global_adj
        # alike. Each layer is the use_beta=False Ob_propagation step:
        # messages gather the TARGET's features (x_i quirk), softmax groups
        # by target, layer-2 edge weights are layer-1's pre-softmax alpha
        # == the input edge weights (reference code/Ob_propagation.py:190-200).
        # Softmax-weight dropout needs the XLA paths (kernel has none), so
        # pallas_ok excludes active prop_dropout; use_beta's per-sample
        # pruned topology is out of scope for the shared-topology kernel
        # (docs/PERFORMANCE.md) and falls through to the dense-β/COO paths.
        from raindrop_tpu.ops.sparse_pallas import spmm_segment_softmax

        ei, edge_weights = _edge_list(F_, global_adj, dtype)
        gamma = jnp.broadcast_to(
            edge_weights[None].astype(jnp.float32), (B, ei.shape[1]))
        v1 = jax.nn.relu(linear_apply(params["ob_propagation"]["lin_value"],
                                      x_nodes)).astype(jnp.float32)
        out1, _ = spmm_segment_softmax(
            v1, gamma, ei[0], ei[1], n_nodes=F_, gather_target=True)
        v2 = jax.nn.relu(linear_apply(
            params["ob_propagation_layer2"]["lin_value"],
            out1.astype(dtype))).astype(jnp.float32)
        out2, _ = spmm_segment_softmax(
            v2, gamma, ei[0], ei[1], n_nodes=F_, gather_target=True)
        out2 = out2.astype(dtype)
        alpha_all = gamma.astype(dtype)                    # pre-softmax alpha
    elif dense_ok and not cfg.use_beta:
        # Complete all-ones graph (code/Raindrop.py:212): dense fast path.
        # the shipped adjacency is all-ones (code/Raindrop.py:212) and the
        # layer-2 weights are layer-1's PRE-softmax alpha == those same
        # ones, so both layers take the uniform fast path (exact identity
        # absent softmax-weight dropout; see ob_propagate_dense_complete)
        adj = jnp.ones((F_, F_), dtype)
        out1, alpha1 = ob_propagate_dense_complete(
            params["ob_propagation"], x_nodes, adj,
            dropout_rate=cfg.prop_dropout, rng=r_prop1, train=train,
            uniform=True)
        # layer-2 edge weights are layer-1's pre-softmax alpha == adj weights
        adj2 = alpha1.reshape(B, F_, F_)
        out2, alpha2 = ob_propagate_dense_complete(
            params["ob_propagation_layer2"], out1, adj2,
            dropout_rate=cfg.prop_dropout, rng=r_prop2, train=train,
            uniform=True)
        alpha_all = alpha2                                  # [B, F*F]
    elif dense_ok and cfg.use_beta:
        # β/edge-pruning capability path, batched dense formulation —
        # exactly equal to the vmapped COO oracle below (tested), 22x
        # faster at P19 train scale (graph/propagate.py:
        # raindrop_propagate_beta_dense).
        adj = jnp.ones((F_, F_), dtype)
        out2, alpha_all = raindrop_propagate_beta_dense(
            params["ob_propagation"], params["ob_propagation_layer2"],
            x_nodes, pe_b, adj, ob_dim=d_ob,
            dropout_rate=cfg.prop_dropout,
            rng=jax.random.fold_in(r_prop1, 1), train=train,
            uniform_adj=True)
    else:
        edge_index, edge_weights = _edge_list(F_, global_adj, dtype)

        def one_sample(x, p_t, r1, r2):
            o1, (ei2, a1) = ob_propagate_coo(
                params["ob_propagation"], x, p_t, edge_index, edge_weights,
                use_beta=cfg.use_beta, ob_dim=d_ob, n_nodes=F_,
                dropout_rate=cfg.prop_dropout, rng=r1, train=train)
            w2 = a1 if a1.ndim == 1 else a1[:, 0]
            o2, (_, a2) = ob_propagate_coo(
                params["ob_propagation_layer2"], o1, p_t, ei2, w2,
                use_beta=False, ob_dim=d_ob, n_nodes=F_,
                dropout_rate=cfg.prop_dropout, rng=r2, train=train)
            return o2, a2[:, 0]

        r1s = jax.random.split(r_prop1, B)
        r2s = jax.random.split(r_prop2, B)
        out2, alpha_all = jax.vmap(one_sample)(x_nodes, pe_b, r1s, r2s)

    distance = alpha_pairwise_distance(alpha_all)          # code/models_rd.py:345-346
    output = _from_node_features(out2, T, d_ob)            # [B, T, F*d_ob]

    # --- time PE concat (code/models_rd.py:348-354) ---
    if cfg.sensor_wise_mask:
        ext = output.reshape(B, T, F_, d_ob)
        ext_pe = jnp.broadcast_to(pe_b[:, :, None, :], (B, T, F_, cfg.d_pe))
        output = jnp.concatenate([ext, ext_pe], axis=-1).reshape(
            B, T, F_ * (d_ob + cfg.d_pe))
    else:
        output = jnp.concatenate([output, pe_b], axis=-1)  # [B, T, F*d_ob+16]

    # --- temporal transformer (code/models_rd.py:356-358) ---
    mask = padding_mask(lengths, T)                        # [B, T] True = pad
    if pipeline_parallel:
        # GPipe product route: one encoder layer per 'model'-axis stage
        # (parallel/pipeline.py), `pipeline_parallel` microbatches
        from raindrop_tpu.parallel.pipeline import (
            pipeline_transformer_encoder)

        r_out = pipeline_transformer_encoder(
            mesh, params["transformer_encoder"], output, mask, cfg.nhead,
            pipeline_parallel, axis="model",
            dropout_rate=cfg.dropout, rng=r_trans, train=train)
    else:
        backend = (context_parallel if context_parallel != "none"
                   else cfg.attention_backend)
        r_out = transformer_encoder_apply(
            params["transformer_encoder"], output, mask, cfg.nhead,
            dropout_rate=cfg.dropout, rng=r_trans, train=train,
            backend=backend,
            score_dtype=cfg.attention_score_dtype, mesh=mesh)

    # --- masked aggregation (code/models_rd.py:364-379) ---
    if cfg.sensor_wise_mask:
        obs_b = observed.transpose(1, 0, 2)                # [B, T, F]
        pooled = sensor_wise_pool(
            r_out.reshape(B, T, F_, d_ob + cfg.d_pe), obs_b)
    else:
        pooled = masked_mean_pool(r_out, lengths)

    # --- static concat + head (code/models_rd.py:383-385) ---
    if cfg.static and static is not None:
        emb = linear_apply(params["emb"], static.astype(dtype))
        pooled = jnp.concatenate([pooled, emb], axis=1)
    logits = mlp_apply(params["mlp_static"], pooled)
    if cfg.compute_dtype is not None:
        # loss/metrics in full precision regardless of the compute dtype
        logits = logits.astype(jnp.dtype(cfg.dtype))
        distance = distance.astype(jnp.dtype(cfg.dtype))
    return logits, distance
