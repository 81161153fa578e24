"""Pallas sparse graph kernels: fused SpMM + segment-softmax, and SDDMM.

TPU-native equivalents of the reference's native sparse dependencies
(torch_scatter.scatter / torch_geometric.utils.softmax / PyG gather —
SURVEY.md §2.9) for sorted-COO sensor graphs.

Design: gather/scatter are the weak ops on TPU; with n_nodes = F <= 36 and
E = F^2 <= 1296 per sample, the winning formulation is *one-hot matmuls on
the MXU* — scatter-add over edges IS `onehot_dst @ msgs`, edge gather IS
`onehot_src @ nodes` (SURVEY.md §7 'SpMM as dense block-diagonal matmul').
The Pallas kernel fuses the whole chain per batch sample in VMEM:

    gather(x, idx) -> segment softmax over dst -> weighted scatter-add

so no [E, D] edge tensor ever reaches HBM. XLA reference paths live in
ops/segment.py; `ob_propagate_coo` (graph/propagate.py) remains the
semantics oracle; the dense complete-graph path remains the default for the
shipped all-ones topology. Use these kernels for general (non-complete,
pruned, or custom) graph structures at batch scale.

Both kernels assume a shared edge topology across the batch (the Raindrop
regime: one global sensor graph — reference code/Raindrop.py:212) and a
scalar weight per edge (the shipped use_beta=False path).

Precision: every one-hot dot runs at Precision.HIGHEST. The MXU's default
f32 path truncates operands to bf16, which made even the pure gather lossy
(max rel err ~1e-2 measured on v5e); at HIGHEST the kernel matches the XLA
segment-op oracle to 2e-6 abs at P19 scale (B=128, N=34, E=1156, D=240),
costing 1.64 ms vs 1.00 ms truncated — and vs 1.52 ms for the XLA segment
path, which is why the XLA path (and the dense complete-graph formulation)
stay the defaults at these sizes.

Where the fused SpMM WINS (measured, `bench.py --sparse-only`, round 5,
steady over repeated uncontended runs): actually-sparse batch-shared
topologies — kNN graph N=128, k=6, B=128, fwd+bwd: 1.15x the vmapped XLA
segment path. The SDDMM kernel, measured honestly, does NOT win at any
tested dims (dispatch-bound small, VMEM-limited large) and is kept as a
differentiable reference implementation with an opt-in product caller
(docs/PERFORMANCE.md "Sparse-topology crossover").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _onehot(idx_col: jnp.ndarray, n: int, E: int) -> jnp.ndarray:
    """[E, 1] int32 -> [E, n] float one-hot via iota compare (VPU)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (E, n), 1)
    return (idx_col == cols).astype(jnp.float32)


def _spmm_kernel(src_ref, dst_ref, x_ref, gamma_ref, use_x_target_ref,
                 out_ref, wout_ref, *, n_nodes, n_edges):
    """One batch sample: fused gather + segment-softmax + scatter-add.

    x [1, N, D]; gamma [1, 1, E]; src/dst [E, 1] int32 (VMEM);
    use_x_target: 1 -> messages gather the TARGET's features (the
    Ob_propagation x_i quirk, reference code/Ob_propagation.py:200),
    0 -> standard source gather.
    """
    E, N = n_edges, n_nodes
    oh_src = _onehot(src_ref[:], N, E)                  # [E, N]
    oh_dst = _onehot(dst_ref[:], N, E)                  # [E, N]
    gather_oh = jax.lax.select(use_x_target_ref[0] > 0, oh_dst, oh_src)

    g = gamma_ref[0, 0, :]                              # [E]
    # All one-hot dots run at Precision.HIGHEST: the MXU's DEFAULT truncates
    # f32 operands to bf16, which would make even the pure GATHER lossy
    # (~1e-2 rel err measured) — a gather/scatter must be exact.
    hi = functools.partial(jnp.dot, precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
    # segment max over dst: [N] = max_e dst_e==n ? g_e : -inf
    masked = jnp.where(oh_dst.T > 0, g[None, :], NEG_INF)   # [N, E]
    seg_max = jnp.max(masked, axis=1)                   # [N]
    edge_max = hi(oh_dst, seg_max[:, None])             # [E, 1] gather via MXU
    ex = jnp.exp(g[:, None] - edge_max)                 # [E, 1]
    denom = hi(oh_dst.T, ex)                            # [N, 1]
    denom = jnp.where(denom == 0.0, 1.0, denom)
    edge_den = hi(oh_dst, denom)                        # [E, 1]
    w = ex / edge_den                                   # [E, 1] softmaxed

    gathered = hi(gather_oh, x_ref[0])                  # [E, D]
    out_ref[0] = hi(oh_dst.T, gathered * w)             # [N, D]
    wout_ref[0, 0, :] = w[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def spmm_segment_softmax_p(x, gamma, edge_src, edge_dst, n_nodes,
                           gather_target):
    return _spmm_fwd(x, gamma, edge_src, edge_dst, n_nodes, gather_target)[0]


def _spmm_fwd(x, gamma, edge_src, edge_dst, n_nodes, gather_target):
    out, w = _spmm_call(x, gamma, edge_src, edge_dst, n_nodes, gather_target)
    return (out, w), (x, w, edge_src, edge_dst)


def _spmm_bwd(n_nodes, gather_target, res, cts):
    """Backward in XLA segment ops (not perf-critical relative to the fused
    forward): for out_n = sum_e w_e x[idx_e],
      dx[v]     = sum_{e: idx_e=v} w_e g[dst_e]
      dgamma_e  = w_e (s_e - sum_{e' in seg(e)} w_e' s_e'),  s_e = g[dst_e]·x[idx_e]
    """
    from raindrop_tpu.ops.segment import segment_sum as _ssum

    g_out, g_w = cts
    x, w, edge_src, edge_dst = res
    idx = edge_dst if gather_target else edge_src
    B, N, D = x.shape

    def one(gb, xb, wb, gwb):
        ge = gb[edge_dst] * wb[:, None]               # [E, D]
        dx = _ssum(ge, idx, N)
        # cotangent into the softmax weights: from out (s) and from the
        # returned weights themselves (gwb)
        s = jnp.sum(gb[edge_dst] * xb[idx], axis=-1) + gwb  # [E]
        inner = _ssum(wb * s, edge_dst, N)            # [N]
        dgamma = wb * (s - inner[edge_dst])
        return dx, dgamma

    dx, dgamma = jax.vmap(one)(g_out, x, w, g_w)
    return dx, dgamma, None, None


spmm_segment_softmax_p.defvjp(
    lambda x, g, s, d, n, t: ((lambda r: (r[0], r[1]))(
        _spmm_fwd(x, g, s, d, n, t))),
    _spmm_bwd)


def spmm_segment_softmax(
    x: jnp.ndarray,            # [B, N, D] node features
    gamma: jnp.ndarray,        # [B, E] pre-softmax edge logits
    edge_src: jnp.ndarray,     # [E] int32
    edge_dst: jnp.ndarray,     # [E] int32
    *,
    n_nodes: int,
    gather_target: bool = False,
):
    """out[b, n] = sum_{e: dst_e = n} softmax_n(gamma[b])_e * x[b, idx_e]
    with idx = dst (gather_target=True, the Ob_propagation quirk) or src.

    Returns (out [B, N, D], weights [B, E] post-softmax). Differentiable
    w.r.t. x and gamma via a custom VJP.
    """
    return spmm_segment_softmax_p(x, gamma, edge_src, edge_dst,
                                  n_nodes, gather_target)


def _spmm_call(x, gamma, edge_src, edge_dst, n_nodes, gather_target):
    B, N, D = x.shape
    E = edge_src.shape[0]
    src_col = edge_src.astype(jnp.int32).reshape(E, 1)
    dst_col = edge_dst.astype(jnp.int32).reshape(E, 1)
    flag = jnp.asarray([1 if gather_target else 0], jnp.int32)

    kernel = functools.partial(_spmm_kernel, n_nodes=N, n_edges=E)
    out, w = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                # src
            pl.BlockSpec(memory_space=pltpu.VMEM),                # dst
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # x
            pl.BlockSpec((1, 1, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),                # gamma
            pl.BlockSpec(memory_space=pltpu.SMEM),                # flag
        ],
        out_specs=[
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, E), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, E), jnp.float32)],
        interpret=_use_interpret(),
    )(src_col, dst_col, x, gamma.reshape(B, 1, E), flag)
    return out, w[:, 0, :]


def _sddmm_kernel(src_ref, dst_ref, q_ref, k_ref, alpha_ref, *,
                  n_nodes, n_edges, scale):
    E, N = n_edges, n_nodes
    oh_src = _onehot(src_ref[:], N, E)
    oh_dst = _onehot(dst_ref[:], N, E)
    qe = jnp.dot(oh_dst, q_ref[0], precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    ke = jnp.dot(oh_src, k_ref[0], precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    alpha_ref[0, 0, :] = jnp.sum(qe * ke, axis=-1) * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def sddmm(
    q: jnp.ndarray,            # [B, N, D] target-side features
    k: jnp.ndarray,            # [B, N, D] source-side features
    edge_src: jnp.ndarray,     # [E] int32
    edge_dst: jnp.ndarray,     # [E] int32
    scale: float = 1.0,
):
    """Per-edge scaled dot products alpha[b, e] = scale * q[b, dst_e]·k[b, src_e]
    — the attention-score half of TransformerConv / graph self-attention
    (reference code/transformer_conv.py:199, code/Ob_propagation.py:134-155)
    without materializing [E, D] gathers in HBM. Differentiable: the VJP
    scatter-adds d_alpha-weighted partner features back to the nodes
    (XLA segment sums — the backward is bandwidth-trivial next to the
    forward's one-hot MXU dots)."""
    return _sddmm_call(q, k, edge_src, edge_dst, scale)


def _sddmm_fwd(q, k, edge_src, edge_dst, scale):
    alpha = _sddmm_call(q, k, edge_src, edge_dst, scale)
    return alpha, (q, k, edge_src, edge_dst)


def _sddmm_bwd(scale, res, d_alpha):
    q, k, edge_src, edge_dst = res
    N = q.shape[1]
    w = (d_alpha * scale)[..., None]                       # [B, E, 1]
    dq = jax.ops.segment_sum(
        (w * k[:, edge_src].astype(jnp.float32)).swapaxes(0, 1),
        edge_dst.astype(jnp.int32), num_segments=N).swapaxes(0, 1)
    dk = jax.ops.segment_sum(
        (w * q[:, edge_dst].astype(jnp.float32)).swapaxes(0, 1),
        edge_src.astype(jnp.int32), num_segments=N).swapaxes(0, 1)
    return dq.astype(q.dtype), dk.astype(k.dtype), None, None


def _sddmm_call(q, k, edge_src, edge_dst, scale):
    B, N, D = q.shape
    E = edge_src.shape[0]
    kernel = functools.partial(_sddmm_kernel, n_nodes=N, n_edges=E,
                               scale=scale)
    alpha = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, E), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, E), jnp.float32),
        interpret=_use_interpret(),
    )(edge_src.astype(jnp.int32).reshape(E, 1),
      edge_dst.astype(jnp.int32).reshape(E, 1), q, k)
    return alpha[:, 0, :]


sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)
