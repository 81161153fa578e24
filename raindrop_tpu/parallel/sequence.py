"""Sequence (time-axis) parallel attention — the long-context scaling slot.

The reference caps sequences per dataset (T <= 600) and needs nothing
beyond one device (SURVEY.md §5.7); this module is the designed-in
scale-out path for longer-horizon datasets: queries are sharded along the
time axis over the mesh 'model' axis, keys/values are all-gathered across
it (Ulysses-style all-to-all degenerates to all-gather for self-attention
with full heads per device), and each device computes attention for its
time shard only — O(T^2) attention memory divides by the axis size.

Collectives ride ICI via jax.lax.all_gather inside shard_map; numerics are
identical to single-device masked attention (tested on a virtual mesh).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _dropout_keep(seed, sample0, n_b, n_h, t_q, t_k, q_off, k_off, rate):
    """Sharding-invariant attention-probability dropout mask over GLOBAL
    (sample, head, query, key) coordinates — a counter-based integer hash
    (xorshift-multiply finalizer, the same family as
    ops/flash_attention._dropout_keep_hash), so every device computes an
    identical decision for the same logical cell no matter how the T axis
    is sharded or which ring hop delivers the block. Keeps forward ==
    backward by construction (pure function of coordinates)."""
    u32 = jnp.uint32

    def coord(n, off, dim):
        shape = [1, 1, 1, 1]
        shape[dim] = n
        return (jnp.arange(n, dtype=u32) + off).reshape(shape)

    x = (jnp.asarray(seed).astype(u32) * u32(0x9E3779B9)
         ^ (coord(n_b, sample0.astype(u32), 0) + u32(1)) * u32(0x85EBCA6B)
         ^ (coord(n_h, u32(0), 1) + u32(1)) * u32(0xC2B2AE35)
         ^ (coord(t_q, q_off.astype(u32), 2) + u32(1)) * u32(0x27D4EB2F)
         ^ (coord(t_k, k_off.astype(u32), 3) + u32(1)) * u32(0x165667B1))
    x = x ^ (x >> 16)
    x = x * u32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * u32(0x846CA68B)
    x = x ^ (x >> 16)
    threshold = u32(int(rate * float(2 ** 32)))
    return (x >= threshold).astype(jnp.float32)


def sequence_parallel_attention(
    mesh: Mesh,
    q: jnp.ndarray,          # [B, H, T, D]
    k: jnp.ndarray,          # [B, H, T, D]
    v: jnp.ndarray,          # [B, H, T, D]
    lengths: jnp.ndarray,    # [B] valid key counts
    *,
    dropout_rate: float = 0.0,
    seed=None,
) -> jnp.ndarray:
    """softmax(QK^T/sqrt(D) + padmask)V with q/k/v sharded on T over
    'model' and batch over 'data'. T must divide the 'model' axis size.

    dropout_rate/seed: attention-probability dropout from the sharding-
    invariant coordinate hash (`_dropout_keep`) — the distributed
    backends' own stream (dropout masks differ between attention backends
    by construction, same convention as flash vs dense).
    """
    T = q.shape[2]
    D = q.shape[3]
    H = q.shape[1]
    scale = 1.0 / math.sqrt(D)
    t_loc = T // mesh.shape["model"]
    b_loc = max(q.shape[0] // mesh.shape["data"], 1)

    def shard_fn(qs, ks, vs, ls, sd):
        # qs: [b_loc, H, T_loc, D]; gather full keys/values along 'model'
        kf = jax.lax.all_gather(ks, "model", axis=2, tiled=True)  # [b,H,T,D]
        vf = jax.lax.all_gather(vs, "model", axis=2, tiled=True)
        s = jnp.einsum("bhqd,bhkd->bhqk", qs * scale, kf)
        col = jnp.arange(T)[None, None, None, :]
        s = jnp.where(col < ls[:, None, None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        # fully-padded query rows -> zeros (framework convention)
        p = jnp.where(jnp.all(col >= ls[:, None, None, None], axis=-1,
                              keepdims=True), 0.0, p)
        if dropout_rate > 0.0:
            sample0 = jax.lax.axis_index("data") * b_loc
            q_off = jax.lax.axis_index("model") * t_loc
            keep = _dropout_keep(sd[0], sample0, qs.shape[0], H, t_loc, T,
                                 q_off, jnp.uint32(0), dropout_rate)
            p = p * keep / (1.0 - dropout_rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, vf)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", None, "model"), P("data", None, "model"),
                  P("data", None, "model"), P("data"), P()),
        out_specs=P("data", None, "model"),
    )
    sd = (jnp.zeros((1,), jnp.int32) if seed is None
          else jnp.asarray(seed, jnp.int32).reshape(1))
    return fn(q, k, v, lengths.astype(jnp.int32), sd)


def ring_attention(
    mesh: Mesh,
    q: jnp.ndarray,          # [B, H, T, D]
    k: jnp.ndarray,          # [B, H, T, D]
    v: jnp.ndarray,          # [B, H, T, D]
    lengths: jnp.ndarray,    # [B] valid key counts
    axis: str = "model",
    *,
    dropout_rate: float = 0.0,
    seed=None,
) -> jnp.ndarray:
    """Ring attention over the time axis (SURVEY.md §2.5's context-
    parallel slot): q/k/v are sharded on T over `axis` and — unlike
    `sequence_parallel_attention`, which all-gathers full K/V — the K/V
    blocks STAY sharded and rotate around the ring one hop per step via
    `jax.lax.ppermute` (ICI neighbor exchange), while each device folds the
    visiting block into its queries with the online-softmax recurrence
    (running max / sum / accumulator — the same flash-attention math as
    ops/flash_attention.py's streaming kernel). Per-device memory is
    O(T/n) for K/V and O(T_loc * T_loc) for scores, so the context length
    scales with the ring size; the ppermute of the NEXT block overlaps the
    current block's compute in XLA's schedule.

    Padding semantics match the framework convention: padded keys are
    masked by global column index, fully-padded query rows emit zeros.
    Numerically equal to dense masked attention to fp tolerance (tested on
    the virtual mesh vs the single-device oracle).
    """
    n = mesh.shape[axis]
    T, D, H = q.shape[2], q.shape[3], q.shape[1]
    if T % n:
        raise ValueError(f"T={T} must divide the '{axis}' axis size {n}")
    t_loc = T // n
    scale = 1.0 / math.sqrt(D)
    b_loc = max(q.shape[0] // mesh.shape["data"], 1)
    perm = [(j, (j + 1) % n) for j in range(n)]

    def shard_fn(qs, ks, vs, ls, sd):
        # qs/ks/vs: [b_loc, H, t_loc, D]; this device owns ring slot `idx`
        idx = jax.lax.axis_index(axis)
        qsf = qs.astype(jnp.float32) * scale
        # initial carry derived from the sharded input so its device-
        # varying axes match the loop body's outputs (shard_map tracks
        # varying axes through scan carries)
        zero = qsf[..., :1] * 0.0
        m0 = zero - jnp.inf
        l0 = zero
        acc0 = qsf * 0.0

        def fold(i, m, l, acc, kb, vb):
            # after i hops, the visiting block originated at slot idx - i
            src = (idx - i) % n
            col = jnp.arange(t_loc)[None, None, :] + src * t_loc  # [1,1,t]
            bias = jnp.where(col[:, :, None, :] < ls[:, None, None, None],
                             0.0, -1e30)                  # [b,1,1,t_loc]
            s = jnp.einsum("bhqd,bhkd->bhqk", qsf,
                           kb.astype(jnp.float32)) + bias
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            # masked cols underflow to exact 0; the min+re-bias guards the
            # all-masked-so-far corner where m_new is still -inf
            p = jnp.exp(jnp.minimum(s - m_new, 0.0) + bias)
            corr = jnp.exp(jnp.minimum(m - m_new, 0.0))
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            if dropout_rate > 0.0:
                # drop AFTER the denominator accumulates (flash-kernel
                # convention: dropout scales probabilities, not the
                # softmax normalizer), keyed on global coordinates so the
                # mask is invariant to which hop delivers the block
                sample0 = jax.lax.axis_index("data") * b_loc
                keep = _dropout_keep(sd[0], sample0, qs.shape[0], H,
                                     t_loc, t_loc, idx * t_loc,
                                     src * t_loc, dropout_rate)
                p = p * keep / (1.0 - dropout_rate)
            acc_new = acc * corr + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vb.astype(jnp.float32))
            return m_new, l_new, acc_new

        # n-1 fold+rotate steps (a scan, so reverse-mode AD works for the
        # training product route — fori_loop would not transpose), then
        # fold the last visiting block WITHOUT a final rotation (its
        # result would be discarded — one wasted neighbor-exchange pair
        # per call otherwise)
        def body(carry, i):
            m, l, acc, kb, vb = carry
            m, l, acc = fold(i, m, l, acc, kb, vb)
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            return (m, l, acc, kb, vb), None

        (m, l, acc, kb, vb), _ = jax.lax.scan(
            body, (m0, l0, acc0, ks, vs), jnp.arange(n - 1))
        m, l, acc = fold(n - 1, m, l, acc, kb, vb)
        out = acc / jnp.where(l > 0, l, 1.0)
        return out.astype(q.dtype)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", None, axis), P("data", None, axis),
                  P("data", None, axis), P("data"), P()),
        out_specs=P("data", None, axis),
    )
    sd = (jnp.zeros((1,), jnp.int32) if seed is None
          else jnp.asarray(seed, jnp.int32).reshape(1))
    return fn(q, k, v, lengths.astype(jnp.int32), sd)
