"""Blockwise (flash) multi-head attention — Pallas TPU kernel.

The temporal transformer is the hot op of the whole model at PAM scale
(T=600): XLA's dense attention materializes [B, H, T, T] logits in HBM
(~740 MB at B=128), making the step HBM-bound. This kernel computes
softmax(QK^T/√d + mask)V blockwise in VMEM with the online-softmax
recurrence — logits never leave the chip.

Covers the reference's nn.MultiheadAttention semantics used at
reference code/models_rd.py:356-358:
  * key-padding mask (padded keys get -inf logits);
  * attention-probability dropout (torch passes the layer dropout into MHA);
    regenerated identically in forward and backward — from the TPU hardware
    PRNG (pltpu.prng_seed/prng_random_bits, reseeded per (batch*head,
    q-block, k-block)) on real hardware, and from a counter-based integer
    hash in interpret mode (no Mosaic lowering for the PRNG there);
  * fully-padded query rows produce zeros (matches nn/transformer.py's safe
    softmax, not torch's NaN).

Two regimes:
  * T_pad <= MAX_FUSED_T — ONE program per (batch*head) holds q, k, v and
    the full T x T score matrix in VMEM: two MXU matmuls, no streaming
    overhead, and the inputs stay UNPADDED [BH, T, hd] (lane padding happens
    inside the VMEM tiles for free) so the wrapper does no pad/slice/copy
    layout churn at all. Measured on v5e at PAM dims (B=128, H=2, T=600,
    hd=42) this path is ~2.5x XLA dense fwd+bwd.
  * larger T — classic streaming flash (128-row q/k blocks, online softmax,
    separate dq and dk/dv passes), inputs padded to the 128 block.

Masking is one additive [1, T] bias row (0 for valid keys, -1e30 for
padded): exp(s - m) then UNDERFLOWS TO EXACT ZERO for masked columns
whenever the row has >= 1 valid key, so no per-element select is spent
re-masking the [T, T] probability matrix (the VPU, not the MXU, is the
bottleneck of this kernel at head_dim 42). Degenerate all-padded rows
(length == 0) are fixed up with one select on the output.

`compute_dtype="bfloat16"` stores q/k/v (and do) operands in bf16: MXU
matmuls run native bf16 with f32 accumulation (preferred_element_type) and
softmax statistics/lse stay f32. ~1e-2-relative output error; the model's
flash path opts in via RaindropConfig.attention_score_dtype (default
bfloat16 — the TPU-native choice), parity oracles pass None for exact f32.

Custom VJP: FLOPs are recomputed blockwise in the backward kernels from the
saved log-sum-exp — the standard flash backward.

Shapes: q, k, v [B, H, T, D]; lengths [B] valid-key counts.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
NEG_INF = -1e30

MAX_FUSED_T = 1024


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# dropout mask generation: TPU hardware PRNG on device, counter-hash in
# interpret mode. Both are deterministic in (seed, bh, iq, ik) so forward
# and backward regenerate identical masks by construction.
# --------------------------------------------------------------------------

def _dropout_keep_hash(seed_ref, bh, iq, ik, shape, rate):
    """Counter-based integer hash (xorshift-multiply finalizer); pure jnp,
    so it runs under Mosaic AND in CPU interpret mode."""
    rows, cols = shape
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (seed_ref[0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         ^ (bh.astype(jnp.uint32) + jnp.uint32(1)) * jnp.uint32(0x85EBCA6B)
         ^ (jnp.uint32(iq) * jnp.uint32(rows) + r) * jnp.uint32(0xC2B2AE35)
         ^ (jnp.uint32(ik) * jnp.uint32(cols) + c) * jnp.uint32(0x27D4EB2F))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(int(rate * float(2 ** 32)))
    return (x >= threshold).astype(jnp.float32)


def _dropout_keep(seed_ref, bh, iq, ik, shape, rate, hw_prng):
    if not hw_prng:
        return _dropout_keep_hash(seed_ref, bh, iq, ik, shape, rate)
    # Hardware PRNG: reseed deterministically per (seed, bh, iq, ik) so
    # every kernel (fwd, dq, dkv) regenerates the same bits for the same
    # logical block regardless of its own loop order. Mosaic accepts at
    # most 2 seed words — fold the block coordinates into them.
    s0 = seed_ref[0] + bh * jnp.int32(-2048144789)       # 0x85EBCA6B
    s1 = (jnp.int32(iq) * jnp.int32(-1640531527)         # 0x9E3779B9
          + jnp.int32(ik) * jnp.int32(-1028477387))      # 0xC2B2AE35
    pltpu.prng_seed(s0, s1)
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(int(rate * float(2 ** 32)))
    return (pltpu.bitcast(bits, jnp.uint32) >= threshold).astype(jnp.float32)


def _col_bias(length, t):
    """[1, t] additive mask row: 0 for col < length else NEG_INF."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    return jnp.where(col < length, 0.0, NEG_INF).astype(jnp.float32)


# --------------------------------------------------------------------------
# fused single-program kernels (T_pad <= MAX_FUSED_T): whole head in VMEM
# --------------------------------------------------------------------------

def _fused_fwd_kernel(seed_ref, lengths_ref, q_ref, k_ref, v_ref,
                      o_ref, lse_ref, *, scale, dropout_rate, t, hw_prng):
    bh = pl.program_id(0)
    length = lengths_ref[bh]
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + _col_bias(length, t)                         # [T, T] + [1, T]
    m = jnp.max(s, axis=1, keepdims=True)
    # masked cols: s - m <= NEG_INF/2 -> exp underflows to exact 0 for any
    # row with >= 1 valid key; length==0 rows are garbage, fixed up below
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _dropout_keep(seed_ref, bh, 0, 0, (t, t), dropout_rate,
                             hw_prng)
        p = p * keep / (1.0 - dropout_rate)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / l
    valid = length > 0
    o_ref[0] = jnp.where(valid, o, 0.0)
    lse_ref[0, 0, :] = jnp.where(valid, m[:, 0] + jnp.log(l[:, 0]), NEG_INF)


def _fused_bwd_kernel(seed_ref, lengths_ref, q_ref, k_ref, v_ref, do_ref,
                      lse_ref, delta_ref, dq_ref, dk_ref, dv_ref,
                      *, scale, dropout_rate, t, hw_prng):
    bh = pl.program_id(0)
    length = lengths_ref[bh]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, :][:, None]
    delta = delta_ref[0, 0, :][:, None]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + _col_bias(length, t)
    # p = exp(s - lse): masked cols underflow to 0 (s has the -1e30 bias and
    # lse is finite for valid rows); all-padded rows have lse == NEG_INF and
    # produce garbage that the `valid` select below zeroes out.
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        keep = _dropout_keep(seed_ref, bh, 0, 0, (t, t), dropout_rate,
                             hw_prng)
        p_drop = p * keep / (1.0 - dropout_rate)
        dp = dp * keep / (1.0 - dropout_rate)
    else:
        p_drop = p
    ds = p * (dp - delta)
    valid = (length > 0).astype(jnp.float32)
    od = v_ref.dtype
    dq_ref[0] = jax.lax.dot_general(
        ds.astype(od), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * valid)
    dk_ref[0] = jax.lax.dot_general(
        ds.astype(od), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * valid)
    dv_ref[0] = jax.lax.dot_general(
        p_drop.astype(od), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * valid


# --------------------------------------------------------------------------
# streaming kernels (T_pad > MAX_FUSED_T): 128-row blocks, online softmax
# --------------------------------------------------------------------------

def _fwd_kernel(seed_ref, lengths_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                *, scale, dropout_rate, t_pad, hw_prng):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    nk = t_pad // BLOCK
    q = q_ref[0]                                           # [BLOCK, D]
    length = lengths_ref[bh]

    m = jnp.full((BLOCK, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((BLOCK, 1), jnp.float32)
    acc = jnp.zeros(q.shape, jnp.float32)

    def body(ik, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ik * BLOCK, BLOCK), :]
        v = v_ref[0, pl.ds(ik * BLOCK, BLOCK), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1) + ik * BLOCK
        s = s + jnp.where(col < length, 0.0, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        # masked cols underflow to exact 0 (finite -1e30 bias); a fully-
        # masked BLOCK keeps m_new == m from the carry, and if the carry is
        # still NEG_INF (no valid key seen yet) s - m_new is ~0 for masked
        # entries — so re-guard only that corner with the bias sign
        p = jnp.exp(jnp.minimum(s - m_new, 0.0) + jnp.where(
            col < length, 0.0, NEG_INF))
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref, bh, iq, ik, (BLOCK, BLOCK),
                                 dropout_rate, hw_prng)
            p = p * keep / (1.0 - dropout_rate)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, nk, body, (m, l, acc))
    safe_l = jnp.where(l > 0, l, 1.0)
    o_ref[0] = acc / safe_l
    # lse for backward; NEG_INF rows (fully padded) give lse = NEG_INF
    lse_ref[0, 0, pl.ds(iq * BLOCK, BLOCK)] = jnp.where(
        l[:, 0] > 0, m[:, 0] + jnp.log(safe_l[:, 0]), NEG_INF)


def _dq_kernel(seed_ref, lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
               delta_ref, dq_ref, *, scale, dropout_rate, t_pad, hw_prng):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    nk = t_pad // BLOCK
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0, pl.ds(iq * BLOCK, BLOCK)][:, None]
    delta = delta_ref[0, 0, pl.ds(iq * BLOCK, BLOCK)][:, None]
    length = lengths_ref[bh]
    od = v_ref.dtype

    def body(ik, dq):
        k = k_ref[0, pl.ds(ik * BLOCK, BLOCK), :]
        v = v_ref[0, pl.ds(ik * BLOCK, BLOCK), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1) + ik * BLOCK
        s = s + jnp.where(col < length, 0.0, NEG_INF)
        # lse == NEG_INF (all-padded row) -> s - lse ~ finite garbage; those
        # rows are zeroed by the `valid` factor on dq below
        p = jnp.exp(jnp.minimum(s - lse, 0.0) + jnp.where(
            col < length, 0.0, NEG_INF))
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref, bh, iq, ik, (BLOCK, BLOCK),
                                 dropout_rate, hw_prng)
            dp = dp * keep / (1.0 - dropout_rate)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds.astype(od), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros(q.shape, jnp.float32))
    dq_ref[0] = dq * (scale * (length > 0).astype(jnp.float32))


def _dkv_kernel(seed_ref, lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                delta_ref, dk_ref, dv_ref, *, scale, dropout_rate, t_pad,
                hw_prng):
    bh = pl.program_id(0)
    ik = pl.program_id(1)
    nq = t_pad // BLOCK
    k = k_ref[0]                                            # [BLOCK, D]
    v = v_ref[0]
    length = lengths_ref[bh]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1) + ik * BLOCK
    bias = jnp.where(col < length, 0.0, NEG_INF)
    od = v_ref.dtype

    def body(iq, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(iq * BLOCK, BLOCK), :]
        do = do_ref[0, pl.ds(iq * BLOCK, BLOCK), :]
        lse = lse_ref[0, 0, pl.ds(iq * BLOCK, BLOCK)][:, None]
        delta = delta_ref[0, 0, pl.ds(iq * BLOCK, BLOCK)][:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(jnp.minimum(s + bias - lse, 0.0) + bias)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref, bh, iq, ik, (BLOCK, BLOCK),
                                 dropout_rate, hw_prng)
            p_drop = p * keep / (1.0 - dropout_rate)
            dp = dp * keep / (1.0 - dropout_rate)
        else:
            p_drop = p
        ds = p * (dp - delta)
        dv_new = dv + jax.lax.dot_general(
            p_drop.astype(od), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_new = dk + jax.lax.dot_general(
            ds.astype(od), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk, dv = jax.lax.fori_loop(
        0, nq, body, (jnp.zeros(k.shape, jnp.float32),
                      jnp.zeros(v.shape, jnp.float32)))
    valid = (length > 0).astype(jnp.float32)
    dk_ref[0] = dk * (scale * valid)
    dv_ref[0] = dv * valid


# --------------------------------------------------------------------------
# wrappers
# --------------------------------------------------------------------------

def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _specs(t_pad, d_pad, blocked: bool):
    """BlockSpec over [BH, T, D]: one (bh, iq) program sees either one
    128-row block (blocked=True) or the full sequence."""
    if blocked:
        return pl.BlockSpec((1, BLOCK, d_pad), lambda bh, i: (bh, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, t_pad, d_pad), lambda bh, *i: (bh, 0, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(t_pad):
    # lse/delta live as [BH, 1, t_pad]; always a full-row block, programs
    # slice their BLOCK window with pl.ds.
    return pl.BlockSpec((1, 1, t_pad), lambda bh, *i: (bh, 0, 0),
                        memory_space=pltpu.VMEM)


def _scalar_specs():
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed [1]
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # lengths [BH]
    ]


def _operand_dtype(compute_dtype):
    if compute_dtype is None:
        return jnp.float32
    dt = jnp.dtype(compute_dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"unsupported flash compute_dtype {compute_dtype}")
    return dt


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_mha(q, k, v, lengths, seed=None, dropout_rate=0.0,
              compute_dtype=None):
    """softmax(QK^T/√D + padmask)V, blockwise.

    q, k, v: [B, H, T, D] float32; lengths: [B] int32 valid key counts.
    seed: int32 array [1] (traced — no recompile per step); dropout_rate and
    compute_dtype are static. seed=None means 0. compute_dtype None keeps
    exact f32 operands; "bfloat16" stores operands bf16 (native MXU passes,
    f32 accumulation, f32 softmax statistics — ~1e-2 relative error).
    """
    o, _ = _flash_fwd(q, k, v, lengths, seed, dropout_rate, compute_dtype)
    return o


def _seed_arr(seed):
    return (jnp.zeros((1,), jnp.int32) if seed is None
            else jnp.asarray(seed, jnp.int32).reshape(1))


def _fused_call(q, k, v, lengths, seed, dropout_rate, compute_dtype):
    """Fused path: inputs [B, H, T, D] unpadded (T padded to sublane 8)."""
    B, H, T, D = q.shape
    t8 = -(-T // 8) * 8
    od = _operand_dtype(compute_dtype)
    interpret = _use_interpret()

    def prep(x):
        return _pad_to(x, t8, 2).reshape(B * H, t8, D).astype(od)

    qp, kp, vp = prep(q), prep(k), prep(v)
    lens = jnp.repeat(lengths.astype(jnp.int32), H)
    scale = 1.0 / math.sqrt(D)
    kernel = functools.partial(_fused_fwd_kernel, scale=scale,
                               dropout_rate=dropout_rate, t=t8,
                               hw_prng=not interpret)
    full = pl.BlockSpec((1, t8, D), lambda bh: (bh, 0, 0),
                        memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=_scalar_specs() + [full, full, full],
        out_specs=[pl.BlockSpec((1, t8, D), lambda bh: (bh, 0, 0),
                                memory_space=pltpu.VMEM), _row_spec(t8)],
        out_shape=[jax.ShapeDtypeStruct((B * H, t8, D), jnp.float32),
                   jax.ShapeDtypeStruct((B * H, 1, t8), jnp.float32)],
        interpret=interpret,
    )(_seed_arr(seed), lens, qp, kp, vp)
    return o, lse, (qp, kp, vp, lens)


def _streaming_call(q, k, v, lengths, seed, dropout_rate, compute_dtype):
    B, H, T, D = q.shape
    t_pad = -(-T // BLOCK) * BLOCK
    d_pad = max(-(-D // BLOCK) * BLOCK, BLOCK)
    od = _operand_dtype(compute_dtype)
    scale = 1.0 / math.sqrt(D)
    interpret = _use_interpret()

    def prep(x):
        return (_pad_to(_pad_to(x, t_pad, 2), d_pad, 3)
                .reshape(B * H, t_pad, d_pad).astype(od))

    qp, kp, vp = prep(q), prep(k), prep(v)
    lens = jnp.repeat(lengths.astype(jnp.int32), H)
    grid = (B * H, t_pad // BLOCK)
    kernel = functools.partial(_fwd_kernel, scale=scale,
                               dropout_rate=dropout_rate, t_pad=t_pad,
                               hw_prng=not interpret)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_scalar_specs() + [
            _specs(t_pad, d_pad, blocked=True),    # q
            _specs(t_pad, d_pad, blocked=False),   # k
            _specs(t_pad, d_pad, blocked=False),   # v
        ],
        out_specs=[_specs(t_pad, d_pad, blocked=True), _row_spec(t_pad)],
        out_shape=[jax.ShapeDtypeStruct((B * H, t_pad, d_pad), jnp.float32),
                   jax.ShapeDtypeStruct((B * H, 1, t_pad), jnp.float32)],
        interpret=interpret,
    )(_seed_arr(seed), lens, qp, kp, vp)
    return o, lse, (qp, kp, vp, lens)


def _flash_fwd(q, k, v, lengths, seed, dropout_rate, compute_dtype):
    B, H, T, D = q.shape
    fused = -(-T // 8) * 8 <= MAX_FUSED_T
    call = _fused_call if fused else _streaming_call
    o_p, lse, (qp, kp, vp, lens) = call(
        q, k, v, lengths, seed, dropout_rate, compute_dtype)
    t_p, d_p = o_p.shape[1], o_p.shape[2]
    o = o_p.reshape(B, H, t_p, d_p)[:, :, :T, :D]
    return o, (qp, kp, vp, lens, _seed_arr(seed), o_p, lse, (B, H, T, D))


def _flash_bwd(dropout_rate, compute_dtype, res, g):
    qp, kp, vp, lens, seed_arr, o_p, lse, (B, H, T, D) = res
    t_p, d_p = qp.shape[1], qp.shape[2]
    od = qp.dtype
    scale = 1.0 / math.sqrt(D)
    interpret = _use_interpret()
    do = (_pad_to(_pad_to(g, t_p, 2), d_p, 3)
          .reshape(B * H, t_p, d_p).astype(od))
    # delta in f32 from the f32 saved output
    delta = jnp.sum(do.astype(jnp.float32) * o_p, axis=-1)[:, None, :]

    if -(-T // 8) * 8 <= MAX_FUSED_T:
        full = pl.BlockSpec((1, t_p, d_p), lambda bh: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_fused_bwd_kernel, scale=scale,
                              dropout_rate=dropout_rate, t=t_p,
                              hw_prng=not interpret),
            grid=(B * H,),
            in_specs=_scalar_specs() + [full, full, full, full,
                                        _row_spec(t_p), _row_spec(t_p)],
            out_specs=[full, full, full],
            out_shape=[jax.ShapeDtypeStruct((B * H, t_p, d_p),
                                            jnp.float32)] * 3,
            interpret=interpret,
        )(seed_arr, lens, qp, kp, vp, do, lse, delta)

        def unpad(x):
            return x.reshape(B, H, t_p, d_p)[:, :, :T, :D]

        return unpad(dq), unpad(dk), unpad(dv), None, None

    grid = (B * H, t_p // BLOCK)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale,
                          dropout_rate=dropout_rate, t_pad=t_p,
                          hw_prng=not interpret),
        grid=grid,
        in_specs=_scalar_specs() + [
            _specs(t_p, d_p, blocked=True),    # q
            _specs(t_p, d_p, blocked=False),   # k
            _specs(t_p, d_p, blocked=False),   # v
            _specs(t_p, d_p, blocked=True),    # do
            _row_spec(t_p),                    # lse
            _row_spec(t_p),                    # delta
        ],
        out_specs=_specs(t_p, d_p, blocked=True),
        out_shape=jax.ShapeDtypeStruct((B * H, t_p, d_p), jnp.float32),
        interpret=interpret,
    )(seed_arr, lens, qp, kp, vp, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale,
                          dropout_rate=dropout_rate, t_pad=t_p,
                          hw_prng=not interpret),
        grid=grid,
        in_specs=_scalar_specs() + [
            _specs(t_p, d_p, blocked=False),   # q
            _specs(t_p, d_p, blocked=True),    # k
            _specs(t_p, d_p, blocked=True),    # v
            _specs(t_p, d_p, blocked=False),   # do
            _row_spec(t_p),                    # lse
            _row_spec(t_p),                    # delta
        ],
        out_specs=[_specs(t_p, d_p, blocked=True),
                   _specs(t_p, d_p, blocked=True)],
        out_shape=[jax.ShapeDtypeStruct((B * H, t_p, d_p), jnp.float32),
                   jax.ShapeDtypeStruct((B * H, t_p, d_p), jnp.float32)],
        interpret=interpret,
    )(seed_arr, lens, qp, kp, vp, do, lse, delta)

    def unpad(x):
        return x.reshape(B, H, t_p, d_p)[:, :, :T, :D]

    return unpad(dq), unpad(dk), unpad(dv), None, None


flash_mha.defvjp(_flash_fwd, _flash_bwd)


# --------------------------------------------------------------------------
# Packed-heads fused kernels: q/k/v stay in the model's natural [B, T, d]
# layout (d = H*hd). Per-head score dots need NO head split because q and k
# keep each head's channels in the SAME column range — masking the other
# heads' lanes to zero makes (q . m_h) @ (k . m_h)^T contract exactly over
# head h's channels — and each head's PV product lands its output in its
# own column range, so summing over heads yields the merged [T, d] output
# directly. This removes every [B,T,H,hd] <-> [B,H,T,hd] transpose/copy the
# split-head wrapper pays on both the forward and backward paths (measured
# ~10% of the PAM train step). One program per SAMPLE computes all heads.
# --------------------------------------------------------------------------


def _head_mask(d, h, hd, ref_dtype):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    return ((lane >= h * hd) & (lane < (h + 1) * hd)).astype(ref_dtype)


LOG2E = 1.4426950408889634


def _packed_fwd_kernel(seed_ref, lengths_ref, q_ref, k_ref, v_ref,
                       o_ref, lse_ref, *, scale, dropout_rate, t, nhead,
                       hw_prng):
    # Softmax runs in BASE 2 with log2(e) folded into the score scale:
    # exp lowers to exp2+multiply on the VPU, and this kernel is VPU-bound
    # at head_dim 42 — pre-folding removes one multiply pass over every
    # [T, T] score element. The saved lse is in base-2 units (consumed
    # only by _packed_bwd_kernel, same convention).
    #
    # Masking economics: only K (and V) need the head-lane mask — q's
    # other-head lanes hit k's zeroed lanes in the dot, so (q)·(k*m_h)
    # already contracts over exactly head h's channels; each head's PV
    # lands in its own column range because v is masked.
    b = pl.program_id(0)
    length = lengths_ref[b]
    d = q_ref.shape[-1]
    hd = d // nhead
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = _col_bias(length, t)
    valid = length > 0
    scale2 = scale * LOG2E
    o = jnp.zeros(q.shape, jnp.float32)
    for h in range(nhead):
        m_h = _head_mask(d, h, hd, q.dtype)
        s = jax.lax.dot_general(q, k * m_h, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2
        s = s + bias
        mx = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - mx)
        l = jnp.sum(p, axis=1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref, b * nhead + h, 0, 0, (t, t),
                                 dropout_rate, hw_prng)
            p = p * keep / (1.0 - dropout_rate)
        o = o + jax.lax.dot_general(
            p.astype(v.dtype), v * m_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l
        lse_ref[0, h, :] = jnp.where(valid, mx[:, 0] + jnp.log2(l[:, 0]),
                                     NEG_INF)
    o_ref[0] = jnp.where(valid, o, 0.0)


def _packed_bwd_kernel(seed_ref, lengths_ref, q_ref, k_ref, v_ref, do_ref,
                       lse_ref, delta_ref, dq_ref, dk_ref, dv_ref,
                       *, scale, dropout_rate, t, nhead, hw_prng):
    b = pl.program_id(0)
    length = lengths_ref[b]
    d = q_ref.shape[-1]
    hd = d // nhead
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bias = _col_bias(length, t)
    validf = (length > 0).astype(jnp.float32)
    od = v_ref.dtype
    scale2 = scale * LOG2E
    dq = jnp.zeros(q.shape, jnp.float32)
    dk = jnp.zeros(q.shape, jnp.float32)
    dv = jnp.zeros(q.shape, jnp.float32)
    for h in range(nhead):
        m_h = _head_mask(d, h, hd, q.dtype)
        qh = q * m_h          # needed only to PLACE dk in head h's lanes
        kh = k * m_h
        vh = v * m_h
        doh = (do * m_h.astype(do.dtype)).astype(od)
        lse = lse_ref[0, h, :][:, None]       # base-2 (fwd convention)
        delta = delta_ref[0, h, :][:, None]
        s = jax.lax.dot_general(q, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2
        p = jnp.exp2(s + bias - lse)
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _dropout_keep(seed_ref, b * nhead + h, 0, 0, (t, t),
                                 dropout_rate, hw_prng)
            p_drop = p * keep / (1.0 - dropout_rate)
            dp = dp * keep / (1.0 - dropout_rate)
        else:
            p_drop = p
        ds = (p * (dp - delta)).astype(od)
        dq = dq + jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = dk + jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv = dv + jax.lax.dot_general(
            p_drop.astype(od), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dq_ref[0] = dq * (scale * validf)
    dk_ref[0] = dk * (scale * validf)
    dv_ref[0] = dv * validf


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_mha_packed(q, k, v, lengths, seed=None, dropout_rate=0.0,
                     compute_dtype=None, nhead=1):
    """Packed-heads fused flash attention: q, k, v [B, T, d] with d =
    nhead*hd (the layout straight out of the qkv projection — no head
    transpose anywhere). Dropout masks match flash_mha's (bh = b*nhead+h
    seeding). Fused-VMEM regime only: requires T (padded to 8) <=
    MAX_FUSED_T; callers fall back to flash_mha beyond that.
    """
    o, _ = _packed_fwd(q, k, v, lengths, seed, dropout_rate, compute_dtype,
                       nhead)
    return o


def _packed_fwd(q, k, v, lengths, seed, dropout_rate, compute_dtype, nhead):
    B, T, d = q.shape
    if d % nhead:
        raise ValueError(f"d={d} not divisible by nhead={nhead}")
    t8 = -(-T // 8) * 8
    if t8 > MAX_FUSED_T:
        raise ValueError(
            f"flash_mha_packed is the fused regime (T<= {MAX_FUSED_T}); "
            f"use flash_mha for T={T}")
    od = _operand_dtype(compute_dtype)
    interpret = _use_interpret()
    hd = d // nhead
    scale = 1.0 / math.sqrt(hd)

    def prep(x):
        return _pad_to(x, t8, 1).astype(od)

    qp, kp, vp = prep(q), prep(k), prep(v)
    lens = lengths.astype(jnp.int32)
    full = pl.BlockSpec((1, t8, d), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, nhead, t8), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    o_p, lse = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale,
                          dropout_rate=dropout_rate, t=t8, nhead=nhead,
                          hw_prng=not interpret),
        grid=(B,),
        in_specs=_scalar_specs() + [full, full, full],
        out_specs=[full, lse_spec],
        out_shape=[jax.ShapeDtypeStruct((B, t8, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, nhead, t8), jnp.float32)],
        interpret=interpret,
    )(_seed_arr(seed), lens, qp, kp, vp)
    o = o_p[:, :T]
    return o, (qp, kp, vp, lens, _seed_arr(seed), o_p, lse, (B, T, d))


def _packed_bwd(dropout_rate, compute_dtype, nhead, res, g):
    qp, kp, vp, lens, seed_arr, o_p, lse, (B, T, d) = res
    t8 = qp.shape[1]
    od = qp.dtype
    hd = d // nhead
    scale = 1.0 / math.sqrt(hd)
    interpret = _use_interpret()
    do = _pad_to(g, t8, 1).astype(od)
    # per-head delta: sum over each head's channel range of do * o
    delta = jnp.sum(
        (do.astype(jnp.float32) * o_p).reshape(B, t8, nhead, hd), axis=-1
    ).transpose(0, 2, 1)                                   # [B, nhead, t8]
    full = pl.BlockSpec((1, t8, d), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, nhead, t8), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale,
                          dropout_rate=dropout_rate, t=t8, nhead=nhead,
                          hw_prng=not interpret),
        grid=(B,),
        in_specs=_scalar_specs() + [full, full, full, full,
                                    lse_spec, lse_spec],
        out_specs=[full, full, full],
        out_shape=[jax.ShapeDtypeStruct((B, t8, d), jnp.float32)] * 3,
        interpret=interpret,
    )(seed_arr, lens, qp, kp, vp, do, lse, delta)
    return (dq[:, :T], dk[:, :T], dv[:, :T], None, None)


flash_mha_packed.defvjp(_packed_fwd, _packed_bwd)


def attention_reference(q, k, v, lengths, dropout_rate=0.0, rng=None):
    """Dense XLA oracle with identical masking semantics (no dropout parity —
    dropout masks differ between implementations by construction)."""
    B, H, T, D = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(D)
    col = jnp.arange(T)[None, None, None, :]
    s = jnp.where(col < lengths[:, None, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, p.shape)
        p = p * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
