"""Fully-fused transformer encoder layer — one Pallas program per sample.

Round-5 xplane profile of the PAM train step (B=128, T=600, d=84, H=2):
the packed attention kernels cost 2.98 ms but the XLA pipeline AROUND
them — qkv projection, out-projection, residual dropouts, two LayerNorms,
the FFN — costs another ~1.5 ms, most of it HBM round-trips of
[128, 600, 84] intermediates and {0,2,1}<->{2,1,0} layout copies between
ops that disagree with the kernel's row-major layout. This kernel fuses
the ENTIRE post-LN encoder layer (torch TransformerEncoderLayer
semantics, reference code/models_rd.py:232-237):

    attn = MHA(x)                       (packed heads, base-2 softmax)
    x1   = LN1(x + dropout(attn W_o))
    out  = LN2(x1 + dropout(W_2 dropout(relu(W_1 x1))))

per sample entirely in VMEM: x is read from HBM once, `out` written
once; q/k/v/attn/FFN intermediates never exist in HBM at all.

Backward is a second single-program kernel: recomputes the forward from
x + the saved attention output/log-sum-exp (flash-style), regenerates all
four dropout masks from the hardware PRNG (site-keyed, identical to the
forward by construction), and ACCUMULATES weight gradients across the
sequential batch grid into shared output blocks (@pl.when(b == 0)
initialization — TPU grids execute programs in order on one core).

Selected by nn/transformer.py's measured auto ladder at T >= 384 on TPU
(the attention-only packed flash kernel wins 128 <= T < 384, dense below;
`backend='fused_layer'` forces it at any fused-VMEM T); parity vs the
unfused layer is asserted in tests/test_fused_encoder.py (values and
gradients).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raindrop_tpu.ops.flash_attention import (
    LOG2E, NEG_INF, MAX_FUSED_T, _col_bias, _dropout_keep, _head_mask,
    _operand_dtype, _use_interpret, _seed_arr)

# site keys for the three residual/FFN dropout masks (attention-prob
# dropout keeps the packed kernel's (b*nhead+h, 0, 0) keying); these live
# in the iq slot, far from any block coordinate the attention masks use
_SITE_ATTN_OUT = 101
_SITE_FFN_MID = 102
_SITE_FFN_OUT = 103

_EPS = 1e-5


def _ln_fwd(h, scale, bias):
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (h - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(g, xhat, rstd, scale):
    """dL/dh for y = xhat*scale + bias; returns (dh, dscale [1, d],
    dbias [1, d])."""
    dxhat = g * scale
    dh = (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
          - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)) * rstd
    return (dh, jnp.sum(g * xhat, axis=0, keepdims=True),
            jnp.sum(g, axis=0, keepdims=True))


def _site_keep(seed_ref, b, site, shape, rate, hw_prng):
    return _dropout_keep(seed_ref, b, site, 0, shape, rate, hw_prng)


def _attn_keeps(seed_ref, b, nhead, t, rate, hw_prng):
    """Per-head [t, t] attention-prob keep masks. On hardware one PRNG
    draw serves TWO heads (low/high u16 halves of each word, 1/65536
    threshold resolution — rate error < 2e-5): the [t, t] bit generation
    is the dominant dropout cost in the fused kernel (measured ~0.35 ms
    of the PAM step), and this halves it. Deterministic in (seed, b, h) so
    forward and backward regenerate identical masks."""
    if not hw_prng:  # interpret mode: counter-hash, one mask per head
        return [_dropout_keep(seed_ref, b * nhead + h, 0, 0, (t, t), rate,
                              hw_prng) for h in range(nhead)]
    thr16 = jnp.uint32(int(rate * float(2 ** 16)))
    keeps = []
    for pair in range((nhead + 1) // 2):
        pltpu.prng_seed(seed_ref[0] + b * jnp.int32(-2048144789),
                        jnp.int32(pair) * jnp.int32(-1640531527))
        bits = pltpu.bitcast(pltpu.prng_random_bits((t, t)), jnp.uint32)
        keeps.append(((bits & jnp.uint32(0xFFFF)) >= thr16)
                     .astype(jnp.float32))
        if 2 * pair + 1 < nhead:
            keeps.append(((bits >> 16) >= thr16).astype(jnp.float32))
    return keeps


def _attention(q, k, v, bias, length, seed_ref, b, *, scale2, nhead, t, d,
               rate, hw_prng, od):
    """Packed-heads attention in base-2; returns (attn [t, d], lses [t]
    per head, base-2 units — consumed by _bwd_kernel's recompute)."""
    hd = d // nhead
    valid = length > 0
    attn = jnp.zeros((t, d), jnp.float32)
    lses = []
    keeps = (_attn_keeps(seed_ref, b, nhead, t, rate, hw_prng)
             if rate > 0.0 else None)
    for h in range(nhead):
        m_h = _head_mask(d, h, hd, q.dtype)
        s = jax.lax.dot_general(q, k * m_h, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2
        s = s + bias
        mx = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - mx)
        l = jnp.sum(p, axis=1, keepdims=True)
        lses.append(jnp.where(valid, mx[:, 0] + jnp.log2(l[:, 0]), NEG_INF))
        if rate > 0.0:
            p = p * keeps[h] / (1.0 - rate)
        pv = jax.lax.dot_general(
            p.astype(od), v * m_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # normalize the [t, d] PV OUTPUT, not the [t, t] probability grid
        attn = attn + pv / l
    return jnp.where(valid, attn, 0.0), lses


def _fwd_kernel(seed_ref, lengths_ref, x_ref,
                wq_ref, wk_ref, wv_ref, bqkv_ref,
                wo_ref, bo_ref, g1_ref, be1_ref,
                w1_ref, bf1_ref, w2_ref, bf2_ref, g2_ref, be2_ref,
                out_ref, attn_ref, lse_ref,
                *, scale, rate, nhead, t, d, hw_prng):
    b = pl.program_id(0)
    length = lengths_ref[b]
    od = wq_ref.dtype
    x = x_ref[0]
    xo = x.astype(od)
    # qkv projection: weights arrive pre-transposed [d_in, d_out]
    q = (jax.lax.dot_general(xo, wq_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + bqkv_ref[0]).astype(od)
    k = (jax.lax.dot_general(xo, wk_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + bqkv_ref[1]).astype(od)
    v = (jax.lax.dot_general(xo, wv_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + bqkv_ref[2]).astype(od)
    bias = _col_bias(length, t)
    attn, lses = _attention(q, k, v, bias, length, seed_ref, b,
                            scale2=scale * LOG2E, nhead=nhead, t=t, d=d,
                            rate=rate, hw_prng=hw_prng, od=od)
    attn_ref[0] = attn
    for h in range(nhead):
        lse_ref[0, h, :] = lses[h]
    ao = jax.lax.dot_general(attn.astype(od), wo_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + bo_ref[...]
    if rate > 0.0:
        ao = ao * _site_keep(seed_ref, b, _SITE_ATTN_OUT, (t, d), rate,
                             hw_prng) / (1.0 - rate)
    x1, _, _ = _ln_fwd(x + ao, g1_ref[...], be1_ref[...])
    f = jax.lax.dot_general(x1.astype(od), w1_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + bf1_ref[...]
    f = jax.nn.relu(f)
    if rate > 0.0:
        f = f * _site_keep(seed_ref, b, _SITE_FFN_MID, f.shape, rate,
                           hw_prng) / (1.0 - rate)
    f2 = jax.lax.dot_general(f.astype(od), w2_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + bf2_ref[...]
    if rate > 0.0:
        f2 = f2 * _site_keep(seed_ref, b, _SITE_FFN_OUT, (t, d), rate,
                             hw_prng) / (1.0 - rate)
    out, _, _ = _ln_fwd(x1 + f2, g2_ref[...], be2_ref[...])
    out_ref[0] = out


def _bwd_kernel(seed_ref, lengths_ref, x_ref,
                wq_ref, wk_ref, wv_ref, bqkv_ref,
                wo_ref, bo_ref, g1_ref, be1_ref,
                w1_ref, bf1_ref, w2_ref, bf2_ref, g2_ref, be2_ref,
                attn_ref, lse_ref, g_ref,
                dx_ref, dwq_ref, dwk_ref, dwv_ref, dbqkv_ref,
                dwo_ref, dbo_ref, dg1_ref, dbe1_ref,
                dw1_ref, dbf1_ref, dw2_ref, dbf2_ref, dg2_ref, dbe2_ref,
                *, scale, rate, nhead, t, d, hw_prng):
    b = pl.program_id(0)
    length = lengths_ref[b]
    od = wq_ref.dtype
    hd = d // nhead
    scale2 = scale * LOG2E
    x = x_ref[0]
    xo = x.astype(od)
    attn = attn_ref[0]
    g = g_ref[0]

    # ---- recompute the forward (dropout masks regenerate identically) --
    q = (jax.lax.dot_general(xo, wq_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + bqkv_ref[0]).astype(od)
    k = (jax.lax.dot_general(xo, wk_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + bqkv_ref[1]).astype(od)
    v = (jax.lax.dot_general(xo, wv_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + bqkv_ref[2]).astype(od)
    ao = jax.lax.dot_general(attn.astype(od), wo_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + bo_ref[...]
    if rate > 0.0:
        keep2 = _site_keep(seed_ref, b, _SITE_ATTN_OUT, (t, d), rate,
                           hw_prng) / (1.0 - rate)
        ao = ao * keep2
    x1, xhat1, rstd1 = _ln_fwd(x + ao, g1_ref[...], be1_ref[...])
    f_pre = jax.lax.dot_general(x1.astype(od), w1_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) \
        + bf1_ref[...]
    f = jax.nn.relu(f_pre)
    if rate > 0.0:
        keep3 = _site_keep(seed_ref, b, _SITE_FFN_MID, f.shape, rate,
                           hw_prng) / (1.0 - rate)
        f = f * keep3
    f2 = jax.lax.dot_general(f.astype(od), w2_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + bf2_ref[...]
    if rate > 0.0:
        keep4 = _site_keep(seed_ref, b, _SITE_FFN_OUT, (t, d), rate,
                           hw_prng) / (1.0 - rate)
        f2 = f2 * keep4
    h2 = x1 + f2
    mu2 = jnp.mean(h2, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(h2 - mu2), axis=-1, keepdims=True)
    rstd2 = jax.lax.rsqrt(var2 + _EPS)
    xhat2 = (h2 - mu2) * rstd2

    # ---- backward ------------------------------------------------------
    dh2, dg2, dbe2 = _ln_bwd(g, xhat2, rstd2, g2_ref[...])
    df2 = dh2 * keep4 if rate > 0.0 else dh2
    df2o = df2.astype(od)
    dw2 = jax.lax.dot_general(f.astype(od), df2o, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbf2 = jnp.sum(df2, axis=0, keepdims=True)
    df = jax.lax.dot_general(df2o, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        df = df * keep3
    dfpre = df * (f_pre > 0)
    dfpreo = dfpre.astype(od)
    dw1 = jax.lax.dot_general(x1.astype(od), dfpreo,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbf1 = jnp.sum(dfpre, axis=0, keepdims=True)
    dx1 = dh2 + jax.lax.dot_general(dfpreo, w1_ref[...],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    dh1, dg1, dbe1 = _ln_bwd(dx1, xhat1, rstd1, g1_ref[...])
    dao = dh1 * keep2 if rate > 0.0 else dh1
    daoo = dao.astype(od)
    dwo = jax.lax.dot_general(attn.astype(od), daoo,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbo = jnp.sum(dao, axis=0, keepdims=True)
    d_attn = jax.lax.dot_general(daoo, wo_ref[...], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    # attention backward (packed heads, saved base-2 lse)
    bias = _col_bias(length, t)
    validf = (length > 0).astype(jnp.float32)
    dq = jnp.zeros((t, d), jnp.float32)
    dk = jnp.zeros((t, d), jnp.float32)
    dv = jnp.zeros((t, d), jnp.float32)
    keeps = (_attn_keeps(seed_ref, b, nhead, t, rate, hw_prng)
             if rate > 0.0 else None)
    for h in range(nhead):
        m_h = _head_mask(d, h, hd, q.dtype)
        qh = q * m_h
        kh = k * m_h
        vh = v * m_h
        doh = (d_attn * m_h.astype(jnp.float32)).astype(od)
        lse = lse_ref[0, h, :][:, None]
        delta = jnp.sum(d_attn * m_h.astype(jnp.float32) * attn, axis=1,
                        keepdims=True)
        s = jax.lax.dot_general(q, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2
        p = jnp.exp2(s + bias - lse)
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = keeps[h] / (1.0 - rate)
            p_drop = p * keep
            dp = dp * keep
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
    dq = dq * (scale * validf)
    dk = dk * (scale * validf)
    dv = dv * validf

    dqo, dko, dvo = dq.astype(od), dk.astype(od), dv.astype(od)
    dwq = jax.lax.dot_general(xo, dqo, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwk = jax.lax.dot_general(xo, dko, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwv = jax.lax.dot_general(xo, dvo, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx = (dh1
          + jax.lax.dot_general(dqo, wq_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
          + jax.lax.dot_general(dko, wk_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
          + jax.lax.dot_general(dvo, wv_ref[...], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32))
    dx_ref[0] = dx

    # ---- weight-grad accumulation across the sequential batch grid ----
    @pl.when(b == 0)
    def _init():
        for ref in (dwq_ref, dwk_ref, dwv_ref, dbqkv_ref, dwo_ref,
                    dbo_ref, dg1_ref, dbe1_ref, dw1_ref, dbf1_ref,
                    dw2_ref, dbf2_ref, dg2_ref, dbe2_ref):
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

    dwq_ref[...] += dwq
    dwk_ref[...] += dwk
    dwv_ref[...] += dwv
    dbqkv_ref[0] += jnp.sum(dq, axis=0)
    dbqkv_ref[1] += jnp.sum(dk, axis=0)
    dbqkv_ref[2] += jnp.sum(dv, axis=0)
    dwo_ref[...] += dwo
    dbo_ref[...] += dbo
    dg1_ref[...] += dg1
    dbe1_ref[...] += dbe1
    dw1_ref[...] += dw1
    dbf1_ref[...] += dbf1
    dw2_ref[...] += dw2
    dbf2_ref[...] += dbf2
    dg2_ref[...] += dg2
    dbe2_ref[...] += dbe2


def _pad_t(x, t8):
    pad = t8 - x.shape[1]
    if pad <= 0:
        return x
    return jnp.pad(x, [(0, 0), (0, pad), (0, 0)])


def _weights(p, od):
    """Layer pytree -> kernel operand tuple (weights PRE-TRANSPOSED to
    [d_in, d_out] so kernels run plain row-major dots)."""
    w = p["in_proj_w"]                                    # [3d, d]
    d = w.shape[1]
    wq, wk, wv = w[:d].T, w[d:2 * d].T, w[2 * d:].T
    bqkv = p["in_proj_b"].reshape(3, d)
    def row(a):      # 1-D params ride as [1, n] (TPU tiles are 2-D)
        return a.reshape(1, -1).astype(jnp.float32)

    return (wq.astype(od), wk.astype(od), wv.astype(od),
            bqkv.astype(jnp.float32),
            p["out_proj"]["w"].T.astype(od), row(p["out_proj"]["b"]),
            row(p["ln1"]["scale"]), row(p["ln1"]["bias"]),
            p["lin1"]["w"].T.astype(od), row(p["lin1"]["b"]),
            p["lin2"]["w"].T.astype(od), row(p["lin2"]["b"]),
            row(p["ln2"]["scale"]), row(p["ln2"]["bias"]))


def _full(shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _per_b(shape):
    return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_encoder_layer(p, x, lengths, seed, dropout_rate=0.0,
                        compute_dtype=None, nhead=1):
    """One fused post-LN encoder layer. x [B, T, d]; lengths [B];
    seed: int32 [1] or None (dropout mask stream); p: the
    nn/transformer._layer_init pytree. Matches
    transformer_encoder_layer_apply (dense/flash) to fp tolerance at
    dropout 0; under dropout it is its own (hardware-PRNG) stream."""
    out, _ = _fused_fwd(p, x, lengths, seed, dropout_rate, compute_dtype,
                        nhead)
    return out


def _fused_fwd(p, x, lengths, seed, dropout_rate, compute_dtype, nhead):
    B, T, d = x.shape
    ffn = p["lin1"]["w"].shape[0]
    t8 = -(-T // 8) * 8
    if t8 > MAX_FUSED_T:
        raise ValueError(f"fused encoder layer requires T <= {MAX_FUSED_T}")
    od = _operand_dtype(compute_dtype)
    interpret = _use_interpret()
    scale = 1.0 / math.sqrt(d // nhead)
    xp = _pad_t(x.astype(jnp.float32), t8)
    ws = _weights(p, od)
    lens = lengths.astype(jnp.int32)
    sd = _seed_arr(seed)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, rate=dropout_rate, nhead=nhead, t=t8,
        d=d, hw_prng=not interpret)
    w_specs = [_full(w.shape) for w in ws]
    out, attn, lse = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  _per_b((t8, d))] + w_specs,
        out_specs=[_per_b((t8, d)), _per_b((t8, d)),
                   pl.BlockSpec((1, nhead, t8), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, t8, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, t8, d), jnp.float32),
                   jax.ShapeDtypeStruct((B, nhead, t8), jnp.float32)],
        interpret=interpret,
    )(sd, lens, xp, *ws)
    # a zero-size array carries the caller's dtype through the residuals
    # (custom_vjp residues must be JAX types, not raw dtypes)
    dtype_token = jnp.zeros((0,), x.dtype)
    res = (p, xp, lens, sd, attn, lse, dtype_token, (B, T, d, ffn))
    return out[:, :T].astype(x.dtype), res


def _fused_bwd(dropout_rate, compute_dtype, nhead, res, g):
    p, xp, lens, sd, attn, lse, dtype_token, (B, T, d, ffn) = res
    t8 = xp.shape[1]
    od = _operand_dtype(compute_dtype)
    interpret = _use_interpret()
    scale = 1.0 / math.sqrt(d // nhead)
    ws = _weights(p, od)
    gp = _pad_t(g.astype(jnp.float32), t8)
    kernel = functools.partial(
        _bwd_kernel, scale=scale, rate=dropout_rate, nhead=nhead, t=t8,
        d=d, hw_prng=not interpret)
    w_specs = [_full(w.shape) for w in ws]
    grad_shapes = [(d, d), (d, d), (d, d), (3, d), (d, d), (1, d),
                   (1, d), (1, d), (d, ffn), (1, ffn), (ffn, d), (1, d),
                   (1, d), (1, d)]
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  _per_b((t8, d))] + w_specs
        + [_per_b((t8, d)),
           pl.BlockSpec((1, nhead, t8), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM),
           _per_b((t8, d))],
        out_specs=[_per_b((t8, d))] + [_full(s) for s in grad_shapes],
        out_shape=[jax.ShapeDtypeStruct((B, t8, d), jnp.float32)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
        interpret=interpret,
    )(sd, lens, xp, *ws, attn, lse, gp)
    (dx, dwq, dwk, dwv, dbqkv, dwo, dbo, dg1, dbe1,
     dw1, dbf1, dw2, dbf2, dg2, dbe2) = outs
    dp = {
        # kernel weight grads are [d_in, d_out]; params store torch
        # [out, in] — transpose back
        "in_proj_w": jnp.concatenate([dwq.T, dwk.T, dwv.T], axis=0),
        "in_proj_b": dbqkv.reshape(-1),
        "out_proj": {"w": dwo.T, "b": dbo.reshape(-1)},
        "ln1": {"scale": dg1.reshape(-1), "bias": dbe1.reshape(-1)},
        "lin1": {"w": dw1.T, "b": dbf1.reshape(-1)},
        "lin2": {"w": dw2.T, "b": dbf2.reshape(-1)},
        "ln2": {"scale": dg2.reshape(-1), "bias": dbe2.reshape(-1)},
    }
    dp = jax.tree.map(lambda a, b_: a.astype(b_.dtype), dp, dict(p))
    return dp, dx[:, :T].astype(dtype_token.dtype), None, None


fused_encoder_layer.defvjp(_fused_fwd, _fused_bwd)
