"""Temporal transformer encoder with torch.nn.TransformerEncoder parity.

Re-implements the reference's temporal aggregator
(nn.TransformerEncoder(TransformerEncoderLayer(d, nhead, nhid, dropout)),
reference code/models_rd.py:232-237, applied at :358) as pure-jnp batched
attention over the MXU:

  * post-LN ("norm_first=False") layer: attn -> add -> LN -> FFN(relu) -> add -> LN
  * combined qkv in_proj ([3d, d]) with xavier-uniform init, zero in_proj bias,
    zero out_proj bias — the torch MultiheadAttention defaults, so parity tests
    can port state_dicts 1:1.
  * key_padding_mask semantics: True marks a padded timestep; padded keys get
    -inf logits before softmax.

Internal layout is [B, T, d] (batch-major, TPU-friendly); the model transposes
once at the boundary from the reference's time-major [T, B, d].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from raindrop_tpu.nn.init import torch_linear_params, xavier_uniform
from raindrop_tpu.nn.linear import linear_apply
from raindrop_tpu.utils.dropout import dropout as _dropout


def _layer_init(key, d_model: int, ffn_dim: int, dtype=jnp.float32):
    k = jax.random.split(key, 5)
    out_proj = torch_linear_params(k[1], d_model, d_model, dtype)
    out_proj["b"] = jnp.zeros((d_model,), dtype)  # MHA._reset_parameters zeroes it
    return {
        "in_proj_w": xavier_uniform(k[0], (3 * d_model, d_model), dtype),
        "in_proj_b": jnp.zeros((3 * d_model,), dtype),
        "out_proj": out_proj,
        "lin1": torch_linear_params(k[2], d_model, ffn_dim, dtype),
        "lin2": torch_linear_params(k[3], ffn_dim, d_model, dtype),
        "ln1": {"scale": jnp.ones((d_model,), dtype), "bias": jnp.zeros((d_model,), dtype)},
        "ln2": {"scale": jnp.ones((d_model,), dtype), "bias": jnp.zeros((d_model,), dtype)},
    }


def transformer_encoder_init(key, d_model: int, nhead: int, ffn_dim: int,
                             num_layers: int, dtype=jnp.float32):
    if d_model % nhead:
        raise ValueError(f"d_model={d_model} not divisible by nhead={nhead}")
    keys = jax.random.split(key, num_layers)
    return {f"layer{i}": _layer_init(k, d_model, ffn_dim, dtype)
            for i, k in enumerate(keys)}


def _layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def multihead_self_attention(
    p,
    x: jnp.ndarray,                 # [B, T, d]
    key_padding_mask: Optional[jnp.ndarray],  # [B, T] True = padded
    nhead: int,
    dropout_rate: float = 0.0,
    rng=None,
    train: bool = False,
    backend: str = "auto",          # 'auto' | 'dense' | 'flash' | 'sp' | 'ring'
    score_dtype: Optional[str] = "bfloat16",  # flash kernel operand dtype
    mesh=None,                      # for the distributed backends
) -> jnp.ndarray:
    B, T, d = x.shape
    hd = d // nhead
    qkv = x @ p["in_proj_w"].T + p["in_proj_b"]          # [B, T, 3d]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # [B, T, d] -> [B, nhead, T, hd]
        return t.reshape(B, T, nhead, hd).transpose(0, 2, 1, 3)

    if backend in ("sp", "ring"):
        # Context-parallel product route (parallel/sequence.py): the T
        # axis shards over the mesh 'model' axis — 'sp' all-gathers K/V
        # (Ulysses-style), 'ring' rotates K/V blocks via ppermute with the
        # online-softmax fold. Attention-prob dropout uses the sharding-
        # invariant coordinate hash (its own stream — dropout masks differ
        # between attention backends by construction, like flash vs dense).
        from raindrop_tpu.parallel.sequence import (
            ring_attention, sequence_parallel_attention)

        if mesh is None:
            raise ValueError(f"backend {backend!r} needs a mesh")
        lengths = (jnp.full((B,), T, jnp.int32) if key_padding_mask is None
                   else jnp.sum(~key_padding_mask, axis=1).astype(jnp.int32))
        rate = dropout_rate if (train and rng is not None) else 0.0
        seed = (jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
                if rate > 0.0 else None)
        fn = (sequence_parallel_attention if backend == "sp"
              else ring_attention)
        out = fn(mesh, heads(q), heads(k), heads(v), lengths,
                 dropout_rate=rate, seed=seed)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, d)
        return linear_apply(p["out_proj"], out)

    if backend == "auto":
        # The packed-heads Pallas kernel wins once the T x T score matrix
        # dominates; below that XLA's fusion of these small shapes is
        # faster. Crossover measured on v5e with the packed fused kernel:
        # flash wins at T=128 (1.12x), 215 (1.07x) and 600 (see
        # docs/PERFORMANCE.md), dense wins at T=60.
        backend = ("flash" if T >= 128 and jax.default_backend() == "tpu"
                   else "dense")
    if backend == "flash":
        from raindrop_tpu.ops.flash_attention import (
            MAX_FUSED_T, flash_mha, flash_mha_packed)

        # key_padding_mask marks t >= length (contiguous suffix padding,
        # nn/aggregate.padding_mask); flash takes the prefix lengths.
        lengths = (jnp.full((B,), T, jnp.int32) if key_padding_mask is None
                   else jnp.sum(~key_padding_mask, axis=1).astype(jnp.int32))
        rate = dropout_rate if (train and rng is not None) else 0.0
        seed = (jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
                if rate > 0.0 else None)
        cd = (None if score_dtype in (None, "float32")
              else str(score_dtype))
        if -(-T // 8) * 8 <= MAX_FUSED_T:
            # packed-heads fused kernel: q/k/v in natural [B, T, d] layout,
            # zero head transposes on either side of the kernel
            out = flash_mha_packed(q, k, v, lengths, seed, rate, cd, nhead)
        else:
            out = flash_mha(heads(q), heads(k), heads(v), lengths, seed,
                            rate, cd)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, d)
        return linear_apply(p["out_proj"], out)

    q, k, v = heads(q) * (hd ** -0.5), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    if key_padding_mask is not None:
        # A fully-padded sample (lengths==0) softmaxes over all -inf -> NaN in
        # torch; emit zeros instead so one degenerate sample cannot poison the
        # whole batch's gradients. Identical to torch for lengths >= 1.
        all_pad = jnp.all(key_padding_mask, axis=-1)[:, None, None, None]
        attn = jnp.where(all_pad, 0.0, attn)
    if train and dropout_rate > 0.0:
        attn = _dropout(rng, attn, dropout_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, d)
    return linear_apply(p["out_proj"], out)


def transformer_encoder_layer_apply(
    p,
    x: jnp.ndarray,                # [B, T, d]
    key_padding_mask: Optional[jnp.ndarray],  # [B, T] True = padded
    nhead: int,
    dropout_rate: float = 0.0,
    rngs=None,                     # 4 keys (attn, post-attn, ffn, post-ffn)
    train: bool = False,
    backend: str = "auto",
    score_dtype: Optional[str] = "bfloat16",
    mesh=None,
) -> jnp.ndarray:
    """One post-LN encoder layer (torch TransformerEncoderLayer semantics).

    Factored out of the encoder loop so pipeline parallelism
    (parallel/pipeline.py) can run each layer as a pipeline stage.

    backend 'fused_layer' (and 'auto' on TPU at T >= 384, within the
    fused-VMEM regime) runs the ENTIRE layer as one Pallas program
    per sample (ops/fused_encoder.py) — qkv projection, attention,
    out-proj, residual dropouts, both LayerNorms and the FFN never leave
    VMEM. Same math as this function's unfused path (tested); dropout
    uses the hardware-PRNG stream like the flash kernels.
    """
    r = rngs if rngs is not None else [None] * 4
    B, T, d = x.shape
    from raindrop_tpu.ops.flash_attention import MAX_FUSED_T
    # auto ladder, measured on v5e (round 5) from all three sides:
    # dense wins T=60 (150.0k vs the fused layer's 90.7k — at tiny T the
    # per-sample grid's fixed costs dwarf the compute); the packed flash
    # attention kernel wins 128 <= T < 384 (P12 T=215: 40.7k vs the
    # fused layer's 39.4k samples/s); the fully-fused layer wins at long T
    # (PAM T=600: 20.4k vs 17.2k) where the per-op XLA pipeline's HBM
    # round-trips dominate. 'fused_layer' forces the fused kernel at any
    # supported T.
    use_fused = d % nhead == 0 and (
        backend == "fused_layer"
        or (backend == "auto" and jax.default_backend() == "tpu"
            and T >= 384 and -(-T // 8) * 8 <= MAX_FUSED_T))
    if use_fused:
        from raindrop_tpu.ops.fused_encoder import fused_encoder_layer

        lengths = (jnp.full((B,), T, jnp.int32) if key_padding_mask is None
                   else jnp.sum(~key_padding_mask, axis=1).astype(jnp.int32))
        rate = dropout_rate if (train and r[0] is not None) else 0.0
        seed = (jax.random.randint(r[0], (1,), 0, 2 ** 31 - 1, jnp.int32)
                if rate > 0.0 else None)
        cd = (None if score_dtype in (None, "float32")
              else str(score_dtype))
        return fused_encoder_layer(p, x, lengths, seed, rate, cd, nhead)
    attn = multihead_self_attention(
        p, x, key_padding_mask, nhead, dropout_rate, r[0], train, backend,
        score_dtype, mesh)
    x = _layer_norm(p["ln1"], x + _dropout(r[1], attn, dropout_rate, train))
    h = jax.nn.relu(linear_apply(p["lin1"], x))
    h = _dropout(r[2], h, dropout_rate, train)
    h = linear_apply(p["lin2"], h)
    return _layer_norm(p["ln2"], x + _dropout(r[3], h, dropout_rate, train))


def transformer_encoder_apply(
    params,
    x: jnp.ndarray,                # [B, T, d]
    key_padding_mask: Optional[jnp.ndarray],  # [B, T] True = padded
    nhead: int,
    dropout_rate: float = 0.0,
    rng=None,
    train: bool = False,
    backend: str = "auto",
    score_dtype: Optional[str] = "bfloat16",
    mesh=None,
) -> jnp.ndarray:
    num_layers = len(params)
    rngs = (jax.random.split(rng, 4 * num_layers)
            if (train and rng is not None) else [None] * (4 * num_layers))
    for i in range(num_layers):
        x = transformer_encoder_layer_apply(
            params[f"layer{i}"], x, key_padding_mask, nhead, dropout_rate,
            rngs[4 * i: 4 * i + 4], train, backend, score_dtype, mesh)
    return x
