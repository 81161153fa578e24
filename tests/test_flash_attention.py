"""Pallas flash attention vs dense oracle (interpret mode on CPU), plus the
transformer backend integration."""

import numpy as np
import jax
import jax.numpy as jnp

from raindrop_tpu.ops.flash_attention import (
    MAX_FUSED_T,
    flash_mha,
    attention_reference,
)


def _rand_qkv(rng, B, H, T, D):
    return tuple(jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
                 for _ in range(3))


def test_fused_path_matches_dense(rng_np):
    q, k, v = _rand_qkv(rng_np, 2, 2, 70, 20)       # T < MAX_FUSED_T
    lengths = jnp.asarray([70, 33], jnp.int32)
    o = flash_mha(q, k, v, lengths)
    o_ref = attention_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_grads_match_dense(rng_np):
    q, k, v = _rand_qkv(rng_np, 2, 1, 40, 12)
    lengths = jnp.asarray([40, 17], jnp.int32)
    g1 = jax.grad(lambda *a: jnp.sum(flash_mha(*a, lengths) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(attention_reference(*a, lengths) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_streaming_path_matches_dense(rng_np):
    T = MAX_FUSED_T + 128                            # force streaming kernels
    q, k, v = _rand_qkv(rng_np, 1, 1, T, 16)
    lengths = jnp.asarray([T - 200], jnp.int32)
    o = flash_mha(q, k, v, lengths)
    o_ref = attention_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-4)
    g1 = jax.grad(lambda a: jnp.sum(flash_mha(a, k, v, lengths) ** 2))(q)
    g2 = jax.grad(lambda a: jnp.sum(attention_reference(a, k, v, lengths) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_fully_padded_rows_zero(rng_np):
    q, k, v = _rand_qkv(rng_np, 2, 2, 35, 8)
    lengths = jnp.asarray([35, 0], jnp.int32)
    o = flash_mha(q, k, v, lengths)
    assert bool(jnp.all(o[1] == 0.0))
    assert bool(jnp.all(jnp.isfinite(o)))


def test_dropout_deterministic_and_unbiased(rng_np):
    q, k, v = _rand_qkv(rng_np, 2, 2, 64, 16)
    lengths = jnp.asarray([64, 40], jnp.int32)
    seed = jnp.asarray([123], jnp.int32)
    o1 = flash_mha(q, k, v, lengths, seed, 0.3)
    o2 = flash_mha(q, k, v, lengths, seed, 0.3)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = flash_mha(q, k, v, lengths, jnp.asarray([7], jnp.int32), 0.3)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # gradient flows through the dropout path
    g = jax.grad(lambda a: jnp.sum(flash_mha(a, k, v, lengths, seed, 0.3) ** 2))(q)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_transformer_flash_backend_equals_dense(rng_np):
    from raindrop_tpu.nn.transformer import (
        transformer_encoder_init, transformer_encoder_apply)
    d, nhead, T, B = 32, 2, 48, 3
    params = transformer_encoder_init(jax.random.PRNGKey(0), d, nhead, 64, 2)
    x = jnp.asarray(rng_np.normal(size=(B, T, d)).astype(np.float32))
    lengths = np.array([48, 20, 5])
    mask = jnp.asarray(np.arange(T)[None] >= lengths[:, None])
    out_d = transformer_encoder_apply(params, x, mask, nhead, backend="dense")
    # exact f32 kernel operands
    out_f = transformer_encoder_apply(params, x, mask, nhead, backend="flash",
                                      score_dtype="float32")
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_f),
                               rtol=1e-4, atol=1e-5)
    # default bf16 kernel operands (the TPU-native score dtype): close at
    # bf16 tolerance, not bitwise
    out_b = transformer_encoder_apply(params, x, mask, nhead, backend="flash")
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_b),
                               rtol=3e-2, atol=3e-2)


def test_bf16_compute_dtype_close_to_f32(rng_np):
    q, k, v = _rand_qkv(rng_np, 2, 2, 70, 20)
    lengths = jnp.asarray([70, 33], jnp.int32)
    o_ref = attention_reference(q, k, v, lengths)
    o16 = flash_mha(q, k, v, lengths, None, 0.0, "bfloat16")
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o_ref),
                               rtol=3e-2, atol=3e-2)
    # grads flow and stay close under bf16 operands
    g1 = jax.grad(lambda *a: jnp.sum(
        flash_mha(*a, lengths, None, 0.0, "bfloat16") ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(attention_reference(*a, lengths) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)
    # length-0 sample: zero output, zero grads, all finite
    lengths0 = jnp.asarray([70, 0], jnp.int32)
    o0 = flash_mha(q, k, v, lengths0, None, 0.0, "bfloat16")
    assert bool(jnp.all(o0[1] == 0.0)) and bool(jnp.all(jnp.isfinite(o0)))
    gq = jax.grad(lambda a: jnp.sum(
        flash_mha(a, k, v, lengths0, None, 0.0, "bfloat16") ** 2))(q)
    assert bool(jnp.all(gq[1] == 0.0)) and bool(jnp.all(jnp.isfinite(gq)))


# ---- packed-heads fused kernel (natural [B, T, d] layout) -----------------
def _pack(q):  # [B, H, T, hd] -> [B, T, H*hd]
    B, H, T, hd = q.shape
    return jnp.asarray(np.asarray(q).transpose(0, 2, 1, 3).reshape(B, T, H * hd))


def test_packed_matches_dense(rng_np):
    from raindrop_tpu.ops.flash_attention import flash_mha_packed

    for H, hd in ((2, 20), (3, 8), (1, 16)):
        q, k, v = _rand_qkv(rng_np, 2, H, 70, hd)
        lengths = jnp.asarray([70, 33], jnp.int32)
        o_ref = attention_reference(q, k, v, lengths)
        o_p = flash_mha_packed(_pack(q), _pack(k), _pack(v), lengths,
                               None, 0.0, None, H)
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(_pack(o_ref)),
                                   rtol=1e-4, atol=1e-5, err_msg=f"H={H}")


def test_packed_grads_match_dense(rng_np):
    from raindrop_tpu.ops.flash_attention import flash_mha_packed

    H, hd = 2, 12
    q, k, v = _rand_qkv(rng_np, 2, H, 40, hd)
    lengths = jnp.asarray([40, 17], jnp.int32)
    qp, kp, vp = _pack(q), _pack(k), _pack(v)
    g1 = jax.grad(lambda *a: jnp.sum(
        flash_mha_packed(*a, lengths, None, 0.0, None, H) ** 2),
        argnums=(0, 1, 2))(qp, kp, vp)
    g2 = jax.grad(lambda *a: jnp.sum(attention_reference(*a, lengths) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(_pack(b)),
                                   rtol=1e-4, atol=1e-4)


def test_packed_length_zero_and_dropout(rng_np):
    from raindrop_tpu.ops.flash_attention import flash_mha_packed

    H, hd = 2, 8
    q, k, v = _rand_qkv(rng_np, 2, H, 35, hd)
    qp, kp, vp = _pack(q), _pack(k), _pack(v)
    lengths0 = jnp.asarray([35, 0], jnp.int32)
    o0 = flash_mha_packed(qp, kp, vp, lengths0, None, 0.0, None, H)
    assert bool(jnp.all(o0[1] == 0.0)) and bool(jnp.all(jnp.isfinite(o0)))
    gq = jax.grad(lambda a: jnp.sum(
        flash_mha_packed(a, kp, vp, lengths0, None, 0.0, None, H) ** 2))(qp)
    assert bool(jnp.all(gq[1] == 0.0)) and bool(jnp.all(jnp.isfinite(gq)))
    # dropout: deterministic in seed, grads flow
    seed = jnp.asarray([5], jnp.int32)
    lengths = jnp.asarray([35, 20], jnp.int32)
    d1 = flash_mha_packed(qp, kp, vp, lengths, seed, 0.3, None, H)
    d2 = flash_mha_packed(qp, kp, vp, lengths, seed, 0.3, None, H)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    g = jax.grad(lambda a: jnp.sum(
        flash_mha_packed(a, kp, vp, lengths, seed, 0.3, None, H) ** 2))(qp)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_transformer_uses_packed_and_matches_dense(rng_np):
    """The transformer's fused-regime flash path (packed kernel, no head
    transposes) equals the dense backend."""
    from raindrop_tpu.nn.transformer import (
        transformer_encoder_init, transformer_encoder_apply)
    d, nhead, T, B = 24, 3, 40, 3
    params = transformer_encoder_init(jax.random.PRNGKey(1), d, nhead, 48, 2)
    x = jnp.asarray(rng_np.normal(size=(B, T, d)).astype(np.float32))
    lengths = np.array([40, 22, 7])
    mask = jnp.asarray(np.arange(T)[None] >= lengths[:, None])
    out_d = transformer_encoder_apply(params, x, mask, nhead, backend="dense")
    out_f = transformer_encoder_apply(params, x, mask, nhead,
                                      backend="flash", score_dtype="float32")
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_f),
                               rtol=1e-4, atol=1e-5)


def test_packed_equals_split_head_fuzz(rng_np):
    """Property fuzz: across random (B, H, T, hd) shapes and ragged/edge
    lengths the packed-heads kernel must agree with the split-head fused
    kernel (both f32) — they are two layouts of the same math."""
    from raindrop_tpu.ops.flash_attention import flash_mha_packed

    for trial in range(6):
        B = int(rng_np.integers(1, 4))
        H = int(rng_np.integers(1, 4))
        T = int(rng_np.integers(3, 90))
        hd = int(rng_np.integers(2, 24))
        q, k, v = _rand_qkv(rng_np, B, H, T, hd)
        lengths = jnp.asarray(
            rng_np.integers(0, T + 1, size=(B,)).astype(np.int32))
        o_split = flash_mha(q, k, v, lengths)
        o_packed = flash_mha_packed(_pack(q), _pack(k), _pack(v), lengths,
                                    None, 0.0, None, H)
        np.testing.assert_allclose(
            np.asarray(o_packed), np.asarray(_pack(o_split)),
            rtol=1e-4, atol=1e-5,
            err_msg=f"trial {trial}: B={B} H={H} T={T} hd={hd} "
                    f"lengths={np.asarray(lengths)}")
        gp = jax.grad(lambda a: jnp.sum(flash_mha_packed(
            a, _pack(k), _pack(v), lengths, None, 0.0, None, H) ** 2))(
            _pack(q))
        gs = jax.grad(lambda a: jnp.sum(flash_mha(
            a, k, v, lengths) ** 2))(q)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(_pack(gs)),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad trial {trial}")
