"""Exact parity of the temporal transformer vs torch.nn.TransformerEncoder.

The reference wraps torch's encoder directly (code/models_rd.py:232-237, 358);
torch-cpu is available here, so we port weights and compare eval-mode outputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from raindrop_tpu.nn.transformer import (
    transformer_encoder_init,
    transformer_encoder_apply,
)


def port_layer_to_torch(p, layer):
    with torch.no_grad():
        layer.self_attn.in_proj_weight.copy_(torch.tensor(np.asarray(p["in_proj_w"])))
        layer.self_attn.in_proj_bias.copy_(torch.tensor(np.asarray(p["in_proj_b"])))
        layer.self_attn.out_proj.weight.copy_(torch.tensor(np.asarray(p["out_proj"]["w"])))
        layer.self_attn.out_proj.bias.copy_(torch.tensor(np.asarray(p["out_proj"]["b"])))
        layer.linear1.weight.copy_(torch.tensor(np.asarray(p["lin1"]["w"])))
        layer.linear1.bias.copy_(torch.tensor(np.asarray(p["lin1"]["b"])))
        layer.linear2.weight.copy_(torch.tensor(np.asarray(p["lin2"]["w"])))
        layer.linear2.bias.copy_(torch.tensor(np.asarray(p["lin2"]["b"])))
        layer.norm1.weight.copy_(torch.tensor(np.asarray(p["ln1"]["scale"])))
        layer.norm1.bias.copy_(torch.tensor(np.asarray(p["ln1"]["bias"])))
        layer.norm2.weight.copy_(torch.tensor(np.asarray(p["ln2"]["scale"])))
        layer.norm2.bias.copy_(torch.tensor(np.asarray(p["ln2"]["bias"])))


@pytest.mark.parametrize("d_model,nhead,T,B", [(160, 2, 17, 4), (84, 2, 9, 3)])
def test_encoder_matches_torch(d_model, nhead, T, B, rng_np):
    nlayers, ffn = 2, 2 * d_model
    params = transformer_encoder_init(jax.random.PRNGKey(0), d_model, nhead, ffn, nlayers)

    enc_layer = torch.nn.TransformerEncoderLayer(d_model, nhead, ffn, dropout=0.0)
    encoder = torch.nn.TransformerEncoder(enc_layer, nlayers)
    # each torch layer is a deepcopy; port weights into each
    for i, layer in enumerate(encoder.layers):
        port_layer_to_torch(params[f"layer{i}"], layer)
    encoder.eval()

    x = rng_np.normal(size=(T, B, d_model)).astype(np.float32)
    lengths = rng_np.integers(1, T + 1, size=B)
    mask = np.arange(T)[None, :] >= lengths[:, None]  # [B, T] True = pad

    with torch.no_grad():
        expect = encoder(torch.tensor(x),
                         src_key_padding_mask=torch.tensor(mask)).numpy()

    got = transformer_encoder_apply(
        params, jnp.asarray(x.transpose(1, 0, 2)), jnp.asarray(mask), nhead)
    got = np.asarray(got).transpose(1, 0, 2)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)
