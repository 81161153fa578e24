"""Full-model pure-torch oracle of Raindrop_v2 (eval mode).

A literal transcription of the reference forward (code/models_rd.py:278-387)
in plain torch — per-sample Python loop, torch.nn.TransformerEncoder for the
temporal stage — consuming raindrop_tpu's parameter pytree. Used only by
tests to check the batched JAX model end-to-end (wiring + math), composing
the already-oracle-tested pieces the way the reference does.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from tests.torch_oracle import ob_propagate_torch


def _t(a):
    return torch.tensor(np.asarray(a))


def _linear(p, x):
    return x @ _t(p["w"]).T + _t(p["b"])


def _build_torch_encoder(params, d_model, nhead, ffn_dim, nlayers):
    enc_layer = torch.nn.TransformerEncoderLayer(
        d_model, nhead, ffn_dim, dropout=0.0)
    encoder = torch.nn.TransformerEncoder(enc_layer, nlayers)
    sd = encoder.state_dict()
    for i in range(nlayers):
        lp = params[f"layer{i}"]
        sd[f"layers.{i}.self_attn.in_proj_weight"] = _t(lp["in_proj_w"])
        sd[f"layers.{i}.self_attn.in_proj_bias"] = _t(lp["in_proj_b"])
        sd[f"layers.{i}.self_attn.out_proj.weight"] = _t(lp["out_proj"]["w"])
        sd[f"layers.{i}.self_attn.out_proj.bias"] = _t(lp["out_proj"]["b"])
        sd[f"layers.{i}.linear1.weight"] = _t(lp["lin1"]["w"])
        sd[f"layers.{i}.linear1.bias"] = _t(lp["lin1"]["b"])
        sd[f"layers.{i}.linear2.weight"] = _t(lp["lin2"]["w"])
        sd[f"layers.{i}.linear2.bias"] = _t(lp["lin2"]["b"])
        sd[f"layers.{i}.norm1.weight"] = _t(lp["ln1"]["scale"])
        sd[f"layers.{i}.norm1.bias"] = _t(lp["ln1"]["bias"])
        sd[f"layers.{i}.norm2.weight"] = _t(lp["ln2"]["scale"])
        sd[f"layers.{i}.norm2.bias"] = _t(lp["ln2"]["bias"])
    encoder.load_state_dict(sd)
    encoder.eval()
    return encoder


def raindrop_v2_torch(params, cfg, src, static, times, lengths):
    """Eval-mode forward. Inputs are numpy arrays with the reference's
    time-major shapes. Returns (logits, distance) numpy."""
    params = {k: v for k, v in params.items()}
    src = _t(src).float()
    times = _t(times).float()
    lengths = _t(lengths).long()
    T, B, _ = src.shape
    Fs, d_ob, d_pe = cfg.d_inp, cfg.d_ob, cfg.d_pe

    values = src[:, :, :Fs]
    h = torch.repeat_interleave(values, d_ob, dim=-1) * _t(params["R_u"])
    h = F.relu(h)

    # PositionalEncodingTF (models_rd.py:28-43)
    timescales = cfg.max_len ** np.linspace(0, 1, d_pe // 2)
    scaled = times.unsqueeze(-1) / torch.tensor(timescales[None, None, :])
    pe = torch.cat([torch.sin(scaled), torch.cos(scaled)], dim=-1).float()

    # graph propagation per sample (models_rd.py:306-343)
    edge_index = torch.nonzero(torch.ones(Fs, Fs)).T
    edge_weights = torch.ones(edge_index.shape[1])
    output = torch.zeros(T, B, Fs * d_ob)
    alpha_all = torch.zeros(edge_index.shape[1], B)
    for unit in range(B):
        stepdata = h[:, unit, :].reshape(T, Fs, d_ob).permute(1, 0, 2)
        stepdata = stepdata.reshape(Fs, T * d_ob)
        p_t = pe[:, unit, :]
        stepdata, (ei2, a1) = ob_propagate_torch(
            params["ob_propagation"], stepdata, p_t, edge_index, edge_weights,
            use_beta=False, ob_dim=d_ob)
        w2 = a1.squeeze(-1)
        stepdata, (_, a2) = ob_propagate_torch(
            params["ob_propagation_layer2"], stepdata, p_t, ei2, w2,
            use_beta=False, ob_dim=d_ob)
        stepdata = stepdata.view(Fs, T, d_ob).permute(1, 0, 2).reshape(
            T, Fs * d_ob)
        output[:, unit, :] = stepdata
        alpha_all[:, unit] = a2.squeeze(-1)

    distance = torch.cdist(alpha_all.T, alpha_all.T, p=2).mean()

    # PE concat + temporal transformer (models_rd.py:348-358)
    if cfg.sensor_wise_mask:
        ext = output.view(T, B, Fs, d_ob)
        ext_pe = pe.unsqueeze(2).repeat(1, 1, Fs, 1)
        output = torch.cat([ext, ext_pe], dim=-1).view(T, B, Fs * (d_ob + d_pe))
    else:
        output = torch.cat([output, pe], dim=2)

    mask = torch.arange(T)[None, :] >= lengths[:, None]
    encoder = _build_torch_encoder(params["transformer_encoder"],
                                   cfg.d_transformer, cfg.nhead,
                                   cfg.ffn_dim, cfg.nlayers)
    with torch.no_grad():
        r_out = encoder(output, src_key_padding_mask=mask)

    # masked mean (models_rd.py:364-379)
    if cfg.sensor_wise_mask:
        missing_mask = src[:, :, Fs:2 * Fs]
        pooled = torch.zeros(B, Fs, d_ob + d_pe)
        r4 = r_out.view(T, B, Fs, d_ob + d_pe)
        for se in range(Fs):
            out = r4[:, :, se, :]
            ln = missing_mask[:, :, se].sum(dim=0, keepdim=True).T
            pooled[:, se, :] = torch.sum(
                out * (1 - missing_mask[:, :, se].unsqueeze(-1)), dim=0) / (ln + 1)
        pooled = pooled.view(B, Fs * (d_ob + d_pe))
    else:
        mask2 = mask.permute(1, 0).unsqueeze(2).float()
        pooled = torch.sum(r_out * (1 - mask2), dim=0) / (lengths[:, None] + 1)

    if cfg.static and static is not None:
        emb = _linear(params["emb"], _t(static).float())
        pooled = torch.cat([pooled, emb], dim=1)

    # mlp_static head
    mp = params["mlp_static"]
    out = _linear(mp["lin1"], F.relu(_linear(mp["lin0"], pooled)))
    return out.detach().numpy(), float(distance)
