"""Independent pure-torch oracle of the Raindrop graph-propagation semantics.

Used ONLY by tests as a cross-implementation check. Written from the
documented semantics of reference code/Ob_propagation.py (segment softmax
over the aggregation index, x_i-based messages, pre-softmax alpha capture,
beta-path top-50% pruning with source-index aggregation) using plain torch
ops — no PyG/torch_scatter dependency.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F


def segment_softmax_torch(logits: torch.Tensor, index: torch.Tensor, num_segments: int):
    """Per-segment max-subtracted softmax; logits [E] or [E, C]."""
    if logits.dim() == 1:
        logits = logits.unsqueeze(-1)
        squeeze = True
    else:
        squeeze = False
    E, C = logits.shape
    maxes = torch.full((num_segments, C), float("-inf"))
    maxes.scatter_reduce_(0, index.unsqueeze(-1).expand(E, C), logits, "amax")
    maxes = torch.where(torch.isfinite(maxes), maxes, torch.zeros_like(maxes))
    ex = torch.exp(logits - maxes[index])
    denom = torch.zeros((num_segments, C))
    denom.scatter_add_(0, index.unsqueeze(-1).expand(E, C), ex)
    denom = torch.where(denom == 0, torch.ones_like(denom), denom)
    out = ex / denom[index]
    return out.squeeze(-1) if squeeze else out


def ob_propagate_torch(
    weights: dict,                 # numpy arrays keyed like raindrop_tpu params
    x: torch.Tensor,               # [n_nodes, D]
    p_t: torch.Tensor,             # [T, d_pe]
    edge_index: torch.Tensor,      # [2, E]
    edge_weights: torch.Tensor,    # [E]
    use_beta: bool,
    ob_dim: int,
):
    """Eval-mode (no dropout) forward of one propagation layer."""
    n_nodes, D = x.shape
    w_val = torch.tensor(weights["lin_value"]["w"])
    b_val = torch.tensor(weights["lin_value"]["b"])
    tgt = edge_index[1]
    x_i = x[tgt]

    if use_beta:
        n_step = p_t.shape[0]
        w_inc = torch.tensor(weights["increase_dim"]["w"])
        b_inc = torch.tensor(weights["increase_dim"]["b"])
        map_w = torch.tensor(weights["map_weights"])
        E = x_i.shape[0]
        h_w = (x_i @ w_inc.T + b_inc).reshape(E, n_step, 8 * ob_dim)
        w_v = map_w[tgt].unsqueeze(1).repeat(1, n_step, 1)
        p_emb = p_t.unsqueeze(0).repeat(E, 1, 1)
        aa = torch.cat([w_v, p_emb], dim=-1)
        beta = torch.mean(h_w * aa, dim=-1)
        gamma = beta * edge_weights.unsqueeze(-1)
        gamma = torch.repeat_interleave(gamma, ob_dim, dim=-1)
        scores = torch.mean(gamma, dim=1)
        k = gamma.shape[0] // 2
        top = torch.argsort(scores, descending=True)[:k]
        gamma = gamma[top]
        edge_index = edge_index[:, top]
        index = edge_index[0]
        x_i = x_i[top]
        alpha = torch.mean(gamma, dim=-1)
    else:
        gamma = edge_weights.unsqueeze(-1)
        index = tgt
        alpha = gamma

    g = segment_softmax_torch(gamma, index, n_nodes)
    if g.dim() == 1:
        g = g.unsqueeze(-1)
    msg = F.relu(x_i @ w_val.T + b_val) * g
    out = torch.zeros(n_nodes, D)
    out.scatter_add_(0, index.unsqueeze(-1).expand(msg.shape), msg)
    return out, (edge_index, alpha)
