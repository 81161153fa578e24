"""Pure-torch stand-ins for the reference's PyG / torch_scatter / torch_sparse
dependency surface.

The reference (/root/reference/code) bottoms out in four native-dependency
entry points (SURVEY.md §2.9): `MessagePassing.propagate` gather,
`torch_geometric.utils.softmax` (segment softmax), `torch_scatter.scatter`
(segment sum), and `torch_geometric.nn.inits` initializers. None of those
wheels exist on this image. This module implements exactly that surface in
plain torch so the UNMODIFIED reference sources import and run on CPU,
giving the test suite a true source-level oracle (instead of only the
hand-transcribed one in tests/torch_oracle.py / tests/torch_raindrop.py).

Only what `code/Ob_propagation.py` and `code/transformer_conv.py` touch at
runtime is implemented; everything else raises.
"""

from __future__ import annotations

import inspect
import math
import sys
import types
from typing import Optional, Tuple

import torch


# ---------------------------------------------------------------- scatter ops

def scatter(src, index, dim=0, dim_size=None, reduce="add"):
    """torch_scatter.scatter for the reduces the reference uses (add/sum/max).

    index is 1-D along `dim` (the only form PyG's aggregate produces,
    reference code/Ob_propagation.py:227).
    """
    if dim < 0:
        dim += src.dim()
    if dim_size is None:
        dim_size = int(index.max().item()) + 1 if index.numel() else 0
    shape = list(src.shape)
    shape[dim] = dim_size
    if reduce in ("add", "sum"):
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
        return out.index_add_(dim, index, src)
    if reduce in ("max", "amax"):
        out = torch.full(shape, float("-inf"), dtype=src.dtype, device=src.device)
        out.index_reduce_(dim, index, src, "amax", include_self=True)
        return out
    raise NotImplementedError(f"scatter reduce={reduce!r}")


def gather_csr(*a, **k):  # pragma: no cover - not on the reference's hot path
    raise NotImplementedError("gather_csr is imported but never called by the reference")


def segment_csr(*a, **k):  # pragma: no cover
    raise NotImplementedError("segment_csr is imported but never called by the reference")


def segment_softmax(src, index, num_nodes=None):
    """torch_geometric.utils.softmax: numerically-stable softmax over the
    edges sharing the same destination segment (code/Ob_propagation.py:195)."""
    N = num_nodes if num_nodes is not None else int(index.max().item()) + 1
    src_max = scatter(src.detach(), index, dim=0, dim_size=N, reduce="max")
    src_max = torch.where(torch.isinf(src_max), torch.zeros_like(src_max), src_max)
    out = (src - src_max.index_select(0, index)).exp()
    out_sum = scatter(out, index, dim=0, dim_size=N, reduce="sum") + 1e-16
    return out / out_sum.index_select(0, index)


def _pyg_softmax(src, index, ptr=None, num_nodes=None):
    return segment_softmax(src, index, num_nodes)


# ---------------------------------------------------------------- initializers

def glorot(tensor):
    if tensor is not None:
        stdv = math.sqrt(6.0 / (tensor.size(-2) + tensor.size(-1)))
        tensor.data.uniform_(-stdv, stdv)


def uniform(size, tensor):
    if tensor is not None:
        bound = 1.0 / math.sqrt(size)
        tensor.data.uniform_(-bound, bound)


def zeros(tensor):
    if tensor is not None:
        tensor.data.fill_(0)


def ones(tensor):
    if tensor is not None:
        tensor.data.fill_(1)


def reset(nn):
    def _reset(item):
        if hasattr(item, "reset_parameters"):
            item.reset_parameters()

    if nn is not None:
        if hasattr(nn, "children") and len(list(nn.children())) > 0:
            for item in nn.children():
                _reset(item)
        else:
            _reset(nn)


# ------------------------------------------------------------- MessagePassing

class SparseTensor:  # only ever used in isinstance() checks by the reference
    pass


class MessagePassing(torch.nn.Module):
    """The slice of PyG's MessagePassing the reference subclasses rely on:

    source_to_target flow over a [2, E] COO edge_index; x_j gathered from the
    source row, x_i from the target row along node_dim; `message` called with
    whichever of (x_i, x_j, edge_*, index, ptr, size_i) its signature names;
    `aggregate` defaulting to scatter-reduce by destination. Signature
    dispatch mirrors PyG's Inspector.
    """

    def __init__(self, aggr: str = "add", node_dim: int = 0,
                 flow: str = "source_to_target", **kwargs):
        super().__init__()
        self.aggr = aggr
        self.node_dim = node_dim
        self.flow = flow

    # -- PyG-compatible extension points --------------------------------
    def message(self, x_j):  # pragma: no cover - always overridden here
        return x_j

    def aggregate(self, inputs, index, ptr=None, dim_size=None):
        return scatter(inputs, index, dim=self.node_dim, dim_size=dim_size,
                       reduce=self.aggr)

    def update(self, inputs):
        return inputs

    # -- driver -----------------------------------------------------------
    def _call_with_signature(self, fn, available):
        params = inspect.signature(fn).parameters
        return fn(**{name: available.get(name) for name in params})

    def propagate(self, edge_index, x=None, size=None, **kwargs):
        assert self.flow == "source_to_target"
        if not isinstance(x, tuple):
            x = (x, x)
        src_x, dst_x = x
        row, col = edge_index[0], edge_index[1]
        x_j = src_x.index_select(self.node_dim, row)
        x_i = dst_x.index_select(self.node_dim, col)
        size_i = dst_x.size(self.node_dim)

        available = dict(kwargs)
        available.update(x_i=x_i, x_j=x_j, index=col, ptr=None,
                         size_i=size_i, edge_index=edge_index)
        out = self._call_with_signature(self.message, available)

        available["inputs"] = out
        available["dim_size"] = size_i
        out = self._call_with_signature(self.aggregate, available)
        return self._call_with_signature(self.update, dict(available, inputs=out))


# ---------------------------------------------------------------- installer

def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install():
    """Register the fake torch_geometric / torch_scatter / torch_sparse
    packages in sys.modules (idempotent)."""
    if "torch_geometric" in sys.modules:
        return

    class GINConv(torch.nn.Module):  # imported by baselines/models.py:17,
        def __init__(self, *a, **k):  # never instantiated on tested paths
            raise NotImplementedError("GINConv shim is import-only")

    def global_add_pool(*a, **k):
        raise NotImplementedError("global_add_pool shim is import-only")

    def odeint(func, y0, t, rtol=None, atol=None, method=None, options=None):
        """torchdiffeq.odeint for the solvers the reference requests:
        fixed-grid euler (DGM2, baselines/DGM2_baseline.py:310) and rk4."""
        ys = [y0]
        y = y0
        for i in range(len(t) - 1):
            t0, dt = t[i], t[i + 1] - t[i]
            if method == "rk4":
                k1 = func(t0, y)
                k2 = func(t0 + dt / 2, y + dt / 2 * k1)
                k3 = func(t0 + dt / 2, y + dt / 2 * k2)
                k4 = func(t0 + dt, y + dt * k3)
                y = y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            else:  # euler (the reference's configured method)
                y = y + dt * func(t0, y)
            ys.append(y)
        return torch.stack(ys)

    tg = _module("torch_geometric")
    tg_nn = _module("torch_geometric.nn")
    tg.nn = tg_nn
    tg_nn.conv = _module("torch_geometric.nn.conv", MessagePassing=MessagePassing)
    tg_nn.GINConv = GINConv
    tg_nn.global_add_pool = global_add_pool
    _module("torchdiffeq", odeint=odeint)
    tg_nn.inits = _module(
        "torch_geometric.nn.inits",
        uniform=uniform, glorot=glorot, zeros=zeros, ones=ones, reset=reset)
    tg.utils = _module("torch_geometric.utils", softmax=_pyg_softmax)
    tg.typing = _module(
        "torch_geometric.typing",
        PairTensor=Tuple[torch.Tensor, torch.Tensor],
        Adj=torch.Tensor,
        OptTensor=Optional[torch.Tensor],
        OptPairTensor=Tuple[torch.Tensor, Optional[torch.Tensor]],
        Size=Optional[Tuple[int, int]],
    )
    _module("torch_sparse", SparseTensor=SparseTensor)
    _module("torch_scatter", scatter=scatter, gather_csr=gather_csr,
            segment_csr=segment_csr)
