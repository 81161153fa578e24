"""Loader for the UNMODIFIED reference sources (/root/reference/code) so they
run on this image as parity oracles.

The reference assumes a Windows + CUDA + PyG environment; four environment
patches (none of which touch reference files) make it run on CPU here:

  * tests.pyg_shim installs pure-torch torch_geometric/torch_scatter/
    torch_sparse stand-ins (the wheels aren't on this image);
  * `os.add_dll_directory` is Windows-only (reference code/models_rd.py:8-9)
    -> no-op;
  * `.cuda()` on tensors/modules -> identity (torch here is CPU-only; the
    reference hard-codes .cuda() throughout, e.g. code/models_rd.py:239-253);
  * `Tensor.byte()` -> `Tensor.bool()`: torch>=2 rejects uint8 mask indexing,
    which the reference uses once (`adj[torch.eye(F).byte()] = 1`,
    code/models_rd.py:311); bool indexing is semantically identical there.

Import reference modules through `load(name)`.
"""

from __future__ import annotations

import importlib
import os
import sys

import torch

from tests import pyg_shim

REFERENCE_CODE = "/root/reference/code"
REFERENCE_BASELINES = "/root/reference/code/baselines"
REFERENCE_MTAND = "/root/reference/code/baselines/mTAND"

_patched = False
_modules = {}


def _patch_environment():
    global _patched
    if _patched:
        return
    pyg_shim.install()
    if not hasattr(os, "add_dll_directory"):
        os.add_dll_directory = lambda path: None
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.byte = lambda self: self.bool()
    # code/ first: baselines/models.py's `from transformer_conv import ...`
    # resolves to code/transformer_conv.py, whose diff vs the baselines copy
    # is comments only (SURVEY.md §2.1).
    for p in (REFERENCE_BASELINES, REFERENCE_CODE):
        if p not in sys.path:
            sys.path.insert(0, p)
    _patched = True


def load(name: str):
    """Import a reference module unmodified — from /root/reference/code
    ('models_rd', 'Ob_propagation', 'utils_rd', ...) or code/baselines
    ('models', 'utils_phy12', ...)."""
    if name not in _modules:
        _patch_environment()
        _modules[name] = importlib.import_module(name)
    return _modules[name]


def load_file(path: str, alias: str):
    """Import a reference module by file path under a unique alias — for
    files whose basename collides across reference directories (both
    baselines/models.py and baselines/mTAND/models.py exist)."""
    if alias not in _modules:
        _patch_environment()
        spec = importlib.util.spec_from_file_location(alias, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[alias] = mod
        spec.loader.exec_module(mod)
        _modules[alias] = mod
    return _modules[alias]


def load_mtand_models():
    return load_file(os.path.join(REFERENCE_MTAND, "models.py"),
                     "reference_mtand_models")


# ---- weight-porting helpers (our pytree -> reference torch modules) -------

def _t(a):
    import numpy as np
    return torch.tensor(np.asarray(a), dtype=torch.float32)


def load_linear(module, p):
    """torch.nn.Linear <- our {'w': [out, in], 'b': [out]} dict."""
    module.weight.data = _t(p["w"])
    if "b" in p and module.bias is not None:
        module.bias.data = _t(p["b"])


def load_torch_encoder(encoder, tp):
    """torch.nn.TransformerEncoder <- our transformer_encoder_init pytree."""
    for i, layer in enumerate(encoder.layers):
        lp = tp[f"layer{i}"]
        layer.self_attn.in_proj_weight.data = _t(lp["in_proj_w"])
        layer.self_attn.in_proj_bias.data = _t(lp["in_proj_b"])
        load_linear(layer.self_attn.out_proj, lp["out_proj"])
        load_linear(layer.linear1, lp["lin1"])
        load_linear(layer.linear2, lp["lin2"])
        layer.norm1.weight.data = _t(lp["ln1"]["scale"])
        layer.norm1.bias.data = _t(lp["ln1"]["bias"])
        layer.norm2.weight.data = _t(lp["ln2"]["scale"])
        layer.norm2.bias.data = _t(lp["ln2"]["bias"])
