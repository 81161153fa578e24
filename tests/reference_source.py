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
    if REFERENCE_CODE not in sys.path:
        sys.path.insert(0, REFERENCE_CODE)
    _patched = True


def load(name: str):
    """Import a reference module (e.g. 'models_rd', 'Ob_propagation',
    'utils_rd') from /root/reference/code, unmodified."""
    if name not in _modules:
        _patch_environment()
        _modules[name] = importlib.import_module(name)
    return _modules[name]
