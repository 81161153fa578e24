"""Checkpointing: params + optimizer + scheduler + sampler state.

The reference saves only best-val-AUROC model state_dicts mid-training
(reference code/Raindrop.py:374,381) and cannot resume mid-run. Here a
checkpoint is the full training state — params, optax opt state, plateau
scheduler, epoch counter, data-RNG state — serialized as a flat .npz plus a
JSON config sidecar, so runs resume exactly. Arrays cross host<->device via
jax.device_get/put; multi-host sharded checkpointing layers on top in
parallel/ (each host writes its process-local shard).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, params, opt_state=None, *,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    """Write <path>.npz (+<path>.meta.json when meta given)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f"params/{k}": v for k, v in _flatten(jax.device_get(params)).items()}
    if opt_state is not None:
        arrays.update({f"opt/{k}": v
                       for k, v in _flatten(jax.device_get(opt_state)).items()})
    np.savez(path + ".npz", **arrays)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str, params_template, opt_state_template=None
                    ) -> Tuple[Any, Any, Optional[Dict]]:
    """Restore into the structure of the given templates."""
    with np.load(path + ".npz") as z:
        arrays = dict(z)

    def restore(tree, prefix):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for p, leaf in flat:
            key = prefix + "/".join(
                str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
            a = arrays[key]
            leaves.append(np.asarray(a, dtype=np.asarray(leaf).dtype).reshape(np.shape(leaf)))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = restore(params_template, "params/")
    opt_state = (restore(opt_state_template, "opt/")
                 if opt_state_template is not None else None)
    meta = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return params, opt_state, meta


# ---------------------------------------------------------------------------
# Orbax backend: multi-host/sharded checkpoints. The flat-.npz path above is
# the dependency-light single-host default; use these on pods where each
# host must write its own shard of a NamedSharding-distributed state
# (SURVEY.md §5.4 "Orbax-style sharded checkpoints").
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(path: str, state) -> None:
    """Write a pytree (params/opt state/step counters) with orbax; sharded
    arrays are written by their owning hosts."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def load_checkpoint_orbax(path: str, template=None):
    """Restore a pytree; with `template`, restores with its structure,
    dtypes, and shardings."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(os.path.abspath(path))
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.ArrayRestoreArgs(sharding=getattr(x, "sharding", None)),
            template)
        return ckptr.restore(os.path.abspath(path),
                             item=template, restore_args=restore_args)
