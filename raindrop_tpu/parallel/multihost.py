"""Multi-host input pipeline + per-host sharded checkpoints.

The reference is strictly single-process/single-GPU (SURVEY.md §2.5); this
module is the framework's multi-host data story (SURVEY.md §7 'multi-host
input pipeline'), built on three pieces:

  1. **Deterministic disjoint sampler shards** — every process runs the
     SAME seeded balanced sampler (data/sampler.py) and therefore computes
     the same global batch index stream; each process then takes its own
     contiguous slice of every batch. Disjointness and determinism are by
     construction (no communication), and checkpointing the one numpy RNG
     state restores the whole fleet's sampler.
  2. **Global device arrays from process-local data** — each process
     assembles only its slice of the batch on host and calls
     `jax.make_array_from_process_local_data` to stitch the global sharded
     array; XLA's GSPMD partitioner does the rest. At Raindrop dataset
     scale (<=12k samples) every host keeps the full normalized split in
     host RAM and shards *work*, not storage: per-step H2D traffic is
     1/process_count of the global batch.
  3. **Per-host checkpoint shards** — each process writes only the array
     shards its devices own (replicated leaves are written by process 0
     alone), as `<path>.shard<k>-of<n>.npz`; loading reassembles from
     whichever shard files are visible. This is the mechanism
     train/checkpoint.py's header promises.

Single-process multi-device (the CI regime, 8 virtual CPU devices) runs the
exact same code paths: process_count()==1 makes the sampler shard the
identity and `make_array_from_process_local_data` a sharded device_put.
The process-order assumption (mesh 'data' axis enumerates processes in
jax.process_index() order, which jax.make_mesh guarantees for standard
contiguous meshes) is documented on `local_batch_indices`.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# --------------------------------------------------------------- sampling
def local_batch_indices(global_idx: np.ndarray, process_index: int,
                        process_count: int) -> np.ndarray:
    """This process's slice of one global batch's sample indices.

    global_idx [B] must be identical on every process (same seeded
    sampler); the slice is contiguous so it lines up with the process's
    block of the mesh 'data' axis (jax device order enumerates processes
    contiguously for meshes built by jax.make_mesh / make_mesh). B must
    divide evenly — the balanced sampler always emits fixed-size batches.
    """
    B = len(global_idx)
    if B % process_count:
        raise ValueError(f"global batch {B} not divisible by "
                         f"{process_count} processes")
    per = B // process_count
    return np.asarray(global_idx)[process_index * per:
                                  (process_index + 1) * per]


def sharded_balanced_batches(y, batch_size: int, strategy: int, rng,
                             *, n_batches: Optional[int] = None,
                             process_index: Optional[int] = None,
                             process_count: Optional[int] = None
                             ) -> Iterator[np.ndarray]:
    """The balanced sampler (reference code/Raindrop.py:264-307 semantics),
    sharded: yields this process's disjoint slice of every global batch.
    All processes must pass identically-seeded rngs. Thin veneer over the
    sampler's own (shard_id, num_shards) support — same contiguous-slice
    semantics as local_batch_indices."""
    from raindrop_tpu.data.sampler import balanced_batches

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    yield from balanced_batches(y, batch_size, strategy, rng,
                                n_batches=n_batches,
                                shard_id=pi, num_shards=pc)


# ------------------------------------------------------- global batch build
def global_batch(mesh: Mesh, local: Dict[str, np.ndarray],
                 *, batch_axis: str = "data") -> Dict[str, jax.Array]:
    """Stitch per-process local batch arrays into global jax.Arrays sharded
    P(batch_axis) on dim 0 (replicated over every other mesh axis).

    local: this process's slice of each batch array ([B_local, ...]).
    The global batch dim is B_local * process_count.
    """
    pc = jax.process_count()
    out = {}
    for k, v in local.items():
        v = np.asarray(v)
        sharding = NamedSharding(mesh, P(batch_axis,
                                         *([None] * (v.ndim - 1))))
        global_shape = (v.shape[0] * pc,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape)
    return out


# -------------------------------------------------- per-host ckpt shards
def _leaf_key(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def save_sharded_checkpoint(path: str, tree, *,
                            process_index: Optional[int] = None,
                            process_count: Optional[int] = None) -> str:
    """Write this process's shard file of a (possibly sharded) pytree.

    Per leaf: fully-replicated arrays are written by process 0 only;
    sharded arrays contribute one entry per unique addressable shard,
    keyed `<leaf>@<start0>,<start1>,...` with the shard's index origin, so
    any set of shard files that covers the array reassembles it. Returns
    the shard filename written.
    """
    import os

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    shapes: Dict[str, np.ndarray] = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _leaf_key(p)
        if not isinstance(leaf, jax.Array) or leaf.sharding.is_fully_replicated:
            if pi == 0:
                arrays[key] = np.asarray(jax.device_get(leaf))
            continue
        shapes[key] = np.asarray(leaf.shape, np.int64)
        seen = set()
        for shard in leaf.addressable_shards:
            origin = tuple(sl.start or 0 for sl in shard.index)
            if origin in seen:
                continue
            seen.add(origin)
            arrays[f"{key}@{','.join(map(str, origin))}"] = np.asarray(
                shard.data)
    for key, shp in shapes.items():
        arrays[f"{key}#shape"] = shp
    # remove stale shard files from runs with a DIFFERENT process count —
    # a later load would otherwise glob both generations and silently mix
    # them (all current writers share pc, so deleting other-of<n> files is
    # race-free)
    import glob as _glob

    for old in _glob.glob(f"{path}.shard*-of*.npz"):
        if not old.endswith(f"-of{pc}.npz"):
            try:
                os.remove(old)
            except OSError:
                pass
    fname = f"{path}.shard{pi}-of{pc}.npz"
    np.savez(fname, **arrays)
    return fname


def load_sharded_checkpoint(path: str, like=None) -> Dict[str, np.ndarray]:
    """Reassemble `save_sharded_checkpoint` files into full host arrays
    keyed by leaf path. Reads every `<path>.shard*-of*.npz` present; raises
    if any sharded leaf has uncovered regions. `like` (optional pytree with
    the same structure) rebuilds the pytree instead of the flat dict."""
    import glob

    files = sorted(glob.glob(f"{path}.shard*-of*.npz"))
    if not files:
        raise FileNotFoundError(f"no shard files at {path}.shard*-of*.npz")
    # all shard files must come from ONE run generation (same -of<n>):
    # mixed process counts mean stale files from an earlier run are present
    counts = {f.rsplit("-of", 1)[1] for f in files}
    if len(counts) > 1:
        raise ValueError(
            f"mixed shard generations at {path}: process counts "
            f"{sorted(counts)} — remove the stale files")
    full: Dict[str, np.ndarray] = {}
    pieces: Dict[str, list] = {}
    shapes: Dict[str, tuple] = {}
    for f in files:
        with np.load(f) as z:
            for k in z.files:
                if k.endswith("#shape"):
                    shapes[k[:-6]] = tuple(int(v) for v in z[k])
                elif "@" in k:
                    leaf, origin = k.rsplit("@", 1)
                    origin = tuple(int(v) for v in origin.split(","))
                    pieces.setdefault(leaf, []).append((origin, z[k]))
                else:
                    full[k] = z[k]
    for leaf, parts in pieces.items():
        buf = np.zeros(shapes[leaf], parts[0][1].dtype)
        covered = np.zeros(shapes[leaf], bool)
        for origin, chunk in parts:
            sl = tuple(slice(o, o + s) for o, s in zip(origin, chunk.shape))
            buf[sl] = chunk
            covered[sl] = True
        if not covered.all():
            raise ValueError(f"shard files do not cover leaf {leaf!r}")
        full[leaf] = buf
    if like is not None:
        paths, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = [full[_leaf_key(p)] for p, _ in paths]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like), leaves)
    return full
