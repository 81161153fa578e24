"""Observability: profiler traces, NaN guards, throughput counters.

The reference's only instrumentation is wall-clock time.time() and a
disabled wandb hook (reference code/Raindrop.py:2-10,287,376-378 —
SURVEY.md §5.1). Here:

  * `profile_trace` wraps a step range in a jax.profiler trace for
    xprof/tensorboard;
  * `nan_guard` checks a pytree for non-finite leaves on the host (cheap,
    off the hot path — call on loss/grads every N steps); the moral
    descendant of the reference's inline NaN asserts
    (code/baselines/models.py:1210-1211);
  * `debug_nan_context` flips jax's global NaN checker on for a scope
    (compiles with checks; slow — debugging only);
  * `Throughput` tracks samples/s and edges/s (the BASELINE.json metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def enable_persistent_compile_cache(
        cache_dir: Optional[str] = None,
        min_compile_secs: float = 1.0) -> bool:
    """Turn on XLA's on-disk compilation cache.

    Compile latency on tunneled/offloaded TPU backends varies by an order
    of magnitude run to run for identical programs (observed: seconds to
    >10 min for the same scanned train step); the persistent cache makes
    every entry point (CLI, serving, bench) compile once per code version.
    Called by run.py, serve.py, bench.py and __graft_entry__ — NOT at
    library import (a library must not mutate global jax config).

    The default directory is `.jax_cache/` at the repository root — a
    DURABLE location (unlike /tmp) so warm entries survive reboots and a
    later cold-start bench run pays no tunnel-compile tax. Override with
    $JAX_COMPILATION_CACHE_DIR or the cache_dir argument.
    Returns False if the running jax has no such config (never raises).
    """
    import os

    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(repo_root, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        return True
    except Exception:
        return False


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_guard(tree, name: str = "tree", raise_error: bool = True
              ) -> Dict[str, int]:
    """Count non-finite elements per leaf path; host-side."""
    bad = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(jax.device_get(leaf))
        if np.issubdtype(a.dtype, np.floating):
            n = int(np.size(a) - np.isfinite(a).sum())
            if n:
                key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                               for p in path)
                bad[key] = n
    if bad and raise_error:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
    return bad


def frozen_param_report(old_params, new_params) -> list:
    """Paths of parameters that did NOT change between two pytrees.

    The moral descendant of the reference GRU-D driver's state-dict diff
    (code/baselines/GRU-D_baseline.py:286-288,355-363: snapshot every
    tensor before training, print 'Not updated in <name>' for any that is
    bitwise unchanged after an epoch) — the cheap way to catch dead
    parameters, a broken optimizer mask, or a detached computation path.
    Host-side; call it on device_get'd params every N epochs.

    Note: for Raindrop itself a nonempty report is EXPECTED — the reference
    model carries dead parameters that torch Adam never updates and our
    optimizer mask deliberately freezes (models/raindrop.raindrop_param_mask).
    """
    frozen = []
    old_leaves = jax.tree_util.tree_flatten_with_path(old_params)[0]
    new_map = dict(jax.tree_util.tree_flatten_with_path(new_params)[0])
    for path, leaf in old_leaves:
        a = np.asarray(jax.device_get(leaf))
        b = np.asarray(jax.device_get(new_map[path]))
        if a.shape == b.shape and np.array_equal(a, b):
            frozen.append(jax.tree_util.keystr(path))
    return frozen


@contextlib.contextmanager
def debug_nan_context() -> Iterator[None]:
    """Enable jax_debug_nans inside the scope (recompiles; debugging only)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


# Peak matmul throughput of the target chip, used as the MFU denominator.
# TPU v5e (v5 lite): 197 TFLOP/s bf16. JAX's DEFAULT matmul precision on
# TPU lowers float32 dots to bf16 MXU passes, so the same ceiling applies
# to fp32-array runs (there is no separate native-f32 MXU rate on v5e);
# MFU reported against this number is therefore conservative-correct for
# both precisions. Override per-chip via the `peak_flops` argument.
V5E_PEAK_FLOPS = 197e12


def compiled_flops(jitted_fn, *args) -> Optional[float]:
    """Model FLOPs of one call of a jitted function, from XLA's compiled
    cost analysis (the basis for MFU accounting — SURVEY.md §6 north star).

    `args` may be real arrays OR jax.ShapeDtypeStructs — lowering only
    needs avals, so pass ShapeDtypeStructs to avoid touching (possibly
    donated) buffers. NOTE: XLA's HloCostAnalysis counts a while/scan BODY
    ONCE regardless of trip count (verified on jax 0.9), so call this on
    the UNSCANNED per-step function and multiply by steps yourself.
    Returns None if the backend exposes no cost model (never raises).
    """
    try:
        avals = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), args)
        cost = jitted_fn.lower(*avals).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def flagship_kernel_flops(cfg, batch_size: int, *, train: bool) -> float:
    """Analytic model FLOPs of the flagship model's Pallas-kernelized ops
    per step (the fused encoder layer: qkv projection + attention core +
    out-projection + FFN, ops/fused_encoder.py).

    XLA's HloCostAnalysis reports custom calls as ZERO flops, so
    `compiled_flops` excludes everything computed inside Pallas kernels —
    through round 4 that silently excluded the attention core itself
    (the PAM MFU numerator was missing ~108 GFLOP/step of real matmuls).
    This returns the THEORETICAL matmul flops of the kernelized layer
    (forward; backward credited at 2x forward; the flash-style backward
    recompute is NOT credited — the standard MFU convention), to be ADDED
    to the cost-analysis number when the fused regime is active. Zero in
    the dense regime (T < 128 or huge T), where every op is visible to
    the cost analysis.
    """
    import jax as _jax

    from raindrop_tpu.ops.flash_attention import MAX_FUSED_T

    T, d, f = cfg.max_len, cfg.d_transformer, cfg.ffn_dim
    backend = cfg.attention_backend
    if (_jax.default_backend() != "tpu"
            or backend not in ("auto", "flash", "fused_layer")):
        return 0.0
    t8 = -(-T // 8) * 8
    # mirror nn/transformer.py's ladder exactly:
    #   fused layer (qkv+attn+out-proj+FFN hidden): explicit, or auto at
    #     T >= 384, both only within the fused-VMEM regime;
    #   flash attention (only the attention core hidden): explicit
    #     'flash' at any T, or auto at 128 <= T < 384, or auto T >= 384
    #     beyond the fused regime (streaming flash kernel);
    #   dense (everything visible to cost analysis): auto below T=128.
    layer_fused = ((backend == "fused_layer"
                    or (backend == "auto" and T >= 384))
                   and t8 <= MAX_FUSED_T)
    flash_attn = (backend == "flash"
                  or (backend == "auto" and T >= 128 and not layer_fused))
    if not (layer_fused or flash_attn):
        return 0.0
    attn = 4 * T * T * d                 # QK^T + PV over all heads
    per_sample = (attn + 8 * T * d * d + 4 * T * d * f if layer_fused
                  else attn)
    return per_sample * (3.0 if train else 1.0) * batch_size * cfg.nlayers


def mfu(flops_per_sec: Optional[float],
        peak_flops: float = V5E_PEAK_FLOPS) -> Optional[float]:
    """Model FLOPs utilization in [0, 1]: achieved model FLOP/s over the
    chip's peak matmul FLOP/s. Model flops (from `compiled_flops`) count
    the HLO as written — MXU tile padding waste is NOT credited, so this
    is the honest utilization number."""
    if flops_per_sec is None:
        return None
    return flops_per_sec / peak_flops


class Throughput:
    """Rolling samples/s / edges/s counters.

    edges_per_sample: 2 * F^2 for the shipped 2-layer complete-graph model
    (SURVEY.md §3.3).
    """

    def __init__(self, edges_per_sample: Optional[int] = None):
        self.edges_per_sample = edges_per_sample
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._samples = 0

    def update(self, n_samples: int) -> None:
        self._samples += n_samples

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def summary(self) -> Dict[str, float]:
        dt = max(self.elapsed, 1e-9)
        out = {"samples_per_sec": self._samples / dt, "elapsed_s": dt}
        if self.edges_per_sample:
            out["edges_per_sec"] = self._samples * self.edges_per_sample / dt
        return out
