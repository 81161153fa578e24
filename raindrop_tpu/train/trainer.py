"""Training driver: the reference's experiment protocol, jit-compiled.

Reproduces reference code/Raindrop.py's protocol exactly (SURVEY.md §3.1):
Adam + CrossEntropy, class-balanced batches, per-epoch validation with
ReduceLROnPlateau stepped on val AUPRC, best checkpoint keyed on val AUROC,
test metrics from the softmax path, 5-split mean±std with best-run-per-split
selected by AUPRC.

TPU-first differences from the reference driver:
  * one jit-compiled train step (forward+backward+Adam) with donated
    params/opt-state — no per-batch H2D sync of the whole split
    (the reference re-.cuda()s every slice, code/Raindrop.py:310-315);
  * static batch shapes: eval pads the ragged tail chunk instead of
    recompiling (the reference's tail chunk slices statics with
    start:start+batch_size — code/utils_rd.py:303 — which CLAMPS to the
    same rem rows, so behavior is identical);
  * optional data-parallel mesh: batches sharded over the 'data' axis via
    NamedSharding; gradients are averaged by XLA psum under jit.
  * throughput counters (samples/s, edges/s) and JSONL structured logs
    (the reference logs with print, SURVEY.md §5.5).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raindrop_tpu.config import RaindropConfig, TrainConfig
from raindrop_tpu.data.datasets import Split
from raindrop_tpu.data.sampler import balanced_batches, n_batches_per_epoch
from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init
from raindrop_tpu.train.checkpoint import save_checkpoint
from raindrop_tpu.train.metrics import classification_metrics
from raindrop_tpu.train.plateau import ReduceLROnPlateau


def apply_updates_masked(params, updates, mask):
    """optax.apply_updates that passes dead (mask=False) leaves through as
    the ORIGINAL input arrays.

    Adding even a zero update to a dead parameter makes XLA materialize a
    fresh output buffer for it — at PAM dims the two dead 184 MB
    `increase_dim` weights cost 2x0.57 ms of pure relayout-copy per train
    step (xplane profile, round 5; ~15% of the step). An identity leaf is
    aliased with the donated input instead, so the dead set costs nothing,
    exactly like torch Adam skipping grad-None params (DEVIATIONS.md #10).
    """
    if mask is None:
        return optax.apply_updates(params, updates)
    return jax.tree.map(
        lambda m, p, u: optax.apply_updates(p, u) if m else p,
        mask, params, updates)


@dataclasses.dataclass
class TrainResult:
    test_metrics: Dict[str, float]
    best_val_auroc: float
    best_val_auprc: float
    history: List[Dict[str, Any]]
    samples_per_sec: float
    params: Any = None
    # reference test-time diagnostics (code/Raindrop.py:405-406)
    test_confusion: Any = None          # [n_classes, n_classes] int array
    test_report: str = ""               # sklearn classification_report text


class Trainer:
    """One (model config, train config) pair; reusable across splits."""

    def __init__(self, cfg: RaindropConfig, tcfg: TrainConfig, *,
                 mesh=None, apply_fn=None, init_fn=None, update_mask=None):
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh
        # pluggable model (baselines reuse this trainer with their own fns)
        is_default_model = apply_fn is None
        self._is_default_model = is_default_model
        scale_out = (tcfg.context_parallel != "none"
                     or tcfg.pipeline_microbatches > 0 or tcfg.edge_partition)
        if scale_out and mesh is None:
            raise ValueError(
                "context_parallel/pipeline_microbatches/edge_partition "
                "need a mesh (Trainer(..., mesh=make_mesh(n_data, n_model)))")
        if scale_out and not is_default_model:
            raise ValueError("scale-out routes apply to the flagship "
                             "raindrop model only")
        self._apply = apply_fn or (
            lambda p, src, static, times, lengths, train, rng:
            raindrop_apply(p, cfg, src, static, times, lengths,
                           train=train, rng=rng, mesh=mesh,
                           context_parallel=tcfg.context_parallel,
                           pipeline_parallel=tcfg.pipeline_microbatches,
                           edge_partition=tcfg.edge_partition))
        self._init = init_fn or (lambda key: raindrop_init(key, cfg))
        # torch.optim.Adam skips grad-less params; mask the dead reference
        # params out of the optimizer for the same semantics (and less
        # optimizer-state traffic). Custom models pass their own mask.
        if update_mask is None and is_default_model:
            from raindrop_tpu.models.raindrop import raindrop_param_mask
            update_mask = raindrop_param_mask(cfg)
        elif update_mask is False:      # explicit opt-out
            update_mask = None
        self._update_mask = update_mask
        self._build()

    # ---- compiled steps ------------------------------------------------
    def _build(self):
        cfg = self.cfg
        # inject_hyperparams makes learning_rate a leaf of opt_state so the
        # host-side plateau scheduler can rewrite it without recompiling.
        mask = self._update_mask

        def make_adam(learning_rate):
            inner = optax.adam(learning_rate)
            return optax.masked(inner, mask) if mask is not None else inner

        self.optimizer = optax.inject_hyperparams(make_adam)(
            learning_rate=self.tcfg.learning_rate)

        def loss_fn(params, batch, rng):
            # batch arrays are batch-major; transpose to the reference's
            # time-major model boundary inside jit (free under XLA).
            src = batch["P"].transpose(1, 0, 2)
            times = batch["time"].transpose(1, 0)
            lengths = jnp.sum(times > 0, axis=0)      # code/Raindrop.py:317
            logits, aux = self._apply(params, src, batch.get("static"),
                                      times, lengths, True, rng)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["y"]).mean()
            # aux objective (e.g. IP-Net reconstruction). The reference
            # EXCLUDES Raindrop's alpha-distance from the loss
            # (code/Raindrop.py:319-322) — weight defaults to 0.
            if self.tcfg.aux_loss_weight:
                ce = ce + self.tcfg.aux_loss_weight * jnp.sum(aux)
            return ce, (logits, aux)

        n_micro = self.tcfg.grad_microbatches

        def microbatched_grads(params, batch, rng):
            """Average gradients over n_micro chunks inside one lax.scan —
            numerically the full-batch gradient (mean of chunk means),
            but the [T, B/n, .] activation working set fits VMEM tiling
            at large B (see TrainConfig.grad_microbatches). Dead (masked)
            grads are carried as 0-d zeros so the accumulator never pays
            HBM traffic for parameters torch-Adam would skip.
            bench.py's microbatches branch mirrors this math (without the
            logits stacking) — keep the two in step."""
            def split(leaf):
                # validate against the ACTUAL batch rows: strategy-2
                # balanced batches hold 2*(batch_size//2) samples, not
                # batch_size (data/sampler.py), so checking the config
                # value would pass and then fail inside the reshape
                if leaf.shape[0] % n_micro:
                    raise ValueError(
                        f"batch of {leaf.shape[0]} rows not divisible by "
                        f"grad_microbatches={n_micro} (strategy-2 batches "
                        f"hold 2*(batch_size//2) samples)")
                return leaf.reshape((n_micro, leaf.shape[0] // n_micro)
                                    + leaf.shape[1:])

            mb = {k: split(v) for k, v in batch.items()}
            rngs = jax.random.split(rng, n_micro)

            def prune(g):
                if mask is None:
                    return g
                return jax.tree.map(
                    lambda m, x: x if m else jnp.zeros((), x.dtype),
                    mask, g)

            def body(carry, inp):
                gacc, lacc = carry
                chunk, r = inp
                (l, (lg, _)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, chunk, r)
                return (jax.tree.map(jnp.add, gacc, prune(g)),
                        lacc + l), lg

            g0 = prune(jax.tree.map(
                lambda x: jnp.zeros(jnp.shape(x),
                                    jnp.result_type(x, jnp.float32)),
                params))
            (gacc, lsum), logits = jax.lax.scan(
                body, (g0, jnp.float32(0.0)), (mb, rngs))
            if mask is None:
                grads = jax.tree.map(
                    lambda g, x: (g / n_micro).astype(x.dtype), gacc, params)
            else:
                grads = jax.tree.map(
                    lambda m, g, x: ((g / n_micro).astype(x.dtype)
                                     if m else jnp.zeros_like(x)),
                    mask, gacc, params)
            return lsum / n_micro, logits.reshape(
                (-1,) + logits.shape[2:]), grads

        def train_step(params, opt_state, batch, rng):
            if n_micro > 1:
                loss, logits, grads = microbatched_grads(params, batch, rng)
            else:
                (loss, (logits, _)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, rng)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = apply_updates_masked(params, updates, mask)
            return params, opt_state, loss, logits

        def train_epoch(params, opt_state, data, idx, keys):
            """One epoch as a single lax.scan — one device dispatch instead
            of n_batches. Per-step host dispatch costs ~1.7 ms at Raindrop's
            small shapes (measured: 2.78 ms/step dispatched vs 1.06 ms/step
            scanned on v5e), so this is ~2.6x on the real hot loop. Batches
            are gathered ON DEVICE from the resident split (idx [K, B]) —
            zero per-step H2D traffic.
            """
            def body(carry, xs):
                params, opt_state = carry
                ib, key = xs
                batch = {"P": data["P"][ib], "time": data["time"][ib],
                         "y": data["y"][ib]}
                if "static" in data:
                    batch["static"] = data["static"][ib]
                params, opt_state, loss, logits = train_step(
                    params, opt_state, batch, key)
                return (params, opt_state), (loss, logits)

            (params, opt_state), (losses, logits) = jax.lax.scan(
                body, (params, opt_state), (idx, keys))
            return params, opt_state, losses, logits[-1]

        def eval_step(params, batch):
            src = batch["P"].transpose(1, 0, 2)
            times = batch["time"].transpose(1, 0)
            lengths = jnp.sum(times > 0, axis=0)
            logits, _ = self._apply(params, src, batch.get("static"),
                                    times, lengths, False, None)
            return logits

        donate = (0, 1)
        if self.mesh is not None:
            from raindrop_tpu.parallel.mesh import shard_batch_spec
            from jax.sharding import NamedSharding

            data = NamedSharding(self.mesh, shard_batch_spec())
            self._batch_sharding = data
            # Params enter replicated (model=1) or Megatron-sharded over the
            # 'model' axis (parallel.mesh.shard_params); their output
            # shardings are inherited from the inputs so the same compiled
            # step serves DP and DP+TP meshes. Gradient psum over 'data' and
            # the TP all-reduces are inserted by XLA (GSPMD).
            self._train_step = jax.jit(train_step, donate_argnums=donate)
            self._eval_step = jax.jit(eval_step, out_shardings=data)
        else:
            self._batch_sharding = None
            self._train_step = jax.jit(train_step, donate_argnums=donate)
            self._eval_step = jax.jit(eval_step)
        self._train_epoch = jax.jit(train_epoch, donate_argnums=donate)

    # ---- data movement -------------------------------------------------
    @property
    def _multihost(self) -> bool:
        """Multi-host regime: every process holds the full split in host
        RAM (SURVEY.md §7; these datasets are <=12k samples) and assembles
        only ITS slice of each global batch
        (parallel/multihost.py: sampler shards + process-local arrays)."""
        return self.mesh is not None and jax.process_count() > 1

    def _device_batch(self, P, time, static, y=None, *, idx=None):
        """Build a device batch. idx: the GLOBAL batch sample indices (the
        arrays passed are the full split) — on multi-host runs each process
        slices only its disjoint portion and the global sharded array is
        stitched with make_array_from_process_local_data; single-host
        slices everything and device_puts (sharded when a mesh is set)."""
        if idx is not None and self._multihost:
            from raindrop_tpu.parallel.multihost import (
                global_batch, local_batch_indices)
            li = local_batch_indices(np.asarray(idx), jax.process_index(),
                                     jax.process_count())
            local = {"P": P[li], "time": time[li]}
            if static is not None:
                local["static"] = static[li]
            if y is not None:
                local["y"] = y[li]
            return global_batch(self.mesh, local)
        if idx is not None:
            P, time = P[idx], time[idx]
            static = None if static is None else static[idx]
            y = None if y is None else y[idx]
        batch = {"P": jnp.asarray(P), "time": jnp.asarray(time)}
        if static is not None:
            batch["static"] = jnp.asarray(static)
        if y is not None:
            batch["y"] = jnp.asarray(y)
        if self._batch_sharding is not None:
            batch = jax.device_put(batch, self._batch_sharding)
        return batch

    # ---- evaluation ----------------------------------------------------
    def predict(self, params, P, time, static, batch_size: int = 100) -> np.ndarray:
        """Chunked inference with a padded tail (static shapes, 2 compiles max).

        Reference equivalent: utils_rd.evaluate (code/utils_rd.py:276-307).
        (Its tail chunk slices statics with start:start+batch_size, which
        clamps to the same rem rows — same results.)
        """
        N = P.shape[0]
        if self.mesh is not None:
            n_dev = int(np.prod(self.mesh.devices.shape))
            batch_size = max(batch_size // n_dev * n_dev, n_dev)
        out = np.zeros((N, self.cfg.n_classes), np.float32)
        for start in range(0, N, batch_size):
            end = min(start + batch_size, N)
            n = end - start
            # pad the tail with repeats of the last row: static shapes, and
            # _device_batch shards by index on multi-host runs
            idxb = np.concatenate(
                [np.arange(start, end),
                 np.full(batch_size - n, end - 1, np.int64)])
            logits = self._eval_step(
                params, self._device_batch(P, time, static, idx=idxb))
            if self._multihost:
                # logits are globally sharded across hosts; gather the full
                # array to every host for the (host-side, sklearn) metrics
                from jax.experimental import multihost_utils
                lg = np.asarray(
                    multihost_utils.process_allgather(logits, tiled=True))
            else:
                lg = np.asarray(jax.device_get(logits))
            out[start:end] = lg[:n]
        return out

    # ---- the full per-split protocol ------------------------------------
    def train_split(self, split: Split, *, seed: Optional[int] = None,
                    log_file=None, checkpoint_path: Optional[str] = None,
                    resume_from: Optional[str] = None,
                    verbose: bool = True,
                    on_epoch_end=None, tracker=None) -> TrainResult:
        """Run the full per-split protocol.

        checkpoint_path: best-val-AUROC params go to <path>.npz (like the
        reference, code/Raindrop.py:374) and the FULL training state
        (params + opt state + scheduler + RNG states + epoch) goes to
        <path>_last.npz each epoch — something the reference cannot do
        (no mid-run resume, SURVEY.md §5.4). resume_from: a _last path to
        continue from exactly.

        on_epoch_end: optional callable(epoch, record_dict) invoked after
        the epoch's checkpoint is durable — the hook point for heartbeats
        and fault injection (parallel/elastic.py).

        tracker: optional RunTracker (utils/tracking.py) — the W&B-style
        sink: log_epoch(record) fires for every epoch record; sink
        exceptions are swallowed (telemetry must not kill the run).
        """
        from raindrop_tpu.utils.tracking import _SafeTracker
        if not isinstance(tracker, _SafeTracker):
            tracker = _SafeTracker(tracker)
        cfg, tcfg = self.cfg, self.tcfg
        # Multi-host: diagnostics PRINT once per pod, but `verbose` itself
        # must stay identical on every process — verbose-guarded blocks
        # contain collectives (the confusion-matrix process_allgather
        # below), and a per-process verbose would make only process 0
        # enter them, deadlocking the pod. `show` gates prints only.
        show = verbose and (not self._multihost or jax.process_index() == 0)
        if self._multihost and not checkpoint_path:
            # best-val params can only be tracked via per-host shard files
            # on multi-host runs (device_get of sharded params is not
            # possible); refuse loudly instead of silently testing on
            # final-epoch params
            raise ValueError(
                "multi-host training requires checkpoint_path (best-val "
                "params are persisted as per-host shards; see "
                "parallel/multihost.py)")
        seed = tcfg.seed if seed is None else seed
        rng_np = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        key, init_key = jax.random.split(key)

        params = self._init(init_key)
        if self._batch_sharding is not None:
            from raindrop_tpu.parallel.mesh import shard_params
            params = shard_params(self.mesh, params)
        opt_state = self.optimizer.init(params)
        scheduler = ReduceLROnPlateau(
            tcfg.learning_rate, factor=tcfg.plateau_factor,
            patience=tcfg.plateau_patience, threshold=tcfg.plateau_threshold,
            min_lr=tcfg.plateau_min_lr)

        strategy = tcfg.batching_strategy
        n_batches = n_batches_per_epoch(
            split.ytrain, tcfg.batch_size, strategy, tcfg.n_batches_strategy3)

        best = {"auroc": 0.0, "auprc": 0.0, "params": None}
        history: List[Dict[str, Any]] = []
        n_samples_done = 0
        start_epoch = 0

        if resume_from is not None:
            from raindrop_tpu.train.checkpoint import load_checkpoint
            params, opt_state, meta = load_checkpoint(
                resume_from, params, opt_state)
            scheduler.load_state_dict(meta["scheduler"])
            rng_np.bit_generator.state = meta["np_rng_state"]
            key = jnp.asarray(np.asarray(meta["jax_key"], np.uint32))
            start_epoch = meta["epoch"] + 1
            best.update(auroc=meta["best_auroc"], auprc=meta["best_auprc"])
            history = meta.get("history", [])
            # restore the best-val params too (they live next to the _last
            # file): otherwise a resumed run whose remaining epochs never
            # beat the restored AUROC would silently test on the FINAL
            # params instead of the best-by-val-AUROC protocol
            if resume_from.endswith("_last"):
                best_path = resume_from[: -len("_last")]
                if os.path.exists(best_path + ".npz"):
                    bp, _, _ = load_checkpoint(best_path, params)
                    best["params"] = jax.device_get(bp)

        t0 = time.time()
        params_snapshot = (jax.device_get(params)
                           if tcfg.diag_frozen_params else None)

        # opt-in production MFU telemetry (tcfg.measure_mfu): model FLOPs
        # of one train step from XLA's compiled cost analysis, measured
        # once; epoch records then carry achieved TFLOP/s and MFU.
        step_flops, _mfu_fn, last_elapsed = None, None, 0.0
        if tcfg.measure_mfu:
            from raindrop_tpu.utils.diagnostics import compiled_flops
            from raindrop_tpu.utils.diagnostics import mfu as _mfu_fn
            Bsz = tcfg.batch_size
            aval = {"P": jax.ShapeDtypeStruct(
                        (Bsz,) + split.Ptrain.shape[1:], jnp.float32),
                    "time": jax.ShapeDtypeStruct(
                        (Bsz,) + split.Ptrain_time.shape[1:], jnp.float32),
                    "y": jax.ShapeDtypeStruct((Bsz,), jnp.int32)}
            if split.Ptrain_static is not None:
                aval["static"] = jax.ShapeDtypeStruct(
                    (Bsz,) + split.Ptrain_static.shape[1:], jnp.float32)
            step_flops = compiled_flops(
                self._train_step, params, opt_state, aval,
                jax.random.PRNGKey(0))
            if (step_flops is not None and self._is_default_model
                    and tcfg.context_parallel == "none"
                    and tcfg.pipeline_microbatches == 0):
                # cost analysis reports Pallas custom calls as zero flops;
                # credit the kernelized flash/fused-layer matmuls
                # analytically — ONLY when the flagship model actually
                # launches them (baselines have no temporal transformer;
                # the cp/pipeline routes run attention as XLA einsums that
                # the cost analysis already counts)
                from raindrop_tpu.utils.diagnostics import (
                    flagship_kernel_flops)
                step_flops += flagship_kernel_flops(cfg, Bsz, train=True)
        epoch_steps = n_batches

        # Single-device fast path: keep the split resident on device and run
        # each epoch as ONE scanned dispatch (see train_epoch in _build).
        # Sharded meshes keep the per-step path (per-batch device_put with
        # NamedSharding).
        if tcfg.input_pipeline not in ("resident", "streaming"):
            raise ValueError(
                f"unknown input_pipeline {tcfg.input_pipeline!r} "
                "(expected 'resident' or 'streaming')")
        streaming = tcfg.input_pipeline == "streaming"
        if streaming and self._multihost:
            raise ValueError(
                "input_pipeline='streaming' is single-host; multi-host runs "
                "assemble per-process slices (parallel/multihost.py)")
        use_scan = self.mesh is None and tcfg.scan_epoch and not streaming
        if use_scan:
            train_dev = {"P": jnp.asarray(split.Ptrain),
                         "time": jnp.asarray(split.Ptrain_time),
                         "y": jnp.asarray(split.ytrain)}
            if split.Ptrain_static is not None:
                train_dev["static"] = jnp.asarray(split.Ptrain_static)

        for epoch in range(start_epoch, tcfg.num_epochs):
            if use_scan:
                idx = np.stack(list(balanced_batches(
                    split.ytrain, tcfg.batch_size, strategy, rng_np,
                    n_batches=n_batches)))
                key, ek = jax.random.split(key)
                params, opt_state, losses, logits = self._train_epoch(
                    params, opt_state, train_dev, jnp.asarray(idx),
                    jax.random.split(ek, idx.shape[0]))
                loss = losses[-1]
                last_idx = idx[-1]
                n_samples_done += idx.size
            elif streaming:
                # Streaming regime (SURVEY.md §2.8): host-thread batch
                # assembly + producer-side device_put double buffering
                # (data/prefetch.py). Same sampler stream and train step as
                # the resident paths => identical results (tested,
                # tests/test_prefetch.py).
                from raindrop_tpu.data.prefetch import PrefetchExecutor

                idx_list = [np.asarray(i) for i in balanced_batches(
                    split.ytrain, tcfg.batch_size, strategy, rng_np,
                    n_batches=n_batches)]
                host = {"P": split.Ptrain, "time": split.Ptrain_time,
                        "y": np.asarray(split.ytrain)}
                if split.Ptrain_static is not None:
                    host["static"] = split.Ptrain_static
                put = (jax.device_put if self._batch_sharding is None else
                       (lambda b: jax.device_put(b, self._batch_sharding)))
                with PrefetchExecutor(host, idx_list,
                                      depth=tcfg.prefetch_depth,
                                      to_device=put) as ex:
                    for idx, batch in zip(idx_list, ex):
                        key, step_key = jax.random.split(key)
                        params, opt_state, loss, logits = self._train_step(
                            params, opt_state, batch, step_key)
                        n_samples_done += len(idx)
                last_idx = idx_list[-1]
            else:
                # every process draws the SAME seeded global index stream;
                # _device_batch shards it per process on multi-host runs
                for idx in balanced_batches(split.ytrain, tcfg.batch_size,
                                            strategy, rng_np,
                                            n_batches=n_batches):
                    key, step_key = jax.random.split(key)
                    batch = self._device_batch(
                        split.Ptrain, split.Ptrain_time,
                        split.Ptrain_static, split.ytrain, idx=idx)
                    params, opt_state, loss, logits = self._train_step(
                        params, opt_state, batch, step_key)
                    n_samples_done += len(idx)
                last_idx = idx

            # last-batch train confusion matrix at the first/last epoch —
            # the reference's in-training sanity print with its hard-coded
            # labels=[0, 1] (code/Raindrop.py:341-342)
            if verbose and epoch in (start_epoch, tcfg.num_epochs - 1):
                from raindrop_tpu.train.metrics import confusion_matrix_np
                if self._multihost:
                    # train-step logits span non-addressable devices;
                    # gather like predict() does
                    from jax.experimental import multihost_utils
                    lg = np.asarray(
                        multihost_utils.process_allgather(logits, tiled=True))
                else:
                    lg = np.asarray(jax.device_get(logits))
                if show:
                    print(confusion_matrix_np(split.ytrain[last_idx],
                                              np.argmax(lg, 1),
                                              labels=[0, 1]))

            # frozen-parameter diff after the first epoch (the reference
            # GRU-D driver's 'Not updated in <name>' diagnostic,
            # code/baselines/GRU-D_baseline.py:355-363)
            if params_snapshot is not None and epoch == start_epoch:
                from raindrop_tpu.utils.diagnostics import frozen_param_report
                for name in frozen_param_report(params_snapshot, params):
                    print(f"Not updated in {name}")
                params_snapshot = None

            # --- validation (every epoch, reference code/Raindrop.py:344-374)
            val_logits = self.predict(params, split.Pval, split.Pval_time,
                                      split.Pval_static)
            val = classification_metrics(val_logits, split.yval, cfg.n_classes,
                                         prob_mode="sigmoid")
            new_lr = scheduler.step(val["auprc"])
            opt_state.hyperparams["learning_rate"] = jnp.asarray(
                new_lr, dtype=opt_state.hyperparams["learning_rate"].dtype)

            rec = {"epoch": epoch, "train_loss": float(loss),
                   "val_auroc": val["auroc"], "val_auprc": val["auprc"],
                   "lr": new_lr, "elapsed_s": time.time() - t0}
            if step_flops and rec["elapsed_s"] > last_elapsed:
                # achieved model FLOP/s this epoch (tcfg.measure_mfu)
                flops_per_sec = (step_flops * epoch_steps
                                 / (rec["elapsed_s"] - last_elapsed))
                rec["train_tflops_per_sec"] = flops_per_sec / 1e12
                rec["mfu"] = _mfu_fn(flops_per_sec)
            last_elapsed = rec["elapsed_s"]
            history.append(rec)
            tracker.log_epoch(rec)
            if log_file:
                log_file.write(json.dumps(rec) + "\n")
                log_file.flush()
            if show:
                print(f"epoch {epoch}: loss={rec['train_loss']:.4f} "
                      f"val_auroc={val['auroc']*100:.2f} "
                      f"val_auprc={val['auprc']*100:.2f} lr={new_lr:.2e}")

            # best checkpoint keyed on AUROC (code/Raindrop.py:369-374)
            if val["auroc"] > best["auroc"]:
                if self._multihost:
                    # params may be sharded across hosts: each process
                    # persists its own shards (parallel/multihost.py);
                    # test-time reload happens below
                    best.update(auroc=val["auroc"], auprc=val["auprc"],
                                params="__sharded__")
                    if checkpoint_path:
                        from raindrop_tpu.parallel.multihost import (
                            save_sharded_checkpoint)
                        save_sharded_checkpoint(checkpoint_path, params)
                else:
                    best.update(auroc=val["auroc"], auprc=val["auprc"],
                                params=jax.device_get(params))
                    if checkpoint_path:
                        save_checkpoint(checkpoint_path, params,
                                        meta={"epoch": epoch, "val": val,
                                              "config": dataclasses.asdict(cfg)})
            if checkpoint_path and not self._multihost:
                # full resumable state, every epoch (multi-host runs keep
                # per-host best-param shards above; full multi-host resume
                # state = those shards + process-0 meta)
                save_checkpoint(
                    checkpoint_path + "_last", params, opt_state,
                    meta={"epoch": epoch,
                          "scheduler": scheduler.state_dict(),
                          "np_rng_state": rng_np.bit_generator.state,
                          "jax_key": np.asarray(key).tolist(),
                          "best_auroc": best["auroc"],
                          "best_auprc": best["auprc"],
                          "history": history})
            if on_epoch_end is not None:
                on_epoch_end(epoch, rec)

        elapsed = time.time() - t0
        # --- test with the best params, softmax path (code/Raindrop.py:380-406)
        if best["params"] == "__sharded__" and checkpoint_path:
            from raindrop_tpu.parallel.multihost import (
                load_sharded_checkpoint)
            from raindrop_tpu.parallel.mesh import shard_params
            host = load_sharded_checkpoint(
                checkpoint_path, like=jax.tree.map(lambda x: x, params))
            test_params = shard_params(self.mesh, host)
        elif best["params"] is not None and best["params"] != "__sharded__":
            test_params = best["params"]
        else:
            test_params = params
        test_logits = self.predict(test_params, split.Ptest, split.Ptest_time,
                                   split.Ptest_static)
        test = classification_metrics(test_logits, split.ytest, cfg.n_classes,
                                      prob_mode="softmax")
        # test-time diagnostics (code/Raindrop.py:405-406): per-class
        # report + confusion matrix over all classes
        from raindrop_tpu.train.metrics import (
            classification_report_str, confusion_matrix_np)
        ypred = np.argmax(test_logits, axis=1)
        confusion = confusion_matrix_np(split.ytest, ypred,
                                        labels=range(cfg.n_classes))
        report = classification_report_str(split.ytest, ypred)
        if show:
            print("classification report\n" + report)
            print(confusion)
        return TrainResult(
            test_metrics=test, best_val_auroc=best["auroc"],
            best_val_auprc=best["auprc"], history=history,
            samples_per_sec=n_samples_done / max(elapsed, 1e-9),
            params=test_params, test_confusion=confusion, test_report=report)


def run_splits(make_split, cfg: RaindropConfig, tcfg: TrainConfig, *,
               mesh=None, verbose: bool = True,
               resume_from: Optional[str] = None,
               tracker=None) -> Dict[str, Any]:
    """The 5-split x n_runs protocol with the reference's aggregation:
    best run per split by AUPRC, then mean±std over splits
    (reference code/Raindrop.py:417-446).

    make_split: callable split_idx (1-based) -> Split. With
    tcfg.resplit_per_run (the mTAND protocol,
    code/baselines/mTAND/mTAND_baseline.py:72-88) it is instead called as
    make_split(split_idx, run=m) for every run, and must re-randomize the
    partition per run.
    """
    from raindrop_tpu.utils.tracking import _SafeTracker
    tracker = _SafeTracker(tracker)
    tracker.start({"dataset": tcfg.dataset,
                   "model_config": dict(vars(cfg)),
                   "train_config": dict(vars(tcfg))})
    trainer = Trainer(cfg, tcfg, mesh=mesh)
    log_file = open(tcfg.log_path, "a") if tcfg.log_path else None
    per_split: List[Dict[str, float]] = []
    try:
        for k in range(1, tcfg.n_splits + 1):
            split = None if tcfg.resplit_per_run else make_split(k)
            runs = []
            for m in range(tcfg.n_runs):
                if verbose:
                    print(f"--- split {k} run {m + 1} ---")
                split_m = (make_split(k, run=m) if tcfg.resplit_per_run
                           else split)
                ckpt = os.path.join(tcfg.checkpoint_dir,
                                    f"raindrop_{tcfg.dataset}_s{k}_r{m}")
                res = trainer.train_split(
                    split_m, seed=tcfg.seed + m, log_file=log_file,
                    checkpoint_path=ckpt, verbose=verbose,
                    resume_from=(resume_from if k == 1 and m == 0 else None),
                    tracker=tracker)
                runs.append(res)
            best_run = max(runs, key=lambda r: r.test_metrics["auprc"])
            per_split.append(best_run.test_metrics)
    finally:
        if log_file:
            log_file.close()

    summary = {}
    for name in per_split[0]:
        vals = np.array([m[name] for m in per_split]) * 100.0
        summary[name] = {"mean": float(vals.mean()), "std": float(vals.std()),
                         "per_split": vals.tolist()}
    if verbose:
        for name, s in summary.items():
            print(f"{name:>9} = {s['mean']:.1f} +/- {s['std']:.1f}")
    tracker.finish(summary)
    return {"summary": summary, "per_split": per_split}
