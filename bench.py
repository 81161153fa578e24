"""Benchmark: flagship Raindrop training-step throughput on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measures steady-state jit train-step throughput (forward+backward+Adam) on
the P19 flagship configuration (34 sensors, T=60, batch 128 — the published
dimensioning, reference code/Raindrop.py:109-148) and derives edges/s
(B * F^2 edges * 2 propagation layers per step — the reference's hot kernel,
SURVEY.md §3.3).

vs_baseline = our eval-forward samples/s divided by the reference
architecture's eval forward measured on this image (pure-torch
transcription, CPU — the only hardware torch has here; re-measure with
bench_torch_reference()). Same math, same batch; hardware differs, so read
it as the end-to-end system speedup, not a kernel comparison.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

# Reference-architecture throughput measured on this image: the pure-torch
# transcription of Raindrop_v2 (tests/torch_raindrop.py — per-sample Python
# loop + torch.nn.TransformerEncoder, eval forward) on CPU, the only
# hardware torch has here: P19 config, B=128 -> 207.7 samples/s
# (616 ms/batch). vs_baseline compares our EVAL forward against it.
BASELINE_TORCH_SAMPLES_PER_SEC = 207.7


def _log(msg):
    print(f"# bench {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
          flush=True)


def _enable_compile_cache():
    """Persistent XLA compilation cache: tunnel compiles vary from seconds
    to >10 min for identical programs, so cache them across bench runs."""
    from raindrop_tpu.utils.diagnostics import enable_persistent_compile_cache

    enable_persistent_compile_cache()


def bench_train_step(dataset="P19", batch_size=128, iters=20, warmup=3,
                     compute_dtype=None, deadline=None,
                     measure=("scan", "eval", "dispatched"),
                     cfg_overrides=None, flops_accounting=True,
                     progress_json=False, microbatches=1):
    """deadline: optional time.time() timestamp — optional measurements
    (dispatched single-step, eval) are skipped once it passes, so one slow
    tunnel compile can't blow the whole bench run. measure: which regimes
    to time ('scan' always runs; 'eval'/'dispatched' are opt-in so the
    driver can order independent measurements across subprocesses).
    flops_accounting: derive model FLOPs of the per-step program from XLA's
    compiled cost analysis and report achieved TFLOP/s + MFU vs the v5e
    197 TFLOP/s MXU peak (utils/diagnostics.compiled_flops)."""
    import jax
    import jax.numpy as jnp
    import optax
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.models.raindrop import (
        raindrop_apply, raindrop_init, raindrop_param_mask)

    cfg = dataset_config(dataset, compute_dtype=compute_dtype,
                         **(cfg_overrides or {}))
    B, T, F = batch_size, cfg.max_len, cfg.d_inp
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(B, T, F)) > 0.6).astype(np.float32)
    P = jnp.asarray(np.concatenate(
        [rng.normal(size=(B, T, F)).astype(np.float32) * mask, mask], -1))
    times = jnp.asarray(np.cumsum(
        rng.uniform(0.1, 1.0, size=(B, T)), 1).astype(np.float32))
    static = (jnp.asarray(rng.normal(size=(B, cfg.d_static)).astype(np.float32))
              if cfg.static else None)
    y = jnp.asarray(rng.integers(0, cfg.n_classes, size=(B,)))

    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    # The PRODUCTION optimizer (train/trainer.py:91-93): Adam masked to the
    # live parameter set — torch Adam never touches params whose grad stays
    # None (DEVIATIONS.md #10), and the dead set is large (P19: ~1.5M of
    # 2.8M; PAM: 138.4M of 150.0M — increase_dim alone is 2x46M there).
    # Benching unmasked Adam would charge the step for moment/update HBM
    # traffic on dead weights that no real run (ours or the reference's)
    # ever pays: measured 17.4 -> 12.2 ms on the PAM config.
    param_mask = raindrop_param_mask(cfg)
    opt = optax.masked(optax.adam(1e-4), param_mask)
    opt_state = opt.init(params)
    # dead leaves pass through as identity (aliased with the donated
    # input) — adding even a zero update forces a relayout copy of the
    # dead 184 MB increase_dim weights at PAM dims (train/trainer.py:
    # apply_updates_masked)
    from raindrop_tpu.train.trainer import apply_updates_masked

    def chunk_loss(p, Pc, tc, sc, yc, key):
        src = Pc.transpose(1, 0, 2)
        tm = tc.transpose(1, 0)
        lengths = jnp.sum(tm > 0, axis=0)
        logits, _ = raindrop_apply(p, cfg, src, sc, tm, lengths,
                                   train=True, rng=key)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yc).mean()

    def one_step(params, opt_state, key):
        if microbatches <= 1:
            loss, grads = jax.value_and_grad(chunk_loss)(
                params, P, times, static, y, key)
        else:
            # gradient accumulation (TrainConfig.grad_microbatches): the
            # full-batch update from VMEM-sized chunks — restores flat
            # scaling past B~1024/chip (docs/PERFORMANCE.md round 5).
            # NOTE: mirrors train/trainer.py microbatched_grads (which
            # also stacks per-chunk logits for metrics) — keep the two in
            # step if the masking/averaging math changes
            m = microbatches
            C = B // m
            def split(a):
                return a.reshape((m, C) + a.shape[1:])
            Pm, tmm, ym = split(P), split(times), split(y)
            sm = None if static is None else split(static)

            def prune(g):
                return jax.tree.map(
                    lambda mk, x: x if mk else jnp.zeros((), x.dtype),
                    param_mask, g)

            def body(carry, inp):
                gacc, lacc = carry
                if static is None:
                    Pc, tc, yc, kc = inp
                    sc = None
                else:
                    Pc, tc, yc, sc, kc = inp
                l, g = jax.value_and_grad(chunk_loss)(
                    params, Pc, tc, sc, yc, kc)
                return (jax.tree.map(jnp.add, gacc, prune(g)),
                        lacc + l), None

            keys = jax.random.split(key, m)
            g0 = prune(jax.tree.map(
                lambda x: jnp.zeros(x.shape, jnp.float32), params))
            xs = ((Pm, tmm, ym, keys) if static is None
                  else (Pm, tmm, ym, sm, keys))
            (gacc, lsum), _ = jax.lax.scan(body, (g0, jnp.float32(0)), xs)
            grads = jax.tree.map(
                lambda mk, g, x: ((g / m).astype(x.dtype)
                                  if mk else jnp.zeros_like(x)),
                param_mask, gacc, params)
            loss = lsum / m
        updates, opt_state = opt.update(grads, opt_state)
        return (apply_updates_masked(params, updates, param_mask),
                opt_state, loss)

    step = jax.jit(one_step, donate_argnums=(0, 1))

    # The Trainer's production path: a whole chunk of steps in ONE scanned
    # dispatch (train/trainer.py train_epoch). Dispatch overhead is ~1.7 ms
    # per step at these shapes, so this is the honest steady-state number.
    @partial(jax.jit, donate_argnums=(0, 1))
    def step_scan(params, opt_state, key):
        def body(carry, k):
            p, o = carry
            p, o, loss = one_step(p, o, k)
            return (p, o), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, iters))
        return params, opt_state, losses[-1]

    @jax.jit
    def eval_step(params):
        src = P.transpose(1, 0, 2)
        tm = times.transpose(1, 0)
        lengths = jnp.sum(tm > 0, axis=0)
        logits, _ = raindrop_apply(params, cfg, src, static, tm, lengths)
        return logits

    # Steady-state eval: `iters` forwards in ONE dispatch (the serving
    # tier's AOT/batched regime) — per-step dispatch would otherwise
    # dominate at ~1 ms compute per batch. The carry feeds back into the
    # input (x + acc*1e-38) so the loop body is NOT loop-invariant and XLA
    # cannot hoist the forward out of the scan.
    @jax.jit
    def eval_scan(params):
        src0 = P.transpose(1, 0, 2)
        tm = times.transpose(1, 0)
        lengths = jnp.sum(tm > 0, axis=0)

        def body(acc, _):
            logits, _d = raindrop_apply(
                params, cfg, src0 + acc * 1e-38, static, tm, lengths)
            return logits.mean(), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return total

    def time_left():
        return deadline is None or time.time() < deadline

    out = {
        "samples_per_sec": None,
        "eval_samples_per_sec": None,
        "edges_per_sec": None,
        "step_ms": None,
        "dispatched_step_ms": None,
        "backend": jax.default_backend(),
    }
    key = jax.random.PRNGKey(0)
    if "scan" in measure:
        # headline — the scanned production path (1 compile), warmup via
        # the first two calls, then `rounds` timed calls of `iters` steps
        _log(f"compiling scanned train step (B={batch_size}, "
             f"dtype={compute_dtype or 'float32'})")
        for _ in range(2):
            key, k = jax.random.split(key)
            params, opt_state, loss = step_scan(params, opt_state, k)
        jax.block_until_ready(loss)
        _log("train scan compiled; measuring")
        # 8 rounds of `iters` scanned steps (~170 ms) — long enough that
        # per-dispatch tunnel jitter stays <1% of the window
        rounds = 8
        t0 = time.perf_counter()
        for _ in range(rounds):
            key, k = jax.random.split(key)
            params, opt_state, loss = step_scan(params, opt_state, k)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / rounds

        samples_per_sec = iters / dt * B
        out["samples_per_sec"] = samples_per_sec
        out["edges_per_sec"] = samples_per_sec * F * F * 2  # 2 prop layers
        out["step_ms"] = 1000.0 * dt / iters
        out["loss"] = float(loss)
        if progress_json:
            # early partial line for the parent: if a later (flops/eval)
            # compile outlives the subprocess budget, the measurement
            # already made it out (the parent merges all JSON lines,
            # including partial stdout of a timed-out child)
            print(json.dumps({"samples_per_sec": samples_per_sec}),
                  flush=True)

    if "eval" in measure and time_left():
        _log("compiling scanned eval")
        jax.block_until_ready(eval_scan(params))
        eval_rounds = 8
        t1 = time.perf_counter()
        for _ in range(eval_rounds):
            total = eval_scan(params)
        jax.block_until_ready(total)
        out["eval_samples_per_sec"] = (
            eval_rounds * iters * B / (time.perf_counter() - t1))

    if "dispatched" in measure and time_left():
        _log("compiling dispatched single step")
        for _ in range(warmup):
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, k)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, k)
        jax.block_until_ready(loss)
        out["dispatched_step_ms"] = 1000.0 * (time.perf_counter() - t0) / iters

    if flops_accounting:
        # Model-FLOPs accounting AFTER the timings (its lower+compile of the
        # unscanned per-step program must not contend with measurement; the
        # persistent cache makes it near-free on warm runs). ShapeDtypeStruct
        # lowering only — never touches the donated buffers.
        from raindrop_tpu.utils.diagnostics import (
            compiled_flops, flagship_kernel_flops, mfu)
        if out.get("samples_per_sec"):
            _log("cost analysis: train step")
            tf = compiled_flops(step, params, opt_state, key)
            if tf:
                # cost analysis reports Pallas custom calls as ZERO flops;
                # add the kernelized layer's theoretical flops (qkv +
                # attention + out-proj + FFN) when the fused regime is
                # active — reported separately for auditability
                kf = flagship_kernel_flops(cfg, B, train=True)
                tf += kf
                steps_per_sec = out["samples_per_sec"] / B
                out["train_gflops_per_step"] = tf / 1e9
                out["kernel_gflops_analytic"] = kf / 1e9
                out["train_tflops"] = tf * steps_per_sec / 1e12
                out["train_mfu"] = mfu(tf * steps_per_sec)
        if out.get("eval_samples_per_sec"):
            _log("cost analysis: eval forward")
            ef = compiled_flops(eval_step, params)
            if ef:
                ef += flagship_kernel_flops(cfg, B, train=False)
                batches_per_sec = out["eval_samples_per_sec"] / B
                out["eval_gflops_per_batch"] = ef / 1e9
                out["eval_tflops"] = ef * batches_per_sec / 1e12
                out["eval_mfu"] = mfu(ef * batches_per_sec)
    return out


def bench_serve(dataset="P19", n_single=100, batch=128):
    """Serving SLOs on the chip (serve.py's AOT bucket path): p50/p99
    single-request latency through the full predict() path (pad -> device
    -> AOT runner -> host) and saturated bucket-`batch` throughput."""
    import jax
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.models.raindrop import raindrop_init
    from raindrop_tpu.serve import InferenceServer

    cfg = dataset_config(dataset)
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    _log(f"serve: AOT-compiling buckets (1, {batch})")
    srv = InferenceServer(cfg, params, buckets=(1, batch), precompile=True)
    T, F = cfg.max_len, cfg.d_inp
    rng = np.random.default_rng(0)

    def mk(n):
        mask = (rng.uniform(size=(n, T, F)) > 0.6).astype(np.float32)
        P = np.concatenate(
            [rng.normal(size=(n, T, F)).astype(np.float32) * mask, mask], -1)
        tm = np.cumsum(rng.uniform(0.1, 1.0, size=(n, T)), 1).astype(np.float32)
        st = (rng.normal(size=(n, cfg.d_static)).astype(np.float32)
              if cfg.static else None)
        return P, tm, st

    P1, t1, s1 = mk(1)
    for _ in range(5):
        srv.predict(P1, t1, s1)
    lats = []
    for _ in range(n_single):
        t0 = time.perf_counter()
        srv.predict(P1, t1, s1)
        lats.append(1e3 * (time.perf_counter() - t0))
    Pb, tb, sb = mk(batch)
    srv.predict(Pb, tb, sb)  # warm the top bucket
    rounds = 20
    t0 = time.perf_counter()
    for _ in range(rounds):
        srv.predict(Pb, tb, sb)
    dt = time.perf_counter() - t0
    # pipelined streaming: keeps device launches + D2H fetch RTTs in
    # flight (predict_stream) — the saturated-throughput regime; the
    # sequential loop above pays one fetch round-trip per batch
    stream_rounds = 40
    t0 = time.perf_counter()
    for out in srv.predict_stream(((Pb, tb, sb)
                                   for _ in range(stream_rounds))):
        pass
    stream_dt = time.perf_counter() - t0
    # bf16 wire format: H2D bytes halve; the streaming regime is H2D-
    # bandwidth-bound on tunneled backends, so this is the throughput tier
    srv16 = InferenceServer(cfg, params, buckets=(batch,), precompile=True,
                            transfer_dtype="bfloat16")
    next(iter(srv16.predict_stream([(Pb, tb, sb)])))  # warm
    t0 = time.perf_counter()
    for out in srv16.predict_stream(((Pb, tb, sb)
                                     for _ in range(stream_rounds))):
        pass
    stream16_dt = time.perf_counter() - t0
    # saturated concurrency: many open-loop clients hammering the
    # micro-batching queue with small requests (each keeps `depth`
    # requests in flight via submit_async — the standard capacity-test
    # shape; strictly synchronous clients would serialize every round on
    # the readback RTT no matter how well the server coalesces). The
    # batcher coalesces into shared bucketed launches (launch count <<
    # request count) and pipelines launch/fetch across groups.
    import threading
    n_threads, per_thread, req_n, depth = 16, 12, 8, 4
    small_reqs = [mk(req_n) for _ in range(n_threads)]

    def hammer(server, i, barrier):
        barrier.wait()
        pending = []
        for _ in range(per_thread):
            pending.append(server.submit_async(*small_reqs[i]))
            if len(pending) >= depth:
                pending.pop(0).result()
        for f in pending:
            f.result()

    def run_hammer(server):
        server.submit(*small_reqs[0])   # warm batcher + small-bucket path
        launches0 = server.stats["batches"]
        barrier = threading.Barrier(n_threads)
        threads = [threading.Thread(target=hammer, args=(server, i, barrier))
                   for i in range(n_threads)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        return (time.perf_counter() - t0,
                server.stats["batches"] - launches0)

    conc_dt, conc_launches = run_hammer(srv)
    n_requests = n_threads * per_thread
    # same hammer over the bf16-wire server: half the H2D bytes per
    # coalesced launch — the throughput tier when the link is
    # bandwidth-bound
    conc16_dt, _ = run_hammer(srv16)
    return {"serve_p50_ms": float(np.percentile(lats, 50)),
            "serve_p99_ms": float(np.percentile(lats, 99)),
            "serve_b128_samples_per_sec": rounds * batch / dt,
            "serve_stream_samples_per_sec": stream_rounds * batch / stream_dt,
            "serve_stream_bf16_samples_per_sec":
                stream_rounds * batch / stream16_dt,
            "serve_concurrent_samples_per_sec":
                n_requests * req_n / conc_dt,
            "serve_concurrent_bf16_samples_per_sec":
                n_requests * req_n / conc16_dt,
            "serve_concurrent_coalesce_ratio":
                n_requests / max(conc_launches, 1)}


def bench_sparse(iters=30):
    """Sparse-topology crossover (VERDICT r4 #4): the Pallas one-hot-MXU
    kernels vs the XLA segment/gather formulations on kNN graphs
    (batch-shared topology, E = k*N) — the regime the kernels exist for.
    The shipped complete graphs stay dense-formulation territory
    (docs/PERFORMANCE.md); this measures where the claim 'Pallas for
    sparser topologies' actually holds, fwd+bwd (training shape)."""
    import jax
    import jax.numpy as jnp
    from raindrop_tpu.ops.segment import segment_softmax, segment_sum
    from raindrop_tpu.ops.sparse_pallas import sddmm, spmm_segment_softmax

    rng = np.random.default_rng(0)
    B, N, k, D = 128, 128, 6, 240
    E = N * k
    src = np.concatenate(
        [rng.choice(N, size=k, replace=False) for _ in range(N)])
    dst = np.repeat(np.arange(N), k)
    srcj = jnp.asarray(src.astype(np.int32))
    dstj = jnp.asarray(dst.astype(np.int32))
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))

    def xla_fn(x, gamma):
        def one(xb, gb):
            w = segment_softmax(gb, dstj, N)
            return segment_sum(xb[srcj] * w[:, None], dstj, N)
        return jax.vmap(one)(x, gamma)

    def pallas_fn(x, gamma):
        return spmm_segment_softmax(x, gamma, srcj, dstj, n_nodes=N)[0]

    np.testing.assert_allclose(np.asarray(pallas_fn(x, gamma)),
                               np.asarray(xla_fn(x, gamma)),
                               rtol=1e-4, atol=1e-4)

    def timed(fn):
        def loss(x, gamma):
            return jnp.sum(fn(x, gamma) ** 2)
        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        out = g(x, gamma)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(x, gamma)
        jax.block_until_ready(out)
        return 1e3 * (time.perf_counter() - t0) / iters

    xla_ms = timed(xla_fn)
    pallas_ms = timed(pallas_fn)

    # SDDMM (per-edge QK scores) vs XLA gathers, same topology
    Dq = 64
    q = jnp.asarray(rng.normal(size=(B, N, Dq)).astype(np.float32))
    kk = jnp.asarray(rng.normal(size=(B, N, Dq)).astype(np.float32))

    def sddmm_xla(q, kk):
        return jnp.sum(q[:, dstj] * kk[:, srcj], axis=-1) * 0.125

    def sddmm_pl(q, kk):
        return sddmm(q, kk, srcj, dstj, 0.125)

    np.testing.assert_allclose(np.asarray(sddmm_pl(q, kk)),
                               np.asarray(sddmm_xla(q, kk)),
                               rtol=1e-4, atol=1e-4)

    def timed2(fn):
        def loss(q, kk):
            return jnp.sum(fn(q, kk) ** 2)
        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        out = g(q, kk)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(q, kk)
        jax.block_until_ready(out)
        return 1e3 * (time.perf_counter() - t0) / iters

    return {"sparse_knn_xla_ms": xla_ms,
            "sparse_knn_pallas_ms": pallas_ms,
            "sparse_knn_pallas_speedup": xla_ms / pallas_ms,
            "sddmm_xla_ms": timed2(sddmm_xla),
            "sddmm_pallas_ms": timed2(sddmm_pl)}


def bench_torch_reference(dataset="P19", batch_size=128, iters=3):
    """Reference-architecture eval forward on torch CPU (the source of
    BASELINE_TORCH_SAMPLES_PER_SEC). Requires the tests/ package."""
    import jax
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.models.raindrop import raindrop_init
    from tests.torch_raindrop import raindrop_v2_torch

    cfg = dataset_config(dataset)
    params = jax.tree_util.tree_map(
        np.asarray, raindrop_init(jax.random.PRNGKey(0), cfg))
    B, T, F = batch_size, cfg.max_len, cfg.d_inp
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(T, B, F)) > 0.6).astype(np.float32)
    src = np.concatenate(
        [rng.normal(size=(T, B, F)).astype(np.float32) * mask, mask], -1)
    times = np.cumsum(rng.uniform(0.1, 0.5, size=(T, B)), 0).astype(np.float32)
    static = rng.normal(size=(B, cfg.d_static)).astype(np.float32)
    lengths = np.full((B,), T, np.int64)
    raindrop_v2_torch(params, cfg, src, static, times, lengths)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        raindrop_v2_torch(params, cfg, src, static, times, lengths)
    dt = (time.perf_counter() - t0) / iters
    return {"samples_per_sec": B / dt, "step_ms": 1000 * dt}


if __name__ == "__main__":
    _enable_compile_cache()
    # Subprocess modes: each optional measurement runs in its own bounded
    # subprocess — compile time is tunnel-dependent (seconds to >10 min
    # observed for identical programs), so the parent bounds each with a
    # timeout rather than letting one starve the headline JSON. All share
    # the persistent compile cache, so a warmed cache makes every mode
    # near-instant to compile.
    def _extra_json(r):
        return json.dumps({k: r[k] for k in
                           ("samples_per_sec", "train_gflops_per_step",
                            "train_tflops", "train_mfu") if r.get(k)})

    if "--big-only" in sys.argv:
        # large-batch bf16 mixed precision (MXU-native production ceiling)
        r = bench_train_step(batch_size=1024, compute_dtype="bfloat16",
                             deadline=0, measure=("scan",),
                             progress_json=True)
        print(_extra_json(r))
        sys.exit(0)
    if "--big2-only" in sys.argv:
        # B=2048 with gradient accumulation (grad_microbatches=2): the
        # large-batch falloff fix — plain B=2048 drops to ~137k samples/s
        # (VMEM spill); two 1024-sample microbatches restore the B=1024
        # rate while halving the activation working set
        r = bench_train_step(batch_size=2048, compute_dtype="bfloat16",
                             deadline=0, measure=("scan",), iters=10,
                             microbatches=2, flops_accounting=False,
                             progress_json=True)
        print(json.dumps({"samples_per_sec": r["samples_per_sec"]}))
        sys.exit(0)
    if "--dataset" in sys.argv:
        # per-dataset extras: PAM (T=600, 8-class, no static — exercises
        # the Pallas flash-attention path) and P12 (T=215, F=36 — the
        # largest T*F product).
        ds = sys.argv[sys.argv.index("--dataset") + 1]
        r = bench_train_step(dataset=ds, deadline=0, measure=("scan",),
                             progress_json=True)
        print(_extra_json(r))
        sys.exit(0)
    if "--dispatched-only" in sys.argv:
        # per-step dispatch overhead regime (one jit call per step)
        r = bench_train_step(deadline=None, measure=("dispatched",),
                             flops_accounting=False)
        print(json.dumps({"dispatched_step_ms": r["dispatched_step_ms"]}))
        sys.exit(0)
    if "--pallas-prop-only" in sys.argv:
        # prop_backend='pallas': the fused one-hot-MXU SpMM kernel on the
        # complete graph — documents the honest crossover (XLA dense wins
        # at the shipped sizes; the kernel is for sparser topologies)
        r = bench_train_step(deadline=0, measure=("scan",),
                             cfg_overrides={"prop_backend": "pallas"},
                             progress_json=True)
        print(_extra_json(r))
        sys.exit(0)
    if "--use-beta-only" in sys.argv:
        # the use_beta capability path (time-conditioned edge attention +
        # top-50% pruning — the sparse/COO regime)
        r = bench_train_step(deadline=0, measure=("scan",),
                             cfg_overrides={"use_beta": True},
                             progress_json=True)
        print(_extra_json(r))
        sys.exit(0)
    if "--serve-only" in sys.argv:
        print(json.dumps(bench_serve()))
        sys.exit(0)
    if "--sparse-only" in sys.argv:
        print(json.dumps(bench_sparse()))
        sys.exit(0)
    if "--profile" in sys.argv:
        # capture an xprof trace of the steady-state scanned step
        from raindrop_tpu.utils.diagnostics import profile_trace

        logdir = "profile_trace"
        with profile_trace(logdir):
            bench_train_step(iters=5)
        print(f"# trace written to {logdir}/", file=sys.stderr)
    # Soft wall-clock budget: tunnel compile times vary from seconds to
    # minutes; the headline always runs, the optional measurements stop
    # once the budget passes.
    t_start = time.time()
    # Default budget sized so all 6 subprocess extras fit even with ~45 s
    # interpreter+device-init overhead each (measured; the driver's round-2
    # run proved multi-minute bench runs are tolerated). One pathological
    # cold compile still can't starve the rest: each extra is separately
    # bounded by the remaining budget.
    budget = float(os.environ.get("RAINDROP_BENCH_BUDGET_S", "1500"))
    r = bench_train_step(deadline=t_start + budget, measure=("scan", "eval"))
    # vs_baseline prefers the eval/eval comparison; if the budget cut the
    # eval measurement, fall back to TRAIN samples/s over the torch EVAL
    # baseline — strictly conservative (our train step does ~3x the work of
    # the baseline's eval forward).
    vs = (round(r["eval_samples_per_sec"] / BASELINE_TORCH_SAMPLES_PER_SEC, 1)
          if r["eval_samples_per_sec"] else
          round(r["samples_per_sec"] / BASELINE_TORCH_SAMPLES_PER_SEC, 1))

    def run_extra(args_, keys=("samples_per_sec",)):
        """One bounded subprocess measurement; dict of keys (None values
        on timeout/failure). All JSON lines of the child are merged, so a
        child that printed its measurement but timed out during the later
        flops cost-analysis still contributes the measurement."""
        out = {k: None for k in keys}

        def merge(text):
            for ln in (text or "").strip().splitlines():
                if ln.startswith("{"):
                    try:
                        d = json.loads(ln)
                    except ValueError:
                        continue
                    for k_ in keys:
                        if d.get(k_) is not None:
                            out[k_] = d[k_]

        remaining = t_start + budget - time.time()
        if remaining < 60 or os.environ.get("RAINDROP_BENCH_EXTRAS", "1") == "0":
            return out
        import subprocess
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + args_,
                capture_output=True, text=True, timeout=remaining)
            merge(p.stdout)
        except subprocess.TimeoutExpired as e:
            so = e.stdout
            merge(so.decode("utf-8", "replace")
                  if isinstance(so, bytes) else so)
        except (subprocess.SubprocessError, ValueError):
            pass
        return out

    # Extras in priority order (each bounded by the remaining budget):
    # PAM first — the flash-attention regime is the single most
    # informative extra — then P12, bf16 ceiling, dispatch overhead,
    # the use_beta sparse path, and serving SLOs.
    flop_keys = ("samples_per_sec", "train_tflops", "train_mfu")
    pam = run_extra(["--dataset", "PAM"], keys=flop_keys)
    p12 = run_extra(["--dataset", "P12"], keys=flop_keys)
    big = run_extra(["--big-only"], keys=flop_keys)
    big2 = run_extra(["--big2-only"], keys=("samples_per_sec",))
    disp_ms = run_extra(["--dispatched-only"],
                        keys=("dispatched_step_ms",))["dispatched_step_ms"]
    beta = run_extra(["--use-beta-only"], keys=flop_keys)
    pallas_prop = run_extra(["--pallas-prop-only"], keys=flop_keys)
    sparse = run_extra(["--sparse-only"],
                       keys=("sparse_knn_xla_ms", "sparse_knn_pallas_ms",
                             "sparse_knn_pallas_speedup",
                             "sddmm_xla_ms", "sddmm_pallas_ms"))
    serve = run_extra(["--serve-only"],
                      keys=("serve_p50_ms", "serve_p99_ms",
                            "serve_b128_samples_per_sec",
                            "serve_stream_samples_per_sec",
                            "serve_stream_bf16_samples_per_sec",
                            "serve_concurrent_samples_per_sec",
                            "serve_concurrent_bf16_samples_per_sec",
                            "serve_concurrent_coalesce_ratio"))
    rnd = lambda v, n=2: None if v is None else round(v, n)  # noqa: E731
    print(json.dumps({
        "metric": "raindrop_p19_train_samples_per_sec",
        "value": round(r["samples_per_sec"], 2),
        "unit": "samples/s",
        "vs_baseline": vs,
        "eval_samples_per_sec": rnd(r["eval_samples_per_sec"]),
        "edges_per_sec": round(r["edges_per_sec"]),
        "step_ms": round(r["step_ms"], 3),
        "train_gflops_per_step": rnd(r.get("train_gflops_per_step"), 3),
        "train_tflops": rnd(r.get("train_tflops"), 2),
        "mfu": rnd(r.get("train_mfu"), 4),
        "eval_tflops": rnd(r.get("eval_tflops"), 2),
        "eval_mfu": rnd(r.get("eval_mfu"), 4),
        "dispatched_step_ms": rnd(disp_ms, 3),
        "bf16_b1024_samples_per_sec": rnd(big["samples_per_sec"]),
        "bf16_b1024_mfu": rnd(big["train_mfu"], 4),
        "bf16_b2048_mb2_samples_per_sec": rnd(big2["samples_per_sec"]),
        "pam_train_samples_per_sec": rnd(pam["samples_per_sec"]),
        "pam_tflops": rnd(pam["train_tflops"], 2),
        "pam_mfu": rnd(pam["train_mfu"], 4),
        "p12_train_samples_per_sec": rnd(p12["samples_per_sec"]),
        "p12_mfu": rnd(p12["train_mfu"], 4),
        "use_beta_train_samples_per_sec": rnd(beta["samples_per_sec"]),
        "use_beta_mfu": rnd(beta["train_mfu"], 4),
        "pallas_prop_train_samples_per_sec": rnd(
            pallas_prop["samples_per_sec"]),
        "sparse_knn_xla_ms": rnd(sparse["sparse_knn_xla_ms"], 3),
        "sparse_knn_pallas_ms": rnd(sparse["sparse_knn_pallas_ms"], 3),
        "sparse_knn_pallas_speedup": rnd(
            sparse["sparse_knn_pallas_speedup"], 2),
        "sddmm_xla_ms": rnd(sparse["sddmm_xla_ms"], 3),
        "sddmm_pallas_ms": rnd(sparse["sddmm_pallas_ms"], 3),
        "serve_p50_ms": rnd(serve["serve_p50_ms"], 3),
        "serve_p99_ms": rnd(serve["serve_p99_ms"], 3),
        "serve_b128_samples_per_sec": rnd(serve["serve_b128_samples_per_sec"]),
        "serve_stream_samples_per_sec": rnd(
            serve["serve_stream_samples_per_sec"]),
        "serve_stream_bf16_samples_per_sec": rnd(
            serve["serve_stream_bf16_samples_per_sec"]),
        "serve_concurrent_samples_per_sec": rnd(
            serve["serve_concurrent_samples_per_sec"]),
        "serve_concurrent_bf16_samples_per_sec": rnd(
            serve["serve_concurrent_bf16_samples_per_sec"]),
        "serve_concurrent_coalesce_ratio": rnd(
            serve["serve_concurrent_coalesce_ratio"], 1),
        "backend": r["backend"],
    }))
