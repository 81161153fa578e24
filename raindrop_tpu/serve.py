"""Production inference serving for Raindrop models.

The reference has no serving surface at all — inference is inlined into the
training scripts (`evaluate`/`evaluate_standard`, reference
code/utils_rd.py:276-321; SURVEY.md §2.5-2.8). This module is the framework's
serving tier, TPU-shaped:

  * **Ahead-of-time compilation**: every (batch-bucket) entry point is
    lowered and compiled at server start (`jax.jit(...).lower(...).compile()`),
    so the first request never pays the 20-40 s XLA compile;
  * **Static batch buckets**: requests are padded up to the nearest
    power-of-two bucket — a fixed, small set of compiled programs instead of
    one recompile per ragged request shape (XLA requires static shapes; the
    bucket ladder converts dynamic traffic into them);
  * **Micro-batching queue**: concurrent requests are coalesced into one
    device launch (`InferenceServer.submit` is thread-safe);
  * **Pipelined streaming** (`predict_stream`): depth-N launches + a D2H
    fetch thread pool keep the device busy across requests — on tunneled
    backends the fetch round-trip (~25 ms) otherwise bounds throughput;
  * **bfloat16 wire format** (`transfer_dtype`): halves request bytes for
    bandwidth-bound links (~2x streaming throughput, input-quantization
    accuracy only — compute stays f32);
  * Params live on device once (`jax.device_put`), requests stream
    activations only.

`python -m raindrop_tpu.serve --checkpoint C --dataset P19 --port 8000`
starts a stdlib-HTTP JSON endpoint (POST /predict, GET /healthz) — no
framework dependencies.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from raindrop_tpu.config import RaindropConfig, dataset_config
from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class InferenceServer:
    """AOT-compiled, bucketed batch inference for a Raindrop model."""

    def __init__(
        self,
        cfg: RaindropConfig,
        params,
        *,
        buckets: Sequence[int] = (1, 8, 32, 128),
        apply_fn=None,
        precompile: bool = True,
        transfer_dtype: str = "float32",
        coalesce_window_s: float = 0.002,
    ):
        """transfer_dtype: the WIRE format of request tensors. 'bfloat16'
        halves host->device bytes — on remote/tunneled devices the
        saturated streaming throughput is H2D-bandwidth-bound, so this is
        ~2x samples/s (measured: docs/PERFORMANCE.md) — at an input
        quantization of ~3 significant digits (inputs are z-scored values,
        masks and hour timestamps, all of which survive bf16; compute
        still runs the model's own dtype — the cast back to cfg.dtype
        happens on device before the forward). Default stays exact f32.

        coalesce_window_s: how long the micro-batching thread (submit())
        waits for more concurrent requests before launching, once the
        first request of a group arrives. The window only delays requests
        that would otherwise launch under-full buckets — a full top bucket
        launches immediately.
        """
        self.cfg = cfg
        self.params = jax.device_put(params)
        self.buckets = sorted(buckets)
        self.transfer_dtype = jnp.dtype(transfer_dtype)
        self._apply = apply_fn or (
            lambda p, src, static, times, lengths:
            raindrop_apply(p, cfg, src, static, times, lengths)[0])
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "samples": 0, "batches": 0,
                      "coalesced_launches": 0, "coalesced_requests": 0,
                      "latency_ms_sum": 0.0}
        self._coalesce_s = coalesce_window_s
        self._submit_q: "queue.Queue" = queue.Queue()
        self._batcher_thread: Optional[threading.Thread] = None
        self._closed = False
        # Pipelined micro-batching: the batcher thread only DISPATCHES
        # launches (async in JAX); the device->host fetch + future
        # resolution runs on this pool so the ~25 ms tunnel RTT of group k
        # overlaps the accumulation + launch of group k+1 instead of
        # serializing the whole submit() path (round-4 bench: coalescing
        # 16x but zero throughput gain — the batcher fetched inline).
        self._pipeline_depth = 4
        self._fetch_pool = None
        self._inflight = threading.Semaphore(self._pipeline_depth)

        model_dtype = jnp.dtype(cfg.dtype)

        def fwd(params, P, times, static):
            # wire dtype -> the model's configured dtype on device, then
            # batch-major request tensors -> the model's time-major boundary
            P = P.astype(model_dtype)
            times = times.astype(model_dtype)
            static = None if static is None else static.astype(model_dtype)
            src = P.transpose(1, 0, 2)
            tm = times.transpose(1, 0)
            lengths = jnp.sum(tm > 0, axis=0)
            logits = self._apply(params, src, static, tm, lengths)
            return jax.nn.softmax(logits, axis=-1)

        self._compiled: Dict[int, object] = {}
        self._jit = jax.jit(fwd)
        if precompile:
            for b in self.buckets:
                self._compiled[b] = self._compile_bucket(b)

    # -- compilation -------------------------------------------------------
    def _abstract_batch(self, b: int):
        cfg, dt = self.cfg, self.transfer_dtype
        P = jax.ShapeDtypeStruct((b, cfg.max_len, 2 * cfg.d_inp), dt)
        tm = jax.ShapeDtypeStruct((b, cfg.max_len), dt)
        st = (jax.ShapeDtypeStruct((b, cfg.d_static), dt)
              if cfg.static else None)
        return P, tm, st

    def _compile_bucket(self, b: int):
        P, tm, st = self._abstract_batch(b)
        return self._jit.lower(self.params, P, tm, st).compile()

    def _runner(self, b: int):
        if b not in self._compiled:
            self._compiled[b] = self._compile_bucket(b)
        return self._compiled[b]

    # -- inference -----------------------------------------------------------
    def predict(self, P: np.ndarray, times: np.ndarray,
                static: Optional[np.ndarray] = None) -> np.ndarray:
        """P [n, T, 2F], times [n, T], static [n, S]|None -> probs [n, C].

        Requests larger than the top bucket are chunked; smaller ones are
        zero-padded up to the nearest bucket (padding rows carry zero
        timestamps => lengths 0, masked everywhere downstream).
        """
        t0 = time.perf_counter()
        n = P.shape[0]
        probs, n_launches = self._run_batches(P, times, static)
        with self._lock:
            self.stats["requests"] += 1
            self.stats["samples"] += n
            self.stats["batches"] += n_launches
            self.stats["latency_ms_sum"] += 1e3 * (time.perf_counter() - t0)
        return probs

    # -- micro-batching (thread-safe submit + coalescing batcher) ----------
    def submit(self, P: np.ndarray, times: np.ndarray,
               static: Optional[np.ndarray] = None,
               timeout: Optional[float] = None) -> np.ndarray:
        """Thread-safe micro-batching entry point: CONCURRENT submit()
        calls are coalesced by a background batcher thread into shared
        bucketed device launches (one launch serves many requests), and
        each caller blocks until its own slice of the results is ready.
        Results are identical to predict() — same compiled runners, same
        padding; only the grouping differs. Coalescing effectiveness is
        observable in stats: coalesced_launches counts device launches,
        coalesced_requests the requests they served.
        """
        t0 = time.perf_counter()
        out = self.submit_async(P, times, static).result(timeout)
        with self._lock:
            self.stats["requests"] += 1
            self.stats["latency_ms_sum"] += 1e3 * (time.perf_counter() - t0)
        return out

    def submit_async(self, P: np.ndarray, times: np.ndarray,
                     static: Optional[np.ndarray] = None):
        """Open-loop variant of submit(): enqueue the request and return
        its `concurrent.futures.Future` immediately. A client keeping a
        few requests in flight (submit_async + deferred .result()) lets
        the batcher's launch/fetch pipeline run full — with strictly
        synchronous clients every round still serializes on the readback
        RTT because nothing is queued while callers block. Counts toward
        `samples` (here) and `batches` (at launch); `requests` and the
        latency SLO remain defined over synchronous submit()/predict()
        calls, as for predict_stream."""
        from concurrent.futures import Future

        fut: "Future" = Future()
        item = (np.asarray(P), np.asarray(times),
                None if static is None else np.asarray(static), fut)
        # closed-check + enqueue under the lock: close() flips _closed and
        # enqueues its drain sentinel under the same lock, so no request
        # can slip in behind the sentinel and strand its caller forever.
        with self._lock:
            if self._closed:
                raise RuntimeError("server closed")
            self._ensure_batcher_locked()
            self.stats["samples"] += item[0].shape[0]
            self._submit_q.put(item)
        return fut

    def _ensure_batcher_locked(self):
        """Start the batcher thread + fetch pool (caller holds self._lock)."""
        if self._batcher_thread is None or not self._batcher_thread.is_alive():
            if self._fetch_pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._fetch_pool = ThreadPoolExecutor(
                    max_workers=self._pipeline_depth,
                    thread_name_prefix="serve-fetch")
            self._batcher_thread = threading.Thread(
                target=self._batcher_loop, daemon=True)
            self._batcher_thread.start()

    @staticmethod
    def _compat_key(item):
        """Only shape-compatible requests may share a concatenated launch;
        a malformed request must fail alone, not 400 its whole group."""
        P, times, static, _ = item
        return (P.shape[1:], times.shape[1:],
                None if static is None else static.shape[1:])

    def _batcher_loop(self):
        top = self.buckets[-1]
        leftover = None
        while True:
            if leftover is not None:
                first, leftover = leftover, None
            else:
                try:
                    first = self._submit_q.get(timeout=0.1)
                except queue.Empty:
                    if self._closed:
                        return
                    continue
            if first is None:
                return
            group = [first]
            key = self._compat_key(first)
            n_total = first[0].shape[0]
            # wait up to the coalesce window for more COMPATIBLE requests,
            # or until a full top bucket is pending — whichever comes first
            deadline = time.perf_counter() + self._coalesce_s
            while n_total < top:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    item = self._submit_q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._closed = True
                    break
                if self._compat_key(item) != key:
                    leftover = item        # starts the next group
                    break
                group.append(item)
                n_total += item[0].shape[0]
            self._dispatch_group(group)

    def _run_batches(self, P, times, static):
        """Shared bucketed launch loop: chunk to the top bucket, launch,
        fetch, unpad. Returns (probs [n, C], n_launches). The single code
        path behind predict() and the coalescing batcher, so the two can
        never silently diverge."""
        top = self.buckets[-1]
        n = P.shape[0]
        if n == 0:  # zero-row request: nothing to launch, nothing to fetch
            return np.zeros((0, self.cfg.n_classes), np.float32), 0
        outs = []
        n_launches = 0
        for start in range(0, n, top):
            chunk = slice(start, min(start + top, n))
            probs = self._launch_chunk(
                P[chunk], times[chunk],
                None if static is None else static[chunk])
            outs.append(self._fetch(probs)[:chunk.stop - chunk.start])
            n_launches += 1
        return np.concatenate(outs), n_launches

    def _fetch(self, dev) -> np.ndarray:
        """Device->host readback of one launched bucket (the ~25 ms RTT on
        tunneled backends). A method so tests can instrument the cost."""
        return np.asarray(jax.device_get(dev))

    def _dispatch_group(self, group):
        """One coalesced launch set: concatenate the group's (shape-
        compatible) tensors and DISPATCH the bucketed launches; the fetch
        + per-caller future resolution runs on the fetch pool so the next
        group's accumulation/launch overlaps this group's readback RTT.
        In-flight groups are bounded by `_pipeline_depth` (semaphore) so a
        slow fetch stage backpressures the batcher instead of piling up
        device buffers."""
        try:
            P = np.concatenate([g[0] for g in group if g[0].shape[0]]
                               or [group[0][0]])
            times = np.concatenate([g[1] for g in group if g[0].shape[0]]
                                   or [group[0][1]])
            static = (np.concatenate([g[2] for g in group if g[0].shape[0]]
                                     or [group[0][2]])
                      if group[0][2] is not None else None)
            n = P.shape[0]
            if n == 0:
                empty = np.zeros((0, self.cfg.n_classes), np.float32)
                for g in group:
                    g[3].set_result(empty)
                return
            self._inflight.acquire()
            try:
                top = self.buckets[-1]
                launches = []
                for start in range(0, n, top):
                    chunk = slice(start, min(start + top, n))
                    dev = self._launch_chunk(
                        P[chunk], times[chunk],
                        None if static is None else static[chunk])
                    launches.append((dev, chunk.stop - chunk.start))
                self._fetch_pool.submit(self._finish_group, group, launches)
            except BaseException:
                self._inflight.release()
                raise
        except BaseException as e:  # noqa: BLE001 — deliver to callers
            self._fail_or_retry(group, e)

    def _finish_group(self, group, launches):
        """Fetch stage (pool thread): read back each launched bucket,
        slice results to the callers' futures, account stats."""
        try:
            try:
                outs = [self._fetch(dev)[:rows] for dev, rows in launches]
            finally:
                self._inflight.release()
            all_probs = np.concatenate(outs)
            with self._lock:
                self.stats["batches"] += len(launches)
                self.stats["coalesced_launches"] += len(launches)
                self.stats["coalesced_requests"] += len(group)
            off = 0
            for g in group:
                k = g[0].shape[0]
                g[3].set_result(all_probs[off:off + k])
                off += k
        except BaseException as e:  # noqa: BLE001 — deliver to callers
            self._fail_or_retry(group, e)

    def _fail_or_retry(self, group, err):
        """A coalesced launch failed as a unit. A data-dependent failure
        must not 400 every rider in the group: retry members individually
        (each through the sequential path) so only the offending
        request(s) see the error. A singleton group fails directly."""
        if len(group) == 1:
            if not group[0][3].done():
                group[0][3].set_exception(err)
            return
        for g in group:
            if g[3].done():
                continue
            try:
                probs, n_launches = self._run_batches(g[0], g[1], g[2])
                with self._lock:
                    self.stats["batches"] += n_launches
                g[3].set_result(probs)
            except BaseException as e:  # noqa: BLE001
                g[3].set_exception(e)

    def close(self):
        """Stop the batcher thread. In-flight and already-queued requests
        are completed (the batcher drains, then the fetch pool is joined);
        anything that races into the queue after the drain fails with
        'server closed' rather than hanging its caller forever."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            # the sentinel lands AFTER every successfully-submitted item
            # (submit() enqueues under this same lock)
            self._submit_q.put(None)
        t = self._batcher_thread
        if t is not None and t.is_alive():
            t.join(timeout=10.0)
        if self._fetch_pool is not None:
            self._fetch_pool.shutdown(wait=True)
        # fail anything stranded behind the sentinel (defensive only —
        # the locked submit() makes this unreachable in normal operation)
        while True:
            try:
                item = self._submit_q.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item[3].done():
                item[3].set_exception(RuntimeError("server closed"))

    def predict_stream(self, requests, *, depth: int = 4):
        """Pipelined batch inference: yields probs [n_i, C] for each
        request (P_i, times_i, static_i|None) IN ORDER while keeping up to
        `depth` device launches and D2H fetches in flight.

        Why this exists: on remote/tunneled TPU backends the device→host
        readback RPC costs a full round-trip (~25 ms measured here)
        regardless of payload size, while H2D transfers and dispatch are
        async and the compute itself is ~0.2 ms — so the synchronous
        `predict` path is latency-bound at one RTT per call. JAX dispatch
        is asynchronous, so launching request k+1 before fetching request
        k overlaps device compute with the fetch; fetching on a small
        thread pool additionally overlaps the RTTs themselves. Measured on
        the tunneled v5e at bucket 128: 1.6x the sequential predict()
        throughput (3.2k vs 2.0k samples/s — the remaining ceiling is H2D
        bandwidth: each b128 request ships ~2 MB of inputs over the
        tunnel; co-located serving is compute-bound at the eval-scan rate
        instead, ~350k samples/s). Results are bitwise identical to
        predict() — same compiled runners, same padding.
        """
        import collections
        from concurrent.futures import ThreadPoolExecutor

        top = self.buckets[-1]
        inflight: "collections.deque" = collections.deque()
        with ThreadPoolExecutor(max_workers=depth) as pool:
            def drain_one():
                fut, n = inflight.popleft()
                return fut.result()[:n]

            for (P, times, static) in requests:
                n = P.shape[0]
                if n > top:
                    raise ValueError(
                        f"stream request n={n} exceeds top bucket {top}; "
                        f"chunk client-side or use predict()")
                dev = self._launch_chunk(P, times, static)
                # fetch on the pool so RTTs overlap; np.asarray on distinct
                # jax.Arrays is thread-safe
                # count samples/batches but NOT 'requests': avg_latency_ms
                # (health()) is defined over synchronous predict() calls,
                # and a pipelined batch has no per-request latency of its
                # own — inflating the denominator would deflate the SLO
                inflight.append((pool.submit(self._fetch, dev), n))
                with self._lock:
                    self.stats["samples"] += n
                    self.stats["batches"] += 1
                if len(inflight) >= depth:
                    yield drain_one()
            while inflight:
                yield drain_one()

    def _launch_chunk(self, P, times, static):
        """Pad + dispatch one bucketed launch; returns the (async) device
        array of probabilities for the padded bucket."""
        n = P.shape[0]
        b = _bucket_for(n, self.buckets)
        if n < b:
            pad = b - n
            P = np.concatenate([P, np.zeros((pad,) + P.shape[1:], P.dtype)])
            times = np.concatenate(
                [times, np.zeros((pad,) + times.shape[1:], times.dtype)])
            if static is not None:
                static = np.concatenate(
                    [static, np.zeros((pad,) + static.shape[1:], static.dtype)])
        if self.cfg.static and static is None:
            raise ValueError(
                f"model config expects static features [n, {self.cfg.d_static}]")
        runner = self._runner(b)
        dt = self.transfer_dtype
        # the dtype cast happens HOST-SIDE so the H2D transfer carries the
        # wire format (half the bytes for bfloat16)
        return runner(self.params, jnp.asarray(np.asarray(P, dt)),
                      jnp.asarray(np.asarray(times, dt)),
                      None if static is None else
                      jnp.asarray(np.asarray(static, dt)))

    # -- introspection -------------------------------------------------------
    def health(self) -> Dict[str, object]:
        s = dict(self.stats)
        s["avg_latency_ms"] = (s.pop("latency_ms_sum") / s["requests"]
                               if s["requests"] else 0.0)
        return {"status": "ok", "backend": jax.default_backend(),
                "buckets": list(self.buckets),
                "compiled": sorted(self._compiled), **s}


def make_http_server(server: InferenceServer, host: str = "127.0.0.1",
                     port: int = 8000):
    """Wrap an InferenceServer in a stdlib ThreadingHTTPServer.

    POST /predict  {"P": [[..]], "times": [[..]], "static": [[..]]|null}
                   -> {"probs": [[..]]}
    GET  /healthz  -> server.health()
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, server.health())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                P = np.asarray(req["P"], np.float32)
                times = np.asarray(req["times"], np.float32)
                static = (np.asarray(req["static"], np.float32)
                          if req.get("static") is not None else None)
                # submit(): concurrent HTTP clients (ThreadingHTTPServer
                # = thread per connection) coalesce into shared launches
                probs = server.submit(P, times, static)
                self._send(200, {"probs": probs.tolist()})
            except Exception as e:  # surface errors to the client
                self._send(400, {"error": str(e)})

        def log_message(self, *a):  # quiet
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    from raindrop_tpu.utils.diagnostics import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    ap = argparse.ArgumentParser(description="Raindrop inference server")
    ap.add_argument("--dataset", default="P19")
    ap.add_argument("--checkpoint", default=None,
                    help=".npz checkpoint from train/checkpoint.py "
                         "(default: fresh random init — smoke mode)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--buckets", default="1,8,32,128")
    ap.add_argument("--transfer-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="wire format of request tensors; bfloat16 halves "
                         "H2D bytes (~2x streaming throughput on "
                         "bandwidth-bound links) at ~3-digit input "
                         "quantization")
    args = ap.parse_args(argv)

    cfg = dataset_config(args.dataset)
    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        from raindrop_tpu.train.checkpoint import load_checkpoint
        params, _, _ = load_checkpoint(args.checkpoint, params)
    server = InferenceServer(
        cfg, params, buckets=[int(b) for b in args.buckets.split(",")],
        transfer_dtype=args.transfer_dtype)
    httpd = make_http_server(server, args.host, args.port)
    print(f"serving {args.dataset} on http://{args.host}:{args.port} "
          f"(buckets {server.buckets})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
