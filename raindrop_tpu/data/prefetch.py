"""Async host-side batch executor — double-buffered input pipeline.

The reference trains from host numpy with a fresh H2D copy on every step
inside the train loop (reference code/Raindrop.py:299-315) — assembly and
transfer serialize with compute. The framework's default path avoids the
problem entirely by keeping whole splits device-resident and gathering
batches on-device inside a scanned epoch (train/trainer.py). This module
is the third regime, for datasets that do NOT fit in HBM: a bounded
producer/consumer executor that assembles batches on worker threads
(native C++/OpenMP gather when available — native/raindrop_host.cpp
rd_gather_rows / rd_gather_time_major — numpy fancy-indexing otherwise)
and optionally stages them onto the device with `jax.device_put`, which is
async: the DMA of batch k+1 overlaps the device compute of batch k.

Semantics:
  * order-preserving: batches come out in the order the index iterator
    produced them;
  * bounded: at most `depth` assembled batches exist at once (default 2 —
    classic double buffering), so host memory stays O(depth * batch);
  * fault-propagating: a producer exception re-raises at the consumer's
    next __next__, with the executor shut down cleanly;
  * early close() (or GC) stops the producer without draining.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional

import numpy as np

from raindrop_tpu import native

_SENTINEL = object()


def assemble_batch(data: Dict[str, np.ndarray], idx: np.ndarray,
                   time_major: bool = False,
                   use_native: bool = True) -> Dict[str, np.ndarray]:
    """Gather one batch from host arrays.

    data: arrays keyed e.g. {"P" [N,T,C], "time" [N,T], "static" [N,S],
    "y" [N]}. With time_major=True, 3-D float32 arrays come out [T, B, C]
    and 2-D "time" comes out [T, B] (the model's input contract); others
    stay batch-major.
    """
    use_native = use_native and native.available()
    out: Dict[str, np.ndarray] = {}
    for k, arr in data.items():
        tm = time_major and arr.ndim >= 2 and k in ("P", "time")
        if use_native and arr.dtype == np.float32 and arr.ndim == 3 and tm:
            out[k] = native.gather_time_major(arr, idx)
        elif use_native and arr.dtype == np.float32:
            g = native.gather_rows(arr, idx)
            out[k] = g.transpose(1, 0) if (tm and g.ndim == 2) else g
        else:
            g = arr[idx]
            if tm:
                g = np.moveaxis(g, 0, 1)
            out[k] = np.ascontiguousarray(g)
    return out


class PrefetchExecutor:
    """Iterate assembled (optionally device-staged) batches ahead of the
    consumer. See module docstring for guarantees."""

    def __init__(
        self,
        data: Dict[str, np.ndarray],
        batch_indices: Iterable[np.ndarray],
        *,
        depth: int = 2,
        time_major: bool = False,
        use_native: bool = True,
        to_device: Optional[Callable] = None,
    ):
        """to_device: optional callable applied to each assembled batch on
        the PRODUCER thread (e.g. ``jax.device_put`` or a sharded
        device_put) so transfers overlap consumer compute."""
        self._data = data
        self._indices = iter(batch_indices)
        self._time_major = time_major
        self._use_native = use_native
        self._to_device = to_device
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for idx in self._indices:
                if self._stop.is_set():
                    return
                batch = assemble_batch(self._data, np.asarray(idx),
                                       time_major=self._time_major,
                                       use_native=self._use_native)
                if self._to_device is not None:
                    batch = self._to_device(batch)
                # blocking put bounds memory; poll so close() can interrupt
                self._put_or_stop(batch)
            self._put_or_stop(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            # Same stop-checked retry loop as the batch put: the exception
            # (or nothing, if the consumer already called close()) always
            # reaches the queue — a one-shot put(timeout=1) could drop it
            # and leave the consumer blocked on a queue that never ends.
            self._put_or_stop(e)

    def _put_or_stop(self, item) -> None:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        # Timed get + liveness check: after close() (or a dead producer that
        # somehow enqueued nothing) no sentinel will ever arrive, so an
        # unbounded get() would hang; instead treat "stopped/dead producer
        # and empty queue" as exhaustion.
        while True:
            try:
                item = self._q.get(timeout=0.2)
                break
            except queue.Empty:
                if self._stop.is_set():
                    raise StopIteration from None
                if not self._thread.is_alive():
                    # the producer may have enqueued its final item(s) in
                    # the window between the Empty and the liveness check;
                    # once it is dead nothing more can arrive, so one
                    # non-blocking recheck closes the race
                    try:
                        item = self._q.get_nowait()
                        break
                    except queue.Empty:
                        raise StopIteration from None
        if item is _SENTINEL:
            self._thread.join(timeout=5.0)
            raise StopIteration
        if isinstance(item, BaseException):
            self.close()
            raise item
        return item

    def close(self):
        """Stop the producer and drop queued batches."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        if self._thread.is_alive():
            self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self._stop.set()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass
