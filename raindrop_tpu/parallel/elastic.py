"""Failure detection + elastic recovery: heartbeats, fault injection,
restart-from-checkpoint.

The reference has no process-level fault handling at all (SURVEY.md §5.3) —
a crashed run loses everything because only best-val state_dicts are saved
(reference code/Raindrop.py:374) with no optimizer/scheduler/RNG state. Its
only notion of "failure" is the domain-level one: Settings 2/3 zero sensor
columns to simulate sensor dropout (reference code/Raindrop.py:215-231) —
that lives in data/settings.py. This module supplies the process-level
machinery a multi-host TPU deployment needs:

  * Heartbeat / HeartbeatMonitor — each training process periodically
    writes a small JSON beat file (step counter + wall time); a monitor
    (same host or a supervisor) flags processes whose beat is stale. On a
    pod, one beat file per jax.process_index() in a shared directory.
  * FaultInjector — deterministic, seeded fault injection for tests and
    chaos drills: raises SimulatedFailure at a chosen epoch/step, as if the
    process had been preempted.
  * run_elastic — supervises Trainer.train_split: on failure it rebuilds
    the training loop from the last durable `<ckpt>_last` checkpoint
    (params + opt state + scheduler + both RNG streams + epoch counter,
    train/checkpoint.py) and continues, up to max_restarts. Because resume
    restores the numpy sampler state and the jax PRNG key exactly, an
    interrupted-and-restarted run produces bit-identical results to an
    uninterrupted one — asserted in tests/test_elastic.py.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Callable, Dict, List, Optional


class SimulatedFailure(RuntimeError):
    """Raised by FaultInjector to emulate preemption/crash mid-run."""


class Heartbeat:
    """Periodic liveness beacon for one training process.

    Writes `<dir>/heartbeat_<process_id>.json` containing the latest step,
    a monotonically increasing beat counter, and the wall-clock timestamp.
    Use either as a context manager (background thread beats every
    `interval_s`) or by calling .beat(step) manually from the epoch hook.
    """

    def __init__(self, directory: str, process_id: int = 0,
                 interval_s: float = 10.0):
        self.directory = directory
        self.process_id = process_id
        self.interval_s = interval_s
        self.path = os.path.join(directory, f"heartbeat_{process_id}.json")
        self._step = 0
        self._count = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        os.makedirs(directory, exist_ok=True)

    def beat(self, step: Optional[int] = None) -> None:
        if step is not None:
            self._step = step
        self._count += 1
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"process_id": self.process_id, "step": self._step,
                       "count": self._count, "time": time.time()}, f)
        os.replace(tmp, self.path)  # atomic: monitor never sees a torn file

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            self.beat()

    def __enter__(self) -> "Heartbeat":
        self.beat()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self.interval_s)


class HeartbeatMonitor:
    """Supervisor-side staleness detector over a heartbeat directory."""

    def __init__(self, directory: str, timeout_s: float = 60.0):
        self.directory = directory
        self.timeout_s = timeout_s

    def read(self) -> List[Dict[str, Any]]:
        beats = []
        if not os.path.isdir(self.directory):
            return beats
        for name in sorted(os.listdir(self.directory)):
            if not (name.startswith("heartbeat_") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(self.directory, name)) as f:
                    beats.append(json.load(f))
            except (json.JSONDecodeError, OSError):
                continue  # torn/vanished file: treated as missing this poll
        return beats

    def stale(self, now: Optional[float] = None) -> List[int]:
        """Process ids whose last beat is older than timeout_s."""
        now = time.time() if now is None else now
        return [b["process_id"] for b in self.read()
                if now - b["time"] > self.timeout_s]

    def all_alive(self, n_processes: int, now: Optional[float] = None) -> bool:
        beats = {b["process_id"] for b in self.read()}
        return beats >= set(range(n_processes)) and not self.stale(now)


class FaultInjector:
    """Deterministic fault injection: dies at the given epochs.

    `fail_at_epochs` uses the GLOBAL epoch numbering, and each listed epoch
    fires at most once per injector instance, so a restarted run that
    replays earlier epochs does not re-trip old faults.
    """

    def __init__(self, fail_at_epochs):
        self._pending = set(int(e) for e in fail_at_epochs)

    def __call__(self, epoch: int, record: Dict[str, Any]) -> None:
        if epoch in self._pending:
            self._pending.discard(epoch)
            raise SimulatedFailure(f"injected failure at epoch {epoch}")


def run_elastic(trainer, split, *, checkpoint_path: str,
                max_restarts: int = 3, seed: Optional[int] = None,
                heartbeat: Optional[Heartbeat] = None,
                fault_injector: Optional[Callable] = None,
                verbose: bool = False):
    """Supervised training with restart-from-checkpoint.

    Runs trainer.train_split; if it dies (SimulatedFailure or any
    exception), restarts from `<checkpoint_path>_last` — the full state
    written every epoch — until it completes or max_restarts is exhausted.
    Returns (TrainResult, n_restarts).
    """
    restarts = 0
    resume: Optional[str] = None

    def hook(epoch: int, rec: Dict[str, Any]) -> None:
        if heartbeat is not None:
            heartbeat.beat(step=epoch)
        if fault_injector is not None:
            fault_injector(epoch, rec)

    while True:
        try:
            result = trainer.train_split(
                split, seed=seed, checkpoint_path=checkpoint_path,
                resume_from=resume, verbose=verbose, on_epoch_end=hook)
            return result, restarts
        except Exception as e:  # noqa: BLE001 — any crash is a restart event
            restarts += 1
            if restarts > max_restarts:
                raise
            last = checkpoint_path + "_last"
            if not os.path.exists(last + ".npz"):
                resume = None  # died before the first durable epoch
            else:
                resume = last
            if verbose:
                print(f"[elastic] {type(e).__name__}: {e} — "
                      f"restart {restarts}/{max_restarts} from "
                      f"{resume or 'scratch'}")
