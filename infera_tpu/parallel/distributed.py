"""Multi-host control plane: process-group init, replicated model registry,
failure recovery.

The reference is single-process (SURVEY.md §2.4): its only fault handling is
HTTP retry + atomic cache commits. For a pod slice this module provides the
TPU-native equivalents named in SURVEY.md §5:

- ``initialize()``: jax.distributed process-group bring-up (no-op
  single-host).
- ``ReplicatedModelOps``: the registry control plane. Queries execute on
  every host, so load/unload/autoload must be applied on every host.
  Model *bytes* travel through the shared model cache (each host fetches
  the same URL through its own ETag-validated cache — content-addressed by
  SHA-256(url), so all hosts converge); the control-plane broadcast of
  (op, name, path) rides jax's coordination service when
  ``jax.process_count() > 1``; compilation is always per-host.
- ``run_partitions_with_retry``: stateless query restart — inference is
  pure, so recovering from a lost worker means re-running its partition
  (SURVEY.md §5 failure-detection row). A fault-injection hook supports the
  kill-a-worker-mid-query test tier.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from .. import api, log
from ..errors import InferaError


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """jax.distributed.initialize when running multi-process; returns True
    if a multi-process group is live."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    return jax.process_count() > 1


_BCAST_BUF = 1 << 16


def _broadcast_ops(ops: list) -> list:
    """Replication consistency guard. Queries execute SPMD — every host runs
    the same statement stream, so each host reaches this point with the same
    op. Host 0's op is broadcast (JSON in a fixed uint8 buffer; collectives
    move arrays, not strings) and every host verifies its local op matches
    before applying — catching divergent registries early instead of at
    result-mismatch time."""
    import jax

    if jax.process_count() <= 1:
        return ops
    import json

    import numpy as np
    from jax.experimental import multihost_utils

    payload = json.dumps(ops).encode("utf-8")
    if len(payload) > _BCAST_BUF - 4:
        raise ValueError("control-plane op too large to broadcast")
    buf = np.zeros(_BCAST_BUF, np.uint8)
    buf[:4] = np.frombuffer(np.int32(len(payload)).tobytes(), np.uint8)
    buf[4 : 4 + len(payload)] = np.frombuffer(payload, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int(np.frombuffer(out[:4].tobytes(), np.int32)[0])
    canonical = json.loads(out[4 : 4 + n].tobytes().decode("utf-8"))
    canonical = [tuple(op) for op in canonical]
    if canonical != [tuple(op) for op in ops]:
        raise RuntimeError(
            f"registry op divergence across hosts: host0={canonical} "
            f"local={ops}"
        )
    return ops


@dataclass
class ReplicatedModelOps:
    """Apply registry mutations host-locally and (when multi-process)
    through the coordination broadcast so every host stays in sync."""

    applied: list = field(default_factory=list)

    def load(self, name: str, path_or_url: str) -> None:
        for op in _broadcast_ops([("load", name, path_or_url)]):
            self._apply(op)

    def unload(self, name: str) -> None:
        for op in _broadcast_ops([("unload", name, "")]):
            self._apply(op)

    def autoload(self, path: str) -> str:
        result = None
        for op in _broadcast_ops([("autoload", path, "")]):
            result = self._apply(op)
        return result

    def _apply(self, op):
        kind, a, b = op
        self.applied.append(tuple(op))
        if kind == "load":
            api.load_model(a, b)
        elif kind == "unload":
            api.unload_model(a)
        elif kind == "autoload":
            return api.set_autoload_dir(a)
        return None


class Heartbeat:
    """Worker liveness monitor (SURVEY.md §5 failure-detection row).

    Each worker calls ``beat(worker_id)`` periodically (in a pod this is
    driven by the per-host control loop over the coordination service); the
    monitor thread flags workers whose last beat is older than the deadline
    and invokes ``on_dead`` once per transition, enabling the stateless
    partition restart path (run_partitions_with_retry)."""

    def __init__(self, deadline_s: float = 5.0, interval_s: float = 1.0,
                 on_dead=None):
        import threading

        self.deadline_s = deadline_s
        self.interval_s = interval_s
        self.on_dead = on_dead
        self._last: dict = {}
        self._dead: set = set()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = None

    def beat(self, worker_id) -> None:
        with self._lock:
            self._last[worker_id] = time.monotonic()
            if worker_id in self._dead:
                self._dead.discard(worker_id)  # recovered

    def dead_workers(self) -> set:
        with self._lock:
            return set(self._dead)

    def _scan(self) -> None:
        now = time.monotonic()
        newly_dead = []
        with self._lock:
            for worker_id, last in self._last.items():
                if worker_id not in self._dead and now - last > self.deadline_s:
                    self._dead.add(worker_id)
                    newly_dead.append(worker_id)
        for worker_id in newly_dead:
            log.warn(f"worker {worker_id} missed heartbeat deadline "
                     f"({self.deadline_s}s)")
            if self.on_dead is not None:
                self.on_dead(worker_id)

    def start(self) -> None:
        import threading

        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.wait(self.interval_s):
            self._scan()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


class PartitionFailure(Exception):
    def __init__(self, partition: int, cause: Exception):
        self.partition = partition
        self.cause = cause
        super().__init__(f"partition {partition} failed: {cause}")


def run_partitions_with_retry(partition_fn, n_partitions: int,
                              max_attempts: int = 3,
                              retry_delay_s: float = 0.0,
                              fault_hook=None) -> list:
    """Execute ``partition_fn(p)`` for every partition with per-partition
    retry — the stateless-recovery model: inference carries no state, so a
    lost worker's partition is simply re-run (SURVEY.md §5).

    ``fault_hook(p, attempt)`` (test injection) may raise to simulate a
    worker loss; real failures are any exception from partition_fn.
    Returns the list of per-partition results; raises PartitionFailure when
    a partition exhausts its attempts.
    """
    results = [None] * n_partitions
    for p in range(n_partitions):
        last = None
        for attempt in range(1, max_attempts + 1):
            try:
                if fault_hook is not None:
                    fault_hook(p, attempt)
                results[p] = partition_fn(p)
                last = None
                break
            except InferaError as e:
                raise  # engine errors are deterministic; retrying can't help
            except Exception as e:  # noqa: BLE001 - worker loss is arbitrary
                last = e
                log.warn(f"partition {p} attempt {attempt}/{max_attempts} failed: {e}")
                if attempt < max_attempts and retry_delay_s:
                    time.sleep(retry_delay_s)
        if last is not None:
            raise PartitionFailure(p, last)
    return results
