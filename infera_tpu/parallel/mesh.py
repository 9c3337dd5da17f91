"""Device mesh construction.

The reference is single-process CPU (SURVEY.md §2.4 — explicit absence list);
here the mesh is a first-class component. Axes:

- ``dp``: data-parallel axis — tables are hash/range-partitioned across it
  (the analog of parallelism strategies for a query engine, SURVEY.md §2.4).
- ``mp``: model-parallel axis — reserved for TP-sharding large ONNX models
  under the same mesh (SURVEY.md §2.4 notes this as the natural extension).

On a pod slice, ``dp`` is laid out over ICI within a slice and DCN across
slices by jax's device ordering; single-host tests force N virtual CPU
devices via --xla_force_host_platform_device_count.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, mp: int = 1,
              backend: str | None = None) -> Mesh:
    """Build a (dp, mp) mesh over the first n_devices devices.

    When the default backend exposes fewer devices than requested (e.g. a
    single tunneled TPU chip while a virtual multi-device CPU platform is
    also registered), falls back to the CPU backend so sharding code can be
    validated anywhere.
    """
    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices) and backend is None:
        try:
            cpu_devices = jax.devices("cpu")
        except RuntimeError:
            cpu_devices = []
        if len(cpu_devices) >= n_devices:
            devices = cpu_devices
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    if n_devices % mp != 0:
        raise ValueError(f"n_devices {n_devices} not divisible by mp {mp}")
    dp = n_devices // mp
    grid = np.asarray(devices[:n_devices]).reshape(dp, mp)
    return Mesh(grid, axis_names=("dp", "mp"))


def row_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 (rows) over dp; replicate remaining axes."""
    spec = P("dp", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
