"""Distributed shuffle: hash-repartition rows across the dp axis.

The reference has no distributed layer (SURVEY.md §2.4); this is the
TPU-native exchange the build plan calls for (§7.1): inside ``shard_map``
each device buckets its local rows by target partition (hash % dp), packs a
fixed-capacity [dp, cap, ...] send buffer, and a single ``all_to_all``
collective over ICI delivers every bucket to its owner. All shapes are
static (XLA requirement): capacity defaults to the local row count, which is
exact for any skew; callers with known-uniform keys can pass a smaller
capacity for less memory/ICI traffic.

Padding rows are marked invalid via a validity mask that travels with the
payload, so downstream operators (join/aggregate) mask them out — the same
"masks everywhere" strategy the engine uses for batch padding
(SURVEY.md §7.3).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _pack_buckets(part: jnp.ndarray, payload: list, ndev: int, cap: int):
    """Sort local rows by target partition and pack [ndev, cap] buckets."""
    n = part.shape[0]
    order = jnp.argsort(part)
    part_sorted = part[order]
    # position of each row within its partition segment
    ranks = jnp.arange(n) - jnp.searchsorted(part_sorted, part_sorted, side="left")
    valid = ranks < cap
    # destination slot inside the send buffer
    slot = part_sorted * cap + jnp.minimum(ranks, cap - 1)
    send_valid = jnp.zeros((ndev * cap,), dtype=bool).at[slot].max(valid)
    packed = []
    for arr in payload:
        arr_sorted = arr[order]
        buf = jnp.zeros((ndev * cap,) + arr.shape[1:], dtype=arr.dtype)
        buf = buf.at[slot].set(jnp.where(
            valid.reshape((-1,) + (1,) * (arr.ndim - 1)), arr_sorted, 0))
        packed.append(buf.reshape((ndev, cap) + arr.shape[1:]))
    return packed, send_valid.reshape(ndev, cap)


def skew_split_partitions(part: jnp.ndarray, ndev: int,
                          axis_name: str = "dp",
                          hot_factor: float = 4.0) -> jnp.ndarray:
    """Histogram-based skew mitigation (SURVEY.md §7.3): partitions whose
    GLOBAL row count exceeds ``hot_factor ×`` the mean partition load are
    spread round-robin across all devices instead of hashing to one owner.

    Correct for decomposable aggregates: the pipeline's final psum merges the
    per-device partials of a split partition. Must run inside shard_map
    (uses a psum over ``axis_name``)."""
    n_local = part.shape[0]
    counts = jax.ops.segment_sum(
        jnp.ones_like(part, jnp.float32), part, num_segments=ndev
    )
    global_counts = jax.lax.psum(counts, axis_name)
    mean_load = jnp.sum(global_counts) / ndev
    hot_parts = global_counts > hot_factor * mean_load  # [ndev] bool
    is_hot = hot_parts[part]
    spread = (part + jax.lax.broadcasted_iota(jnp.int32, (n_local, 1), 0)
              .reshape(n_local)) % ndev
    return jnp.where(is_hot, spread, part)


def make_shuffle(mesh: Mesh, num_payload: int, cap: int):
    """Build a jittable shuffle fn over `mesh`'s dp axis.

    Returns fn(part_ids, *payload) -> (valid_mask, *payload_shuffled) where
    part_ids are target device indices in [0, dp); outputs have local shape
    [dp*cap] per device (rows received from every source device),
    with valid_mask False on padding.
    """
    ndev = mesh.shape["dp"]

    def local_fn(part, *payload):
        part = part.astype(jnp.int32) % ndev
        packed, send_valid = _pack_buckets(part, list(payload), ndev, cap)
        recv_valid = jax.lax.all_to_all(
            send_valid, "dp", split_axis=0, concat_axis=0, tiled=False
        )
        out = []
        for buf in packed:
            r = jax.lax.all_to_all(buf, "dp", split_axis=0, concat_axis=0,
                                   tiled=False)
            out.append(r.reshape((ndev * cap,) + r.shape[2:]))
        return (recv_valid.reshape(ndev * cap), *out)

    in_specs = (P("dp"),) + tuple(P("dp") for _ in range(num_payload))
    out_specs = (P("dp"),) + tuple(P("dp") for _ in range(num_payload))
    return shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)


def shuffle_by_hash(mesh: Mesh, key_hash, payload: list, cap: int | None = None):
    """Convenience wrapper: repartition payload arrays by key_hash % dp."""
    ndev = mesh.shape["dp"]
    n = key_hash.shape[0]
    local_n = n // ndev
    if cap is None:
        cap = local_n  # exact under any skew
    fn = make_shuffle(mesh, len(payload), cap)
    part = (key_hash % jnp.uint32(ndev)).astype(jnp.int32)
    sharding = NamedSharding(mesh, P("dp"))
    part = jax.device_put(part, sharding)
    payload = [jax.device_put(a, NamedSharding(mesh, P("dp", *[None] * (a.ndim - 1))))
               for a in payload]
    return fn(part, *payload)
