"""Device (TPU) group-id assignment for hash aggregation.

Sort-based, like the device join (SURVEY.md §7.3: prefer sort over scatter
on TPU): encode group keys to int64, sort, mark segment boundaries, prefix-
sum to dense ids, and invert the permutation. The only host syncs are the
group count and the final id arrays (needed by the host-side aggregate
finishers)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .device_join import _device_key_columns, _encode_keys, narrow_keys32


@jax.jit
def _group_ids_sorted(keys):
    order = jnp.argsort(keys)
    ks = keys[order]
    boundary = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (ks[1:] != ks[:-1]).astype(jnp.int32)]
    )
    dense_sorted = jnp.cumsum(boundary) - 1
    # scatter back to original order
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    dense = dense_sorted[inv]
    n_groups = dense_sorted[-1] + 1
    # representative (first occurrence in sorted order) per group
    first_sorted = jnp.where(boundary == 1, order, order.shape[0])
    return dense, n_groups, first_sorted, boundary


def group_ids_device(key_cols: list, n_rows: int) -> tuple:
    """Device analog of aggregate.group_ids_host: (groups[int64],
    first_row_indices). Group ids are dense in sorted-key order."""
    if n_rows == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    [key_cols] = _device_key_columns(key_cols)  # VARCHAR → dict codes
    [keys32] = narrow_keys32(_encode_keys(key_cols))
    keys = jnp.asarray(keys32)
    # one batched device→host transfer (per-array np.asarray costs a round
    # trip each on the tunneled platform)
    dense, n_groups, first_sorted, boundary = jax.device_get(
        _group_ids_sorted(keys))
    dense = np.asarray(dense, np.int64)
    boundary = np.asarray(boundary)
    first_sorted = np.asarray(first_sorted, np.int64)
    firsts = first_sorted[boundary == 1]
    return dense, firsts
