"""Sort operators.

ORDER BY sort-key computation: host lexsort for small/mixed-type inputs,
device argsort (XLA's TPU sort) for large numeric keys. XLA's sort on TPU is
a tuned bitonic network — a hand-written Pallas radix sort was evaluated and
offers no headroom at these widths, so the device path delegates to
lax.sort via jnp.argsort (SURVEY.md §7.3 "sort-based fallbacks").
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DEVICE_SORT_THRESHOLD = 1 << 15


def _key_levels(key: np.ndarray) -> list:
    """Decompose one key column into f32 'digit' levels whose lexicographic
    order equals the key's value order.

    The device sorts in f32 (x64 is disabled in JAX), which is only exact
    for |ints| ≤ 2^24 and for f32 data. Wider integers split into 2^24-radix
    digits (exact for the full 64-bit range); f64 splits into a
    double-double (hi, residual) pair (~48 significant bits)."""
    if key.dtype.kind in "iub":
        lo_v, hi_v = (int(key.min()), int(key.max())) if len(key) else (0, 0)
        if -(1 << 24) <= lo_v and hi_v <= (1 << 24):
            return [key.astype(np.float32)]
        # order-preserving unsigned mapping, then 2^24-radix digits
        u = key.astype(np.int64).astype(np.uint64) ^ np.uint64(1 << 63)
        mask = np.uint64((1 << 24) - 1)
        return [
            ((u >> np.uint64(shift)) & mask).astype(np.float32)
            for shift in (48, 24, 0)
        ]
    if key.dtype == np.float64:
        hi = key.astype(np.float32)
        lo = (key - hi.astype(np.float64)).astype(np.float32)
        return [hi, lo]
    return [key.astype(np.float32)]


def argsort_device(keys: list, ascending: list, nulls_first: list,
                   valid_masks: list, head: int | None = None) -> np.ndarray:
    """Composite argsort of numeric key columns on device.

    Each key expands to one or more exact f32 levels (_key_levels) and the
    composite sorts via repeated stable argsort, least-significant level
    first (direction and NULL sentinels applied to every level of a key, so
    lexicographic order over the levels matches the key's SQL order).

    ``head``: ORDER BY ... LIMIT k reads back only the first k indices —
    on the tunneled platform the [n] permutation readback (not the sort)
    dominates top-k latency (VERDICT r4 item 4)."""
    n = len(keys[0])
    order = jnp.arange(n)
    levels = []
    for key, asc, nf, valid in zip(keys, ascending, nulls_first, valid_masks):
        for lv in _key_levels(np.asarray(key)):
            levels.append((lv, asc, nf, valid))
    for lv, asc, nf, valid in reversed(levels):
        vals = jnp.asarray(lv, jnp.float32)
        if not asc:
            vals = -vals
        sentinel = jnp.float32(-np.inf if nf else np.inf)
        if valid is not None:
            vals = jnp.where(jnp.asarray(valid), vals, sentinel)
        permuted = vals[order]
        idx = jnp.argsort(permuted, stable=True)
        order = order[idx]
    if head is not None and head < n:
        order = order[:head]
    return np.asarray(order, np.int64)


def sort_rows(keys: list, ascending: list, nulls_first: list,
              valid_masks: list, n_rows: int,
              head: int | None = None) -> np.ndarray:
    """Dispatch between host lexsort and device sort. ``head`` truncates
    the returned permutation (ORDER BY ... LIMIT) so callers gather only
    the surviving rows."""
    numeric = all(k.dtype != object for k in keys)
    if numeric and n_rows >= DEVICE_SORT_THRESHOLD:
        return argsort_device(keys, ascending, nulls_first, valid_masks,
                              head=head)
    encoded = []
    for key, asc, nf, valid in zip(keys, ascending, nulls_first, valid_masks):
        if key.dtype == object:
            ranks = np.argsort(np.argsort([str(v) for v in key]))
            vals = ranks.astype(np.float64)
        else:
            vals = key.astype(np.float64)
        if not asc:
            vals = -vals
        sentinel = -np.inf if nf else np.inf
        if valid is not None:
            vals = np.where(valid, vals, sentinel)
        encoded.append(vals)
    order = np.lexsort(list(reversed(encoded)))
    return order[:head] if head is not None else order
