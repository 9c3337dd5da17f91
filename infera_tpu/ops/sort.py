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


def argsort_device(keys: list, ascending: list, nulls_first: list,
                   valid_masks: list) -> np.ndarray:
    """Composite argsort of numeric key columns on device.

    Encodes (validity, direction) into a single f64 composite per key level
    and lexsorts via repeated stable argsort, least-significant key first.
    """
    n = len(keys[0])
    order = jnp.arange(n)
    # least-significant key first; jnp.argsort(stable=True) preserves prior
    for key, asc, nf, valid in reversed(list(zip(keys, ascending, nulls_first,
                                                 valid_masks))):
        vals = jnp.asarray(key, jnp.float64 if key.dtype == np.float64 else jnp.float32)
        vals = vals.astype(jnp.float32)
        if not asc:
            vals = -vals
        sentinel = jnp.float32(-np.inf if nf else np.inf)
        if valid is not None:
            vals = jnp.where(jnp.asarray(valid), vals, sentinel)
        permuted = vals[order]
        idx = jnp.argsort(permuted, stable=True)
        order = order[idx]
    return np.asarray(order, np.int64)


def sort_rows(keys: list, ascending: list, nulls_first: list,
              valid_masks: list, n_rows: int) -> np.ndarray:
    """Dispatch between host lexsort and device sort."""
    numeric = all(k.dtype != object for k in keys)
    if numeric and n_rows >= DEVICE_SORT_THRESHOLD:
        return argsort_device(keys, ascending, nulls_first, valid_masks)
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
    return np.lexsort(list(reversed(encoded)))
