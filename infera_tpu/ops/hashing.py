"""Key hashing for join / group-by / partitioning.

Vectorized 64-bit mix hashing over columns. The same function family is used
host-side (numpy) and device-side (jax) so a hash-partitioned shuffle on the
host agrees with device-side repartitioning — a requirement for the
distributed exchange (SURVEY.md §7.1 distributed layer row).
"""

from __future__ import annotations

import jax
import numpy as np

_MULT1 = np.uint64(0xBF58476D1CE4E5B9)
_MULT2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64_np(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constant set)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= _MULT1
        x ^= x >> np.uint64(27)
        x *= _MULT2
        x ^= x >> np.uint64(31)
    return x


def hash_array_host(arr: np.ndarray) -> np.ndarray:
    """Hash one numeric numpy array to uint64."""
    if arr.dtype == object:
        out = np.empty(len(arr), dtype=np.uint64)
        for i, v in enumerate(arr):
            out[i] = np.uint64(hash(v) & 0xFFFFFFFFFFFFFFFF)
        return _mix64_np(out)
    if arr.dtype.kind == "f":
        # canonicalize -0.0 / NaN, then bit-cast
        arr64 = arr.astype(np.float64)
        arr64 = np.where(arr64 == 0.0, 0.0, arr64)
        bits = arr64.view(np.uint64).copy()
        bits[np.isnan(arr64)] = np.uint64(0x7FF8000000000000)
        return _mix64_np(bits)
    if arr.dtype == np.bool_:
        return _mix64_np(arr.astype(np.uint64))
    return _mix64_np(arr.astype(np.int64).view(np.uint64))


def hash_columns_host(cols: list) -> np.ndarray:
    """Combine hashes of several Column objects (validity-aware)."""
    acc = None
    for col in cols:
        h = hash_array_host(col.data)
        valid = col.valid_mask()
        h = np.where(valid, h, np.uint64(0x5555555555555555))
        if acc is None:
            acc = h
        else:
            with np.errstate(over="ignore"):
                acc = _mix64_np(acc ^ (h + _GOLDEN + (acc << np.uint64(6)) + (acc >> np.uint64(2))))
    if acc is None:
        return np.zeros(0, dtype=np.uint64)
    return acc


def hash_array_device(x):
    """Device-side (jax) version of the same splitmix64 mix; operates on
    int32/int64/float32 arrays, returns uint32 hashes (TPU has no native
    64-bit int multiply — use a 32-bit murmur3-style finisher)."""
    import jax.numpy as jnp

    if x.dtype in (jnp.float32, jnp.bfloat16, jnp.float64):
        xi = jnp.asarray(x, jnp.float32)
        xi = jnp.where(xi == 0.0, 0.0, xi)  # -0.0 → +0.0
        h = jax.lax.bitcast_convert_type(xi, jnp.uint32)
    else:
        h = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.int32), jnp.uint32)
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return h


def combine_hashes_device(hashes: list):
    import jax.numpy as jnp

    acc = hashes[0]
    for h in hashes[1:]:
        acc = acc ^ (h + jnp.uint32(0x9E3779B9) + (acc << 6) + (acc >> 2))
        # re-mix
        acc ^= acc >> 16
        acc *= jnp.uint32(0x85EBCA6B)
        acc ^= acc >> 13
    return acc
