"""Device (TPU) inner equi-join.

TPUs favor sort-based joins over scatter-heavy hash tables (SURVEY.md §7.3):
this implementation sorts the build side by key, binary-searches the probe
side (vectorized searchsorted lowers to XLA while-free gather compare), and
expands duplicate matches with a prefix-sum + gather — no dynamic memory, no
scatter. The only host sync is the output cardinality (required to
materialize a static-shape result).

64-bit keys are composed from multiple 32-bit column hashes; collision-free
for exact keys because we join on the *encoded key* (single int64 per row),
falling back to composing multi-column keys by mixing into 64 bits and
verifying equality on the payload when needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np



def _encode_keys(cols: list) -> np.ndarray:
    """Encode join key columns into a single int64 array (exact for ints
    that fit 64 bits and for f32/f64 values by bit pattern)."""
    if len(cols) == 1:
        c = cols[0]
        if c.data.dtype.kind in "iub":
            return c.data.astype(np.int64)
        if c.data.dtype.kind == "f":
            # bit-pattern equality == value equality for non-NaN canonical floats
            d = c.data.astype(np.float64)
            d = np.where(d == 0.0, 0.0, d)
            return d.view(np.int64)
    # multi-column: combine via hashing (exactness verified by the caller for
    # pathological collision cases; 64-bit mix collisions are ~2^-64)
    from .hashing import hash_columns_host

    return hash_columns_host(cols).view(np.int64)


def narrow_keys32(*key_arrays: np.ndarray) -> list:
    """Reduce int64 key arrays to a SHARED exact int32 encoding.

    JAX runs with x64 disabled, so a device transfer of int64 keys silently
    truncates to the low 32 bits — merging distinct keys whose encodings
    share them (e.g. the f64 bit patterns of 1.45 and 1.95). Keys already
    within int32 range pass through; otherwise a joint np.unique rank remap
    yields collision-free int32 keys (rank order preserves key order, so
    sort-based device paths stay valid)."""
    arrays = [np.ascontiguousarray(a, np.int64) for a in key_arrays]
    lo = min((int(a.min()) for a in arrays if a.size), default=0)
    hi = max((int(a.max()) for a in arrays if a.size), default=0)
    if lo >= -(1 << 31) and hi < (1 << 31):
        return [a.astype(np.int32) for a in arrays]
    allk = np.concatenate(arrays) if len(arrays) > 1 else arrays[0]
    _, inv = np.unique(allk, return_inverse=True)
    inv = inv.astype(np.int32)
    out, off = [], 0
    for a in arrays:
        out.append(inv[off:off + len(a)])
        off += len(a)
    return out


def dict_encode_strings(*arrays: np.ndarray) -> list:
    """Exact shared dictionary encoding of string (object-dtype) key arrays
    → int32 codes (np.unique rank; order-preserving, collision-free). The
    device data path then treats VARCHAR keys like any integer key."""
    sizes = [len(a) for a in arrays]
    allv = np.concatenate([np.asarray(a, object) for a in arrays]) if len(arrays) > 1 \
        else np.asarray(arrays[0], object)
    _, inv = np.unique(allv.astype("U"), return_inverse=True)
    inv = inv.astype(np.int32)
    out, off = [], 0
    for s in sizes:
        out.append(inv[off:off + s])
        off += s
    return out


def _device_key_columns(*col_lists):
    """Per key position, replace object-dtype columns with shared int32
    dictionary-code columns (device-eligible); numeric columns pass through.
    col_lists are parallel lists (e.g. left keys / right keys)."""
    from ..columnar import Column
    from ..columnar import types as T

    out = [list(cols) for cols in col_lists]
    for pos in range(len(col_lists[0])):
        cols = [cl[pos] for cl in col_lists]
        if any(c.data.dtype == object for c in cols):
            codes = dict_encode_strings(*[c.data for c in cols])
            for li, code in enumerate(codes):
                out[li][pos] = Column(code.astype(np.int64), T.BIGINT)
    return out


def inner_join_indices_device(left_keys: np.ndarray, right_keys: np.ndarray):
    """Return (li, ri) index arrays of matching pairs, computed on device."""
    lk = jnp.asarray(left_keys)
    rk = jnp.asarray(right_keys)

    n_right = rk.shape[0]

    @jax.jit
    def phase1(lk, rk):
        order = jnp.argsort(rk)
        rk_sorted = rk[order]
        lb = jnp.searchsorted(rk_sorted, lk, side="left")
        ub = jnp.searchsorted(rk_sorted, lk, side="right")
        cnt = ub - lb
        offsets = jnp.cumsum(cnt)
        return order, rk_sorted, lb, cnt, offsets

    order, rk_sorted, lb, cnt, offsets = phase1(lk, rk)
    total = int(offsets[-1]) if offsets.shape[0] else 0  # one scalar sync
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    @jax.jit
    def phase2(order, lb, cnt, offsets):
        excl = offsets - cnt  # exclusive prefix
        pos = jnp.arange(total)
        li = jnp.searchsorted(offsets, pos, side="right")
        within = pos - excl[li]
        ri = order[lb[li] + within]
        return li, ri

    li, ri = jax.device_get(phase2(order, lb, cnt, offsets))  # one transfer
    del n_right
    return np.asarray(li, np.int64), np.asarray(ri, np.int64)


def left_join_indices_device(left_keys: np.ndarray, right_keys: np.ndarray):
    """LEFT OUTER join pairs on device: every left row appears; unmatched
    rows carry ri = -1 (NULL marker). Same sort + searchsorted + prefix-sum
    expansion as the inner join, with per-left output count max(cnt, 1)."""
    lk = jnp.asarray(left_keys)
    rk = jnp.asarray(right_keys)
    n_right = int(rk.shape[0])

    @jax.jit
    def phase1(lk, rk):
        order = jnp.argsort(rk)
        rk_sorted = rk[order]
        lb = jnp.searchsorted(rk_sorted, lk, side="left")
        ub = jnp.searchsorted(rk_sorted, lk, side="right")
        cnt = ub - lb
        offsets = jnp.cumsum(jnp.maximum(cnt, 1))
        return order, lb, cnt, offsets

    order, lb, cnt, offsets = phase1(lk, rk)
    total = int(offsets[-1]) if offsets.shape[0] else 0
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    @jax.jit
    def phase2(order, lb, cnt, offsets):
        excl = offsets - jnp.maximum(cnt, 1)
        pos = jnp.arange(total)
        li = jnp.searchsorted(offsets, pos, side="right")
        within = pos - excl[li]
        matched = within < cnt[li]
        gather = jnp.minimum(lb[li] + within, n_right - 1)
        ri = jnp.where(matched, order[gather], -1)
        return li, ri

    li, ri = jax.device_get(phase2(order, lb, cnt, offsets))
    return np.asarray(li, np.int64), np.asarray(ri, np.int64)


def _unmatched_mask_device(probe_keys: np.ndarray, build_keys: np.ndarray):
    """Boolean mask over probe rows with NO equal key on the build side."""
    pk = jnp.asarray(probe_keys)
    bk = jnp.asarray(build_keys)

    @jax.jit
    def run(pk, bk):
        bs = jnp.sort(bk)
        lb = jnp.searchsorted(bs, pk, side="left")
        ub = jnp.searchsorted(bs, pk, side="right")
        return (ub - lb) == 0

    return np.asarray(jax.device_get(run(pk, bk)), bool)


def device_join_indices(lkey_cols: list, rkey_cols: list, kind: str = "INNER"):
    """SQL-layer entry: equi-join on Column lists; returns (li, ri) numpy
    index arrays where -1 marks the NULL side of an outer row. Handles
    INNER / LEFT / RIGHT / FULL and many-to-many duplicates (prefix-sum
    expansion). VARCHAR keys dictionary-encode (shared across both sides)."""
    lkey_cols, rkey_cols = _device_key_columns(lkey_cols, rkey_cols)
    lk, rk = narrow_keys32(_encode_keys(lkey_cols), _encode_keys(rkey_cols))
    if kind == "INNER":
        return inner_join_indices_device(lk, rk)
    if kind == "LEFT":
        return left_join_indices_device(lk, rk)
    if kind == "RIGHT":
        ri, li = left_join_indices_device(rk, lk)
        return li, ri
    if kind == "FULL":
        li, ri = left_join_indices_device(lk, rk)
        lonely = np.flatnonzero(_unmatched_mask_device(rk, lk))
        if len(lonely):
            li = np.concatenate([li, np.full(len(lonely), -1, np.int64)])
            ri = np.concatenate([ri, lonely.astype(np.int64)])
        return li, ri
    raise ValueError(f"unsupported join kind {kind}")


def device_inner_join_indices(lkey_cols: list, rkey_cols: list):
    """SQL-layer entry: join on Column lists; returns (li, ri) numpy arrays.
    VARCHAR keys dictionary-encode (shared dictionary across both sides)."""
    return device_join_indices(lkey_cols, rkey_cols, "INNER")
