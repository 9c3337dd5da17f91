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


# --- 64-bit splitmix emulation in 32-bit limbs (device HLL parity) --------
# The host HLL (ops/aggregate._agg_approx_count_distinct) hashes with
# splitmix64 over the value's int64/f64 bit pattern. TPUs run with x64
# disabled, so the device reproduces the SAME hash — bit-exactly — on
# (hi, lo) uint32 limb pairs: 64-bit xor/shift are limb-local, and the
# 64-bit multiply decomposes into 16-bit partial products.

def _mul32_hi_lo(jnp, a, b):
    """Full 32x32 -> 64 product of uint32 arrays as (hi, lo) uint32."""
    a_lo = a & jnp.uint32(0xFFFF)
    a_hi = a >> jnp.uint32(16)
    b_lo = b & jnp.uint32(0xFFFF)
    b_hi = b >> jnp.uint32(16)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = (ll >> jnp.uint32(16)) + (lh & jnp.uint32(0xFFFF)) \
        + (hl & jnp.uint32(0xFFFF))
    lo = (ll & jnp.uint32(0xFFFF)) | (mid << jnp.uint32(16))
    hi = hh + (lh >> jnp.uint32(16)) + (hl >> jnp.uint32(16)) \
        + (mid >> jnp.uint32(16))
    return hi, lo


def _mul64(jnp, xh, xl, ch, cl):
    """(xh, xl) * (ch, cl) mod 2^64 as (hi, lo) uint32."""
    p_hi, p_lo = _mul32_hi_lo(jnp, xl, cl)
    hi = p_hi + xl * ch + xh * cl  # mod-2^32 wrap is the mod-2^64 wrap
    return hi, p_lo


def _shr64(jnp, hi, lo, k):
    """(hi, lo) >> k for 0 < k < 32."""
    return hi >> jnp.uint32(k), (lo >> jnp.uint32(k)) | (
        hi << jnp.uint32(32 - k))


def splitmix64_device(jnp, hi, lo):
    """splitmix64 finalizer on (hi, lo) uint32 limbs — bit-exact with
    _mix64_np."""
    sh, sl = _shr64(jnp, hi, lo, 30)
    hi, lo = hi ^ sh, lo ^ sl
    hi, lo = _mul64(jnp, hi, lo, jnp.uint32(0xBF58476D),
                    jnp.uint32(0x1CE4E5B9))
    sh, sl = _shr64(jnp, hi, lo, 27)
    hi, lo = hi ^ sh, lo ^ sl
    hi, lo = _mul64(jnp, hi, lo, jnp.uint32(0x94D049BB),
                    jnp.uint32(0x133111EB))
    sh, sl = _shr64(jnp, hi, lo, 31)
    return hi ^ sh, lo ^ sl


def value_bits64_device(jnp, jax, x, src_dtype: str):
    """The (hi, lo) uint32 limbs of the HOST hash input for a column that
    arrived on device as f32/int32: float columns hash their float64 bit
    pattern (widening f32->f64 is exact: sign | rebased exponent |
    mantissa << 29), integer columns their sign-extended int64 bits.
    Matches hash_array_host's canonicalization (-0.0 -> +0.0, NaN ->
    0x7FF8000000000000)."""
    if src_dtype.startswith("float") or src_dtype in ("f4", "f8"):
        # all canonicalization happens on the BITS: float arithmetic (even
        # a == 0.0 compare) flushes f32 denormals on TPU/XLA-CPU, which
        # would zero them before the bitcast
        b = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32),
                                         jnp.uint32)
        b = jnp.where(b == jnp.uint32(0x80000000), jnp.uint32(0), b)
        sign = b & jnp.uint32(0x80000000)
        expo = (b >> jnp.uint32(23)) & jnp.uint32(0xFF)
        mant = b & jnp.uint32(0x7FFFFF)
        # normal f32 -> f64: e64 = e32 - 127 + 1023; mantissa << 29
        e64 = expo + jnp.uint32(896)
        hi = sign | (e64 << jnp.uint32(20)) | (mant >> jnp.uint32(3))
        lo = mant << jnp.uint32(29)
        # zero (expo==0, mant==0): all-zero payload (sign cleared above)
        is_zero = (expo == 0) & (mant == 0)
        hi = jnp.where(is_zero, jnp.uint32(0), hi)
        lo = jnp.where(is_zero, jnp.uint32(0), lo)
        # f32 denormals (value = mant * 2^-149) normalize in f64: top set
        # bit t (via clz) gives unbiased exponent t - 149, the remaining
        # bits shift to the 52-bit f64 mantissa
        is_den = (expo == 0) & (mant != 0)
        mi = mant.astype(jnp.int32)
        t = (jnp.int32(31) - jax.lax.clz(jnp.maximum(mi, 1))).astype(
            jnp.uint32)
        m = (mant ^ (jnp.uint32(1) << t))
        sft = jnp.uint32(52) - t  # in [30, 52]
        hi_part = jnp.where(sft >= 32, m << (sft - jnp.uint32(32)),
                            m >> (jnp.uint32(32) - jnp.minimum(
                                sft, jnp.uint32(31))))
        lo_d = jnp.where(sft >= 32, jnp.uint32(0), m << sft)
        e_den = t + jnp.uint32(874)
        hi_d = sign | (e_den << jnp.uint32(20)) | hi_part
        hi = jnp.where(is_den, hi_d, hi)
        lo = jnp.where(is_den, lo_d, lo)
        # inf: e64 saturates at 0x7FF (the +896 rebias only holds for
        # normals); NaN -> canonical 0x7FF8000000000000
        is_inf = (expo == jnp.uint32(0xFF)) & (mant == 0)
        hi = jnp.where(is_inf, sign | jnp.uint32(0x7FF00000), hi)
        lo = jnp.where(is_inf, jnp.uint32(0), lo)
        is_nan = (expo == jnp.uint32(0xFF)) & (mant != 0)
        hi = jnp.where(is_nan, jnp.uint32(0x7FF80000), hi)
        lo = jnp.where(is_nan, jnp.uint32(0), lo)
        return hi, lo
    xi = jnp.asarray(x, jnp.int32)
    lo = jax.lax.bitcast_convert_type(xi, jnp.uint32)
    hi = jnp.where(xi < 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    return hi, lo
