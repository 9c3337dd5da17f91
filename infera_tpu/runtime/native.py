"""ctypes binding to the native host library (libinfera_host.so).

Builds the C++ data plane on first use (g++ -O3) and falls back to pure
numpy implementations when no toolchain is available — the API surface is
identical either way, so callers never branch. Mirrors the role of the
reference's Rust core + C ABI (SURVEY.md §2.1 N1/N7/N8) for host-side work;
device compute remains XLA/Pallas.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

from .. import log

_SRC = Path(__file__).parent / "src" / "infera_host.cpp"
_LIB_DIR = Path(__file__).parent / "_build"
_LIB = _LIB_DIR / "libinfera_host.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        _LIB_DIR.mkdir(exist_ok=True)
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            str(_SRC), "-o", str(_LIB), "-pthread",
        ]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            log.warn(f"native build failed: {res.stderr[:500]}")
            return False
        return True
    except (OSError, subprocess.SubprocessError) as e:
        log.warn(f"native build unavailable: {e}")
        return False


def get_lib():
    """The loaded native library, or None (numpy fallback)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists():
            src_mtime = _SRC.stat().st_mtime if _SRC.exists() else 0
            if not _SRC.exists() or not _build():
                return None
            del src_mtime
        elif _SRC.exists() and _SRC.stat().st_mtime > _LIB.stat().st_mtime:
            _build()  # stale; rebuild best-effort
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            log.warn(f"failed to load native lib: {e}")
            return None
        lib.infera_host_abi_version.restype = ctypes.c_int
        if lib.infera_host_abi_version() not in (1, 2):
            log.warn("native lib ABI mismatch; using numpy fallback")
            return None
        lib.infera_blob_decode_f32.restype = ctypes.c_int
        lib.infera_blob_decode_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.infera_extract_features_f32.restype = ctypes.c_int64
        lib.infera_radix_partition.restype = None
        lib.infera_hash64_i64.restype = None
        if hasattr(lib, "infera_csv_parse_numeric"):  # ABI 2+
            lib.infera_csv_parse_numeric.restype = ctypes.c_int64
            lib.infera_csv_parse_numeric.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_char,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64,
            ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# public API (native with numpy fallback)
# ---------------------------------------------------------------------------

def blob_decode_f32(blob: bytes) -> np.ndarray | None:
    """Decode little-endian f32 bytes; None if length % 4 != 0."""
    if len(blob) % 4 != 0:
        return None
    lib = get_lib()
    if lib is None:
        return np.frombuffer(blob, dtype="<f4").copy()
    out = np.empty(len(blob) // 4, dtype=np.float32)
    rc = lib.infera_blob_decode_f32(
        blob, len(blob), out.ctypes.data_as(ctypes.c_void_p)
    )
    if rc != 0:
        return None
    return out


_TYPE_CODES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float64): 1,
    np.dtype(np.int32): 2,
    np.dtype(np.int64): 3,
    np.dtype(np.uint8): 4,
    np.dtype(np.bool_): 4,
}


def extract_features_f32(columns: list, validities: list) -> tuple:
    """Stack typed columns into a row-major f32 matrix.

    Returns (matrix, first_null) where first_null is None or (row, col) of
    the first NULL cell (callers raise the reference's "Feature values
    cannot be NULL" error).
    """
    rows = len(columns[0]) if columns else 0
    ncols = len(columns)
    lib = get_lib()
    if lib is None:
        for c, v in enumerate(validities):
            if v is not None and not v.all():
                r = int(np.argmin(v))
                return None, (r, c)
        out = np.empty((rows, ncols), dtype=np.float32)
        for c, col in enumerate(columns):
            out[:, c] = col.astype(np.float32)
        return out, None

    col_ptrs = (ctypes.c_void_p * ncols)()
    type_codes = np.empty(ncols, dtype=np.int32)
    val_ptrs = (ctypes.c_void_p * ncols)()
    holds = []
    for c, col in enumerate(columns):
        code = _TYPE_CODES.get(col.dtype)
        if code is None:
            col = col.astype(np.float64)
            code = 1
        col = np.ascontiguousarray(col)
        holds.append(col)
        col_ptrs[c] = col.ctypes.data_as(ctypes.c_void_p)
        type_codes[c] = code
        v = validities[c]
        if v is None:
            val_ptrs[c] = None
        else:
            v = np.ascontiguousarray(v.astype(np.uint8))
            holds.append(v)
            val_ptrs[c] = v.ctypes.data_as(ctypes.c_void_p)
    out = np.empty((rows, ncols), dtype=np.float32)
    rc = lib.infera_extract_features_f32(
        col_ptrs,
        type_codes.ctypes.data_as(ctypes.c_void_p),
        val_ptrs,
        ctypes.c_int64(rows),
        ctypes.c_int64(ncols),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc > 0:
        flat = int(rc) - 1
        return None, (flat // ncols, flat % ncols)
    if rc < 0:
        raise ValueError("unsupported column type in native extract")
    return out, None


def hash64_i64(keys: np.ndarray) -> np.ndarray:
    lib = get_lib()
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    if lib is None:
        from ..ops.hashing import _mix64_np

        return _mix64_np(keys.view(np.uint64))
    out = np.empty(len(keys), dtype=np.uint64)
    lib.infera_hash64_i64(
        keys.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(keys)),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def radix_partition(hashes: np.ndarray, parts: int) -> tuple:
    """Returns (counts[parts], indices[n]) — row indices grouped by
    partition (stable)."""
    hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
    lib = get_lib()
    if lib is None:
        p = (hashes % np.uint64(parts)).astype(np.int64)
        counts = np.bincount(p, minlength=parts).astype(np.int64)
        indices = np.argsort(p, kind="stable").astype(np.int64)
        return counts, indices
    counts = np.empty(parts, dtype=np.int64)
    indices = np.empty(len(hashes), dtype=np.int64)
    lib.infera_radix_partition(
        hashes.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(hashes)),
        ctypes.c_int32(parts),
        counts.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
    )
    return counts, indices


def csv_parse_numeric(body: bytes, ncols: int, delimiter: str = ","):
    """Native parse of an unquoted all-numeric CSV body (bytes after the
    header) into (values [ncols, n_rows] f64, valid [ncols, n_rows] bool,
    is_float [ncols] bool — False means every field was integer-syntax).
    Returns None when the native lib is absent or the buffer needs the
    general reader (quotes, ragged rows, non-numeric fields)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "infera_csv_parse_numeric"):
        return None
    n_rows_cap = body.count(b"\n") + 1
    out = np.empty((ncols, n_rows_cap), np.float64)
    nulls = np.empty((ncols, n_rows_cap), np.uint8)
    float_flags = np.zeros(ncols, np.uint8)
    n = lib.infera_csv_parse_numeric(
        body, len(body), delimiter.encode()[:1],
        ncols,
        out.ctypes.data_as(ctypes.c_void_p),
        nulls.ctypes.data_as(ctypes.c_void_p),
        float_flags.ctypes.data_as(ctypes.c_void_p),
        n_rows_cap,
    )
    if n < 0:
        return None
    return out[:, :n].copy(), nulls[:, :n].astype(bool), float_flags.astype(bool)
