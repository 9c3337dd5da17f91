"""Native host-runtime tests: the C++ data plane must agree exactly with the
numpy fallback (same ABI surface, SURVEY.md §7.1 native-code row)."""

import numpy as np
import pytest

from infera_tpu.ops.hashing import _mix64_np
from infera_tpu.runtime import native


def test_native_builds_and_loads():
    # This environment ships g++, so the native path must be live.
    assert native.native_available()


def test_blob_decode_roundtrip():
    vals = np.array([1.5, -2.25, 3.75], "<f4")
    out = native.blob_decode_f32(vals.tobytes())
    np.testing.assert_array_equal(out, vals)
    assert native.blob_decode_f32(b"\x00" * 5) is None


def test_extract_features_types_and_nulls():
    cols = [
        np.array([1.0, 2.0], np.float32),
        np.array([3.0, 4.0], np.float64),
        np.array([5, 6], np.int32),
        np.array([7, 8], np.int64),
        np.array([True, False]),
    ]
    m, first_null = native.extract_features_f32(cols, [None] * 5)
    assert first_null is None
    np.testing.assert_array_equal(
        m, np.array([[1, 3, 5, 7, 1], [2, 4, 6, 8, 0]], np.float32)
    )
    m2, pos = native.extract_features_f32(
        [np.array([1.0, 2.0]), np.array([3.0, 4.0])],
        [None, np.array([True, False])],
    )
    assert m2 is None and pos == (1, 1)


def test_hash_matches_python_mix():
    keys = np.random.default_rng(0).integers(-(2**62), 2**62, 1000)
    native_h = native.hash64_i64(keys)
    py_h = _mix64_np(keys.astype(np.int64).view(np.uint64))
    np.testing.assert_array_equal(native_h, py_h)


def test_radix_partition_stable_and_complete():
    rng = np.random.default_rng(1)
    h = native.hash64_i64(rng.integers(0, 1 << 40, 5000))
    parts = 16
    counts, indices = native.radix_partition(h, parts)
    assert counts.sum() == len(h)
    assert sorted(indices.tolist()) == list(range(len(h)))
    # rows grouped by partition, stable within partitions
    off = 0
    for p in range(parts):
        seg = indices[off : off + counts[p]]
        assert (h[seg] % parts == p).all()
        assert (np.diff(seg) > 0).all()  # stability = ascending original order
        off += counts[p]


def test_engine_blob_path_uses_native(model_dir, clean_registry):
    import infera_tpu as it

    it.load_model("linear", f"{model_dir}/linear.onnx")
    blob = np.array([1.0, 2.0, 3.0], "<f4").tobytes()
    res = it.predict_from_blob("linear", blob)
    assert abs(float(res.data[0]) - 1.75) < 1e-5
