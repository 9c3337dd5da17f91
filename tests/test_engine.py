"""Engine parity tests: the correctness anchors from BASELINE.md pinned by the
reference SQL suite (1.75, identity multi-output, blob error strings)."""

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.errors import (
    BlobShapeMismatch,
    InvalidBlobSize,
    InvalidInputShape,
    ModelNotFound,
)
from infera_tpu.onnx.executor import shape_rows_cols


@pytest.fixture()
def linear(model_dir, clean_registry):
    it.load_model("linear", f"{model_dir}/linear.onnx")
    return "linear"


@pytest.fixture()
def multi_output(model_dir, clean_registry):
    it.load_model("multi_output", f"{model_dir}/multi_output.onnx")
    return "multi_output"


def test_shape_rows_cols():
    # parity with engine.rs:321-328 table test
    assert shape_rows_cols([]) == (1, 1)
    assert shape_rows_cols([5]) == (5, 1)
    assert shape_rows_cols([2, 3]) == (2, 3)
    assert shape_rows_cols([2, 3, 4]) == (2, 12)
    assert shape_rows_cols([1, 1, 1, 1]) == (1, 1)


def test_linear_predict_175(linear):
    # BASELINE.md anchor: y = 2*1 - 2 + 0.5*3 + 0.25 = 1.75
    res = it.predict("linear", [[1.0, 2.0, 3.0]])
    assert res.rows == 1 and res.cols == 1
    assert abs(float(res.data[0]) - 1.75) < 1e-5


def test_linear_predict_batched(linear):
    # The reference can't batch fixed-batch-1 models (ROADMAP §1); we can.
    x = np.random.default_rng(0).standard_normal((100, 3)).astype(np.float32)
    res = it.predict("linear", x)
    assert (res.rows, res.cols) == (100, 1)
    expected = x @ np.array([2.0, -1.0, 0.5], np.float32) + 0.25
    np.testing.assert_allclose(res.data, expected, rtol=1e-5, atol=1e-5)


def test_wrong_cols_error_string(linear):
    with pytest.raises(InvalidInputShape) as ei:
        it.predict("linear", [[1.0, 2.0]])
    assert str(ei.value) == "Invalid input shape: expected batch x [3], got 1 x 2"


def test_model_not_found():
    with pytest.raises(ModelNotFound) as ei:
        it.predict("nope", [[1.0]])
    assert str(ei.value) == "Model not found: nope"


def test_multi_output_identity(multi_output):
    res = it.predict("multi_output", [[1.0, 2.0, 3.0, 4.0]])
    assert (res.rows, res.cols) == (1, 4)
    np.testing.assert_array_equal(res.data, np.array([1, 2, 3, 4], np.float32))


def test_blob_size_error(linear):
    with pytest.raises(InvalidBlobSize) as ei:
        it.predict_from_blob("linear", b"\x00" * 5)
    assert str(ei.value) == "Invalid BLOB size: length must be a multiple of 4"


def test_blob_shape_mismatch_error(linear):
    with pytest.raises(BlobShapeMismatch) as ei:
        it.predict_from_blob("linear", b"\x00" * 16)
    assert str(ei.value) == (
        "BLOB data does not match model's expected input shape. "
        "Expected 3 elements, but BLOB contained 4."
    )


def test_blob_inference(linear):
    blob = np.array([1.0, 2.0, 3.0], np.float32).tobytes()
    res = it.predict_from_blob("linear", blob)
    assert abs(float(res.data[0]) - 1.75) < 1e-5


def test_blob_batched_dynamic(model_dir, clean_registry, tmp_path):
    # dynamic-batch model: batch inferred as len / product(known dims)
    from infera_tpu.onnx import builder, proto

    m = builder.mlp_model(in_dim=3, hidden=(4,), out_dim=2, dynamic_batch=True)
    p = tmp_path / "dyn.onnx"
    proto.save_model_file(m, p)
    it.load_model("dyn", str(p))
    blob = np.ones(6, np.float32).tobytes()  # 2 rows of 3
    res = it.predict_from_blob("dyn", blob)
    assert (res.rows, res.cols) == (2, 2)


def test_metadata_json(linear):
    info = it.get_model_info("linear")
    assert '"input_shape":[1,3]' in info
    assert '"output_shape":[1,1]' in info
    assert '"loaded":true' in info
    assert '"name":"linear"' in info


def test_metadata_missing_model(clean_registry):
    info = it.get_model_info("ghost")
    assert '"error"' in info
    assert "Model not found: ghost" in info


def test_large_batch_splits_into_chunks(model_dir, clean_registry, monkeypatch):
    """Batches above SPLIT_CHUNK_ROWS run chunkwise (uneven tail included)
    and match the unsplit path exactly."""
    import infera_tpu as it
    from infera_tpu import engine as eng

    it.load_model("linear", f"{model_dir}/linear.onnx")
    x = np.random.default_rng(0).standard_normal((1000, 3)).astype(np.float32)
    ref = np.asarray(it.predict("linear", x).data)

    monkeypatch.setattr(eng, "SPLIT_CHUNK_ROWS", 256)  # forces 4 chunks
    got = np.asarray(it.predict("linear", x).data)
    np.testing.assert_array_equal(got, ref)
