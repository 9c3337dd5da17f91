"""Unit tests for the dependency-free ONNX protobuf codec."""

import numpy as np
import pytest

from infera_tpu.onnx import builder, proto


def test_linear_model_roundtrip(tmp_path):
    m = builder.linear_model()
    p = tmp_path / "linear.onnx"
    proto.save_model_file(m, p)
    m2 = proto.load_model_file(p)
    assert [n.op_type for n in m2.graph.nodes] == ["MatMul", "Add"]
    np.testing.assert_array_equal(
        m2.graph.initializers["W"].array, np.array([[2.0], [-1.0], [0.5]], np.float32)
    )
    np.testing.assert_array_equal(
        m2.graph.initializers["B"].array, np.array([0.25], np.float32)
    )
    assert m2.graph.inputs[0].shape == [1, 3]
    assert m2.graph.outputs[0].shape == [1, 1]


def test_dynamic_batch_dim_roundtrip(tmp_path):
    m = builder.mlp_model(in_dim=4, hidden=(8,), out_dim=2, dynamic_batch=True)
    p = tmp_path / "mlp.onnx"
    proto.save_model_file(m, p)
    m2 = proto.load_model_file(p)
    # dynamic dims parse as -1 (engine.rs:64-73 semantics)
    assert m2.graph.inputs[0].shape == [-1, 4]
    assert m2.graph.outputs[0].shape == [-1, 2]


def test_varint_negative_int64():
    out = bytearray()
    proto._w_int_field(out, 1, -1)
    fields = list(proto._iter_fields(bytes(out)))
    assert fields == [(1, 0, -1)]


def test_attribute_kinds_roundtrip():
    for val in [1.5, 7, "abc", [1, 2, 3], [1.0, 2.5], ["x", "y"]]:
        a = proto.Attribute.make("a", val)
        a2 = proto.Attribute.parse(a.serialize())
        assert a2.value == val or a2.value == pytest.approx(val)


def test_tensor_float_data_field():
    # float_data (field 4) encoding path, not raw_data
    out = bytearray()
    proto._w_int_field(out, 1, 2)  # dims
    proto._w_int_field(out, 2, proto.DataType.FLOAT)
    import struct

    proto._w_len_field(out, 4, struct.pack("<2f", 1.5, -2.5))
    t = proto.Tensor.parse(bytes(out))
    np.testing.assert_array_equal(t.array, np.array([1.5, -2.5], np.float32))


def test_truncated_protobuf_raises():
    m = builder.linear_model()
    data = m.serialize()
    with pytest.raises(proto.WireError):
        proto.load_model_bytes(data[: len(data) // 2] + b"\xff\xff\xff\xff\xff\xff")
