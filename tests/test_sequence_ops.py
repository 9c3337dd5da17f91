"""ONNX Sequence / Optional ops — static-structure subset (round 3).

Sequences are trace-time tuples: Split→sequence→Concat round trips, the
construct/at/insert/erase family, length, and optionals all resolve while
tracing; data-dependent positions raise OnnxError (never a wrong answer)."""

import numpy as np
import pytest

from infera_tpu.errors import OnnxError
from infera_tpu.onnx.executor import compile_model_bytes
from infera_tpu.onnx.proto import (Attribute, DataType, Graph, Model, Node,
                                   Tensor, ValueInfo)


def _model(nodes, inputs, outputs, inits=None):
    g = Graph(name="seq", nodes=nodes, initializers=inits or {},
              inputs=inputs, outputs=outputs)
    return Model(graph=g, opset_imports=[("", 17)]).serialize()


def _vi(name, shape):
    return ValueInfo(name=name, elem_type=DataType.FLOAT, shape=list(shape))


def test_split_to_sequence_concat_roundtrip(clean_registry):
    data = _model(
        nodes=[
            Node(op_type="SplitToSequence", inputs=["X"], outputs=["seq"],
                 attributes={"axis": Attribute.make("axis", 1)}),
            Node(op_type="ConcatFromSequence", inputs=["seq"], outputs=["Y"],
                 attributes={"axis": Attribute.make("axis", 1)}),
        ],
        inputs=[_vi("X", [-1, 6])], outputs=[_vi("Y", [-1, 6])])
    m = compile_model_bytes(data, "seq1")
    x = np.random.default_rng(0).standard_normal((4, 6)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(m.run(x)[0]), x)


def test_split_sizes_and_stack(clean_registry):
    split = Tensor.from_array("split", np.asarray([2, 4], np.int64))
    data = _model(
        nodes=[
            Node(op_type="SplitToSequence", inputs=["X", "split"],
                 outputs=["seq"],
                 attributes={"axis": Attribute.make("axis", 1)}),
            Node(op_type="SequenceAt", inputs=["seq", "pos"], outputs=["Y"]),
        ],
        inputs=[_vi("X", [-1, 6])], outputs=[_vi("Y", [-1, 4])],
        inits={"split": split,
               "pos": Tensor.from_array("pos", np.asarray(1, np.int64))})
    m = compile_model_bytes(data, "seq2")
    x = np.random.default_rng(1).standard_normal((3, 6)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(m.run(x)[0]), x[:, 2:])


def test_construct_insert_erase_length(clean_registry):
    data = _model(
        nodes=[
            Node(op_type="SequenceConstruct", inputs=["A", "B"],
                 outputs=["s0"]),
            Node(op_type="SequenceInsert", inputs=["s0", "A", "pos0"],
                 outputs=["s1"]),                      # [A, A, B]
            Node(op_type="SequenceErase", inputs=["s1", "neg1"],
                 outputs=["s2"]),                      # [A, A]
            Node(op_type="ConcatFromSequence", inputs=["s2"], outputs=["Y"],
                 attributes={"axis": Attribute.make("axis", 0),
                             "new_axis": Attribute.make("new_axis", 1)}),
            Node(op_type="SequenceLength", inputs=["s2"], outputs=["L"]),
        ],
        inputs=[_vi("A", [3]), _vi("B", [3])],
        outputs=[_vi("Y", [2, 3]),
                 ValueInfo(name="L", elem_type=DataType.INT64, shape=[])],
        inits={"pos0": Tensor.from_array("pos0", np.asarray(1, np.int64)),
               "neg1": Tensor.from_array("neg1", np.asarray(-1, np.int64))})
    m = compile_model_bytes(data, "seq3")
    a = np.asarray([1.0, 2.0, 3.0], np.float32)
    b = np.asarray([4.0, 5.0, 6.0], np.float32)
    y, ln = m.run(a, b)
    np.testing.assert_allclose(np.asarray(y), np.stack([a, a]))
    assert int(np.asarray(ln)) == 2


def test_optional_ops(clean_registry):
    data = _model(
        nodes=[
            Node(op_type="Optional", inputs=["X"], outputs=["o"]),
            Node(op_type="OptionalHasElement", inputs=["o"], outputs=["H"]),
            Node(op_type="OptionalGetElement", inputs=["o"], outputs=["Y"]),
        ],
        inputs=[_vi("X", [-1, 2])],
        outputs=[ValueInfo(name="H", elem_type=DataType.BOOL, shape=[]),
                 _vi("Y", [-1, 2])])
    m = compile_model_bytes(data, "opt1")
    x = np.ones((2, 2), np.float32)
    h, y = m.run(x)
    assert bool(np.asarray(h)) is True
    np.testing.assert_allclose(np.asarray(y), x)


def test_dynamic_position_raises(clean_registry):
    """A position computed from tensor VALUES cannot compile to static
    shapes — must raise a clear error, not return a wrong answer."""
    data = _model(
        nodes=[
            Node(op_type="SplitToSequence", inputs=["X"], outputs=["seq"],
                 attributes={"axis": Attribute.make("axis", 0)}),
            Node(op_type="SequenceAt", inputs=["seq", "P"], outputs=["Y"]),
        ],
        inputs=[_vi("X", [4, 2]),
                ValueInfo(name="P", elem_type=DataType.INT64, shape=[])],
        outputs=[_vi("Y", [2])])
    m = compile_model_bytes(data, "seq4")
    with pytest.raises(OnnxError) as ei:
        m.run(np.ones((4, 2), np.float32), np.asarray(1, np.int64))
    assert "static" in str(ei.value)


def test_sequence_output_rejected(clean_registry):
    data = _model(
        nodes=[Node(op_type="SplitToSequence", inputs=["X"], outputs=["Y"],
                    attributes={"axis": Attribute.make("axis", 0)})],
        inputs=[_vi("X", [4, 2])], outputs=[_vi("Y", [4, 2])])
    m = compile_model_bytes(data, "seq5")
    with pytest.raises(OnnxError) as ei:
        m.run(np.ones((4, 2), np.float32))
    assert "sequence" in str(ei.value)
