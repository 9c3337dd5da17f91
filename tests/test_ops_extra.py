"""Extended ONNX op lowerings vs numpy/torch references."""

import numpy as np
import pytest

from infera_tpu.onnx import ops_extra  # noqa: F401 - registers ops
from infera_tpu.onnx.ops import get_impl
from infera_tpu.onnx.proto import Attribute, Node


def run_op(op, inputs, attrs=None, n_outputs=1, input_names=None):
    names = input_names or [f"i{k}" for k in range(len(inputs))]
    node = Node(
        op_type=op,
        inputs=names,
        outputs=[f"o{k}" for k in range(n_outputs)],
        attributes={k: Attribute.make(k, v) for k, v in (attrs or {}).items()},
    )
    values = {n: v for n, v in zip(names, inputs)}

    class Ctx:
        matmul_precision = "f32"

        def as_static(self, v):
            if isinstance(v, str):
                v = values.get(v)
            if isinstance(v, np.ndarray):
                return v
            if v is not None and np.isscalar(v):
                return np.asarray(v)
            return None

    outs = get_impl("", op)(node, inputs, Ctx())
    return [np.asarray(o) for o in outs]


def test_trig_and_sign():
    x = np.linspace(-0.9, 0.9, 7).astype(np.float32)
    np.testing.assert_allclose(run_op("Tan", [x])[0], np.tan(x), rtol=1e-6)
    np.testing.assert_allclose(run_op("Asin", [x])[0], np.arcsin(x), rtol=1e-6)
    np.testing.assert_allclose(run_op("Atanh", [x])[0], np.arctanh(x), rtol=1e-5)
    np.testing.assert_array_equal(run_op("Sign", [x])[0], np.sign(x))


def test_isnan_isinf():
    x = np.array([1.0, np.nan, np.inf, -np.inf], np.float32)
    np.testing.assert_array_equal(run_op("IsNaN", [x])[0],
                                  [False, True, False, False])
    np.testing.assert_array_equal(run_op("IsInf", [x])[0],
                                  [False, False, True, True])
    np.testing.assert_array_equal(
        run_op("IsInf", [x], {"detect_negative": 0})[0],
        [False, False, True, False])


def test_activations_vs_torch():
    import torch

    x = np.linspace(-3, 3, 31).astype(np.float32)
    tx = torch.from_numpy(x)
    np.testing.assert_allclose(run_op("Selu", [x])[0],
                               torch.nn.functional.selu(tx).numpy(), rtol=1e-5)
    np.testing.assert_allclose(run_op("Celu", [x], {"alpha": 1.5})[0],
                               torch.nn.functional.celu(tx, 1.5).numpy(), rtol=1e-5)
    np.testing.assert_allclose(run_op("HardSwish", [x])[0],
                               torch.nn.functional.hardswish(tx).numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(run_op("Mish", [x])[0],
                               torch.nn.functional.mish(tx).numpy(), rtol=1e-5)


def test_shrink_threshold_hardmax():
    x = np.array([-2.0, -0.3, 0.0, 0.4, 3.0], np.float32)
    np.testing.assert_allclose(
        run_op("Shrink", [x], {"lambd": 0.5, "bias": 0.1})[0],
        [-1.9, 0.0, 0.0, 0.0, 2.9], rtol=1e-6)
    np.testing.assert_allclose(
        run_op("ThresholdedRelu", [x], {"alpha": 0.35})[0],
        [0, 0, 0, 0.4, 3.0], rtol=1e-6)
    h = run_op("Hardmax", [np.array([[1.0, 3.0, 2.0]], np.float32)])[0]
    np.testing.assert_array_equal(h, [[0, 1, 0]])


def test_reductions():
    x = np.random.default_rng(0).standard_normal((4, 5)).astype(np.float32)
    np.testing.assert_allclose(
        run_op("ReduceL1", [x], {"axes": [1], "keepdims": 0})[0],
        np.abs(x).sum(1), rtol=1e-6)
    np.testing.assert_allclose(
        run_op("ReduceSumSquare", [x], {"axes": [0]})[0],
        (x * x).sum(0, keepdims=True), rtol=1e-6)
    np.testing.assert_allclose(
        run_op("ReduceLogSum", [np.abs(x) + 1], {"axes": [1], "keepdims": 0})[0],
        np.log((np.abs(x) + 1).sum(1)), rtol=1e-6)


def test_pad_modes():
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    got = run_op("Pad", [x, np.array([0, 1, 0, 1])],
                 input_names=["x", "pads"])[0]
    np.testing.assert_array_equal(got, np.pad(x, [(0, 0), (1, 1)]))
    got = run_op("Pad", [x, np.array([1, 0, 1, 0]), np.array(7.0)],
                 input_names=["x", "pads", "v"])[0]
    np.testing.assert_array_equal(
        got, np.pad(x, [(1, 1), (0, 0)], constant_values=7.0))
    got = run_op("Pad", [x, np.array([0, 1, 0, 1])], {"mode": "edge"},
                 input_names=["x", "pads"])[0]
    np.testing.assert_array_equal(got, np.pad(x, [(0, 0), (1, 1)], mode="edge"))
    # negative pads trim
    got = run_op("Pad", [x, np.array([0, -1, 0, 0])],
                 input_names=["x", "pads"])[0]
    np.testing.assert_array_equal(got, x[:, 1:])


def test_depth_space_roundtrip():
    x = np.random.default_rng(1).standard_normal((2, 8, 4, 6)).astype(np.float32)
    d = run_op("DepthToSpace", [x], {"blocksize": 2})[0]
    assert d.shape == (2, 2, 8, 12)
    back = run_op("SpaceToDepth", [d], {"blocksize": 2})[0]
    np.testing.assert_allclose(back, x, rtol=1e-6)
    import torch

    want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(
        run_op("DepthToSpace", [x], {"blocksize": 2, "mode": "CRD"})[0],
        want, rtol=1e-6)


def test_trilu_cumsum():
    x = np.random.default_rng(2).standard_normal((4, 4)).astype(np.float32)
    np.testing.assert_array_equal(run_op("Trilu", [x], {"upper": 1})[0],
                                  np.triu(x))
    np.testing.assert_array_equal(
        run_op("Trilu", [x, np.array(1)], {"upper": 0},
               input_names=["x", "k"])[0], np.tril(x, 1))
    c = run_op("CumSum", [x, np.array(1)], input_names=["x", "ax"])[0]
    np.testing.assert_allclose(c, np.cumsum(x, 1), rtol=1e-6)
    c = run_op("CumSum", [x, np.array(0)], {"exclusive": 1, "reverse": 1},
               input_names=["x", "ax"])[0]
    want = np.flip(np.cumsum(np.flip(x, 0), 0) - np.flip(x, 0), 0)
    np.testing.assert_allclose(c, want, rtol=1e-5)


def test_onehot_eyelike_castlike():
    idx = np.array([0, 2, -1], np.int64)
    got = run_op("OneHot", [idx, np.array(3), np.array([0.0, 1.0])],
                 input_names=["i", "d", "v"])[0]
    np.testing.assert_array_equal(got, [[1, 0, 0], [0, 0, 1], [0, 0, 1]])
    e = run_op("EyeLike", [np.zeros((3, 4), np.float32)], {"k": 1})[0]
    np.testing.assert_array_equal(e, np.eye(3, 4, k=1, dtype=np.float32))
    c = run_op("CastLike", [np.array([1.7], np.float32),
                            np.array([1], np.int32)])[0]
    assert c.dtype == np.int32 and c[0] == 1


def test_topk():
    x = np.array([[3.0, 1.0, 4.0, 1.5], [2.0, 9.0, 0.0, 6.0]], np.float32)
    vals, idx = run_op("TopK", [x, np.array([2])], n_outputs=2,
                       input_names=["x", "k"])
    np.testing.assert_array_equal(vals, [[4.0, 3.0], [9.0, 6.0]])
    np.testing.assert_array_equal(idx, [[2, 0], [1, 3]])
    vals, idx = run_op("TopK", [x, np.array([1])], {"largest": 0},
                       n_outputs=2, input_names=["x", "k"])
    np.testing.assert_array_equal(vals, [[1.0], [0.0]])


def test_gather_scatter_nd():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    indices = np.array([[0, 1], [1, 2]], np.int64)
    got = run_op("GatherND", [data, indices])[0]
    np.testing.assert_array_equal(got, data[[0, 1], [1, 2]])
    upd = np.array([[9.0] * 4, [8.0] * 4], np.float32)
    got = run_op("ScatterND", [data, indices, upd])[0]
    want = data.copy()
    want[0, 1] = 9.0
    want[1, 2] = 8.0
    np.testing.assert_array_equal(got, want)


def test_scatter_elements():
    import torch

    data = np.zeros((3, 4), np.float32)
    idx = np.array([[1, 2], [0, 1]], np.int64)
    upd = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    got = run_op("ScatterElements", [data, idx, upd], {"axis": 1})[0]
    want = torch.zeros(3, 4).scatter_(
        1, torch.from_numpy(idx), torch.from_numpy(upd)).numpy()
    np.testing.assert_array_equal(got, want)
    got = run_op("ScatterElements", [data, idx, upd],
                 {"axis": 1, "reduction": "add"})[0]
    np.testing.assert_array_equal(got, want)  # disjoint targets → same


def test_einsum_resize():
    a = np.random.default_rng(3).standard_normal((3, 4)).astype(np.float32)
    b = np.random.default_rng(4).standard_normal((4, 5)).astype(np.float32)
    got = run_op("Einsum", [a, b], {"equation": "ij,jk->ik"})[0]
    np.testing.assert_allclose(got, a @ b, rtol=1e-5)
    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)
    got = run_op("Resize", [x, None, None, np.array([1, 1, 8, 8])],
                 input_names=["x", "roi", "scales", "sizes"])[0]
    assert got.shape == (1, 1, 8, 8)
    got = run_op("Resize", [x, None, np.array([1.0, 1.0, 2.0, 2.0], np.float32)],
                 {"mode": "nearest"}, input_names=["x", "roi", "scales"])[0]
    assert got.shape == (1, 1, 8, 8)


def test_instance_group_norm_vs_torch():
    import torch

    x = np.random.default_rng(5).standard_normal((2, 6, 5, 5)).astype(np.float32)
    scale = np.random.default_rng(6).standard_normal(6).astype(np.float32)
    bias = np.random.default_rng(7).standard_normal(6).astype(np.float32)
    got = run_op("InstanceNormalization", [x, scale, bias], {"epsilon": 1e-5})[0]
    want = torch.nn.functional.instance_norm(
        torch.from_numpy(x), weight=torch.from_numpy(scale),
        bias=torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    got = run_op("GroupNormalization", [x, scale, bias],
                 {"epsilon": 1e-5, "num_groups": 3})[0]
    want = torch.nn.functional.group_norm(
        torch.from_numpy(x), 3, torch.from_numpy(scale),
        torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_reverse_sequence():
    x = np.arange(12, dtype=np.float32).reshape(4, 3)  # time × batch
    lens = np.array([4, 2, 1], np.int64)
    got = run_op("ReverseSequence", [x, lens])[0]
    want = x.copy()
    for b, ln in enumerate(lens):
        want[:ln, b] = x[:ln, b][::-1]
    np.testing.assert_array_equal(got, want)


def test_quantized_ops():
    x = np.array([[-1.0, 0.0, 1.5], [0.5, -0.25, 2.0]], np.float32)
    q = run_op("QuantizeLinear", [x, np.array(0.25, np.float32),
                                  np.array(10, np.uint8)],
               input_names=["x", "s", "z"])[0]
    np.testing.assert_array_equal(q, np.clip(np.rint(x / 0.25) + 10, 0, 255))
    d = run_op("DequantizeLinear", [q.astype(np.float32),
                                    np.array(0.25, np.float32),
                                    np.array(10, np.uint8)],
               input_names=["x", "s", "z"])[0]
    np.testing.assert_allclose(d, (q - 10) * 0.25, rtol=1e-6)

    qd, scale, zp = run_op("DynamicQuantizeLinear", [x], n_outputs=3)
    recon = (qd - zp) * scale
    assert np.abs(recon - x).max() < float(scale) * 0.75

    a = np.array([[1, 2], [3, 4]], np.int8)
    b = np.array([[5, 6], [7, 8]], np.int8)
    got = run_op("MatMulInteger", [a, b, np.array(1, np.int8)],
                 input_names=["a", "b", "az"])[0]
    want = (a.astype(np.int32) - 1) @ b.astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_compress_lpnorm_mvn():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    got = run_op("Compress", [x, np.array([True, False, True])], {"axis": 0},
                 input_names=["x", "c"])[0]
    np.testing.assert_array_equal(got, x[[0, 2]])
    got = run_op("LpNormalization", [x + 1], {"axis": 1, "p": 1})[0]
    want = (x + 1) / np.abs(x + 1).sum(1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    x4 = np.random.default_rng(8).standard_normal((2, 3, 4, 4)).astype(np.float32)
    got = run_op("MeanVarianceNormalization", [x4])[0]
    mean = x4.mean(axis=(0, 2, 3), keepdims=True)
    var = ((x4 - mean) ** 2).mean(axis=(0, 2, 3), keepdims=True)
    np.testing.assert_allclose(got, (x4 - mean) / np.sqrt(var + 1e-9),
                               rtol=1e-4, atol=1e-5)


def test_qdq_model_end_to_end():
    """An externally-quantized (QDQ-style) ONNX graph runs through the full
    engine: DequantizeLinear(weights) feeding MatMul."""
    from infera_tpu.onnx.executor import compile_model_bytes
    from infera_tpu.onnx.proto import (
        DataType, Graph, Model, Node, Tensor, ValueInfo,
    )

    rng = np.random.default_rng(0)
    w_f = rng.standard_normal((4, 3)).astype(np.float32)
    scale = np.float32(0.05)
    w_q = np.clip(np.rint(w_f / scale), -127, 127).astype(np.int8)
    g = Graph(
        name="qdq",
        nodes=[
            Node(op_type="DequantizeLinear", inputs=["Wq", "ws", "wz"],
                 outputs=["W"]),
            Node(op_type="MatMul", inputs=["X", "W"], outputs=["Y"]),
        ],
        initializers={
            "Wq": Tensor.from_array("Wq", w_q.astype(np.float32)),
            "ws": Tensor.from_array("ws", np.array(scale, np.float32)),
            "wz": Tensor.from_array("wz", np.array(0.0, np.float32)),
        },
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, 4])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[-1, 3])],
    )
    model = Model(graph=g)
    compiled = compile_model_bytes(model.serialize(), "qdq")
    x = rng.standard_normal((8, 4)).astype(np.float32)
    got = np.asarray(compiled.run(x)[0])
    want = x @ (w_q.astype(np.float32) * scale)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_qlinearmatmul_signed_output_saturation():
    """int8 y_zero_point → saturate to [-128,127]; uint8 → [0,255]
    (regression: negative quantized outputs clamped to 0; ADVICE r1)."""
    a = np.array([[10, -10]], np.int8)
    b = np.array([[1], [1]], np.int8)
    zero8 = np.int8(0)
    s = np.float32(1.0)
    # acc = 0 at row 0? use values producing a negative product sum
    a = np.array([[-5, -3]], np.int8)
    out = run_op(
        "QLinearMatMul",
        [a, s, zero8, b, s, zero8, s, np.int8(0)],
    )[0]
    assert out[0, 0] == -8  # signed range keeps the negative value
    out_u = run_op(
        "QLinearMatMul",
        [a, s, np.uint8(0), b, s, np.uint8(0), s, np.uint8(0)],
    )[0]
    assert out_u[0, 0] == 0  # unsigned range clamps at 0
    # saturation at the low end
    a2 = np.array([[-100, -100]], np.int8)
    out2 = run_op(
        "QLinearMatMul",
        [a2, s, zero8, b, s, zero8, s, np.int8(0)],
    )[0]
    assert out2[0, 0] == -128


class TestTfIdfVectorizer:
    def _node(self, **attrs):
        from infera_tpu.onnx.proto import Attribute, Node

        return Node(op_type="TfIdfVectorizer", inputs=["x"], outputs=["y"],
                    attributes={k: Attribute.make(k, v)
                                for k, v in attrs.items()})

    def _run(self, x, **attrs):
        import jax.numpy as jnp

        from infera_tpu.onnx.executor import _Ctx
        from infera_tpu.onnx.ops import get_impl

        return np.asarray(get_impl("", "TfIdfVectorizer")(
            self._node(**attrs), [jnp.asarray(x)], _Ctx({}))[0])

    def test_tf_uni_and_bigrams(self):
        x = np.array([[2, 5, 6, 3, 5, 6], [7, 8, 2, 2, 8, 7]], np.int64)
        out = self._run(x, mode="TF", min_gram_length=1, max_gram_length=2,
                        max_skip_count=0, ngram_counts=[0, 2],
                        ngram_indexes=[0, 1, 2, 3],
                        pool_int64s=[2, 3, 5, 6, 7, 8])
        np.testing.assert_array_equal(out, [[1, 1, 2, 0], [2, 0, 0, 1]])

    def test_skip_grams_and_length_window(self):
        # skip-1 bigram (5, 6) matches [5, 9, 6]; unigram section exists
        # in the pool but min_gram_length=2 excludes it from emission
        x = np.array([[5, 9, 6, 0]], np.int64)
        out = self._run(x, mode="TF", min_gram_length=2, max_gram_length=2,
                        max_skip_count=1, ngram_counts=[0, 1],
                        ngram_indexes=[0, 1], pool_int64s=[5, 5, 6])
        np.testing.assert_array_equal(out, [[0, 1]])

    def test_idf_and_tfidf_weights(self):
        x = np.array([[2, 5, 2], [3, 3, 3]], np.int64)
        kw = dict(min_gram_length=1, max_gram_length=1, ngram_counts=[0],
                  ngram_indexes=[0, 1], pool_int64s=[2, 3],
                  weights=[0.5, 2.0])
        idf = self._run(x, mode="IDF", **kw)
        np.testing.assert_allclose(idf, [[0.5, 0.0], [0.0, 2.0]])
        tfidf = self._run(x, mode="TFIDF", **kw)
        np.testing.assert_allclose(tfidf, [[1.0, 0.0], [0.0, 6.0]])

    def test_1d_input_and_string_rejection(self):
        out = self._run(np.array([2, 2, 3], np.int64), mode="TF",
                        min_gram_length=1, max_gram_length=1,
                        ngram_counts=[0], ngram_indexes=[0, 1],
                        pool_int64s=[2, 3])
        assert out.shape == (2,)
        np.testing.assert_array_equal(out, [2, 1])
