"""CNN operator-path tests (Conv / BatchNormalization / pooling / Clip —
the op set a mobilenet-class model needs; the reference exercises this via
remote-model blob inference, test_advanced_features.test)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from infera_tpu.onnx.proto import (
    Attribute,
    DataType,
    Graph,
    Model,
    Node,
    Tensor,
    ValueInfo,
)
from infera_tpu.onnx.executor import compile_model_bytes


def _conv_model(groups=1, strides=(1, 1), pads=(1, 1, 1, 1), cin=8, cout=16, k=3):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((cout, cin // groups, k, k)).astype(np.float32) * 0.2
    b = rng.standard_normal(cout).astype(np.float32) * 0.1
    attrs = {
        "kernel_shape": Attribute.make("kernel_shape", [k, k]),
        "strides": Attribute.make("strides", list(strides)),
        "pads": Attribute.make("pads", list(pads)),
        "group": Attribute.make("group", groups),
    }
    g = Graph(
        name="conv",
        nodes=[Node(op_type="Conv", inputs=["X", "W", "B"], outputs=["Y"],
                    attributes=attrs)],
        initializers={"W": Tensor.from_array("W", w), "B": Tensor.from_array("B", b)},
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, cin, 16, 16])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[-1, cout, -1, -1])],
    )
    return Model(graph=g), w, b


@pytest.mark.parametrize("groups,strides", [(1, (1, 1)), (1, (2, 2)), (8, (1, 1))])
def test_conv_matches_torch(groups, strides):
    cin, cout = 8, 16 if groups == 1 else 8
    model, w, b = _conv_model(groups=groups, strides=strides,
                              cin=cin, cout=cout)
    compiled = compile_model_bytes(model.serialize(), "conv")
    x = np.random.default_rng(1).standard_normal((2, cin, 16, 16)).astype(np.float32)
    got = np.asarray(compiled.run(x)[0])
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), stride=strides, padding=1,
                    groups=groups).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_small_cnn_end_to_end():
    """Conv → BatchNorm → Clip(relu6) → GlobalAveragePool → Gemm → Softmax —
    the mobilenet block shape, verified against torch."""
    rng = np.random.default_rng(0)
    cin, cmid, ncls = 3, 8, 4
    w1 = rng.standard_normal((cmid, cin, 3, 3)).astype(np.float32) * 0.2
    scale = rng.standard_normal(cmid).astype(np.float32) * 0.1 + 1.0
    bias = rng.standard_normal(cmid).astype(np.float32) * 0.1
    mean = rng.standard_normal(cmid).astype(np.float32) * 0.1
    var = np.abs(rng.standard_normal(cmid).astype(np.float32)) + 0.5
    wfc = rng.standard_normal((cmid, ncls)).astype(np.float32) * 0.3
    bfc = rng.standard_normal(ncls).astype(np.float32) * 0.1

    g = Graph(
        name="cnn",
        nodes=[
            Node(op_type="Conv", inputs=["X", "W1"], outputs=["c1"],
                 attributes={
                     "kernel_shape": Attribute.make("kernel_shape", [3, 3]),
                     "pads": Attribute.make("pads", [1, 1, 1, 1]),
                 }),
            Node(op_type="BatchNormalization",
                 inputs=["c1", "scale", "bias", "mean", "var"],
                 outputs=["b1"],
                 attributes={"epsilon": Attribute.make("epsilon", 1e-5)}),
            Node(op_type="Clip", inputs=["b1"], outputs=["r1"],
                 attributes={"min": Attribute.make("min", 0.0),
                             "max": Attribute.make("max", 6.0)}),
            Node(op_type="GlobalAveragePool", inputs=["r1"], outputs=["p1"]),
            Node(op_type="Flatten", inputs=["p1"], outputs=["f1"]),
            Node(op_type="Gemm", inputs=["f1", "WFC", "BFC"], outputs=["l1"]),
            Node(op_type="Softmax", inputs=["l1"], outputs=["Y"],
                 attributes={"axis": Attribute.make("axis", -1)}),
        ],
        initializers={
            "W1": Tensor.from_array("W1", w1),
            "scale": Tensor.from_array("scale", scale),
            "bias": Tensor.from_array("bias", bias),
            "mean": Tensor.from_array("mean", mean),
            "var": Tensor.from_array("var", var),
            "WFC": Tensor.from_array("WFC", wfc),
            "BFC": Tensor.from_array("BFC", bfc),
        },
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, cin, 8, 8])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[-1, ncls])],
    )
    compiled = compile_model_bytes(Model(graph=g).serialize(), "cnn")
    x = rng.standard_normal((4, cin, 8, 8)).astype(np.float32)
    got = np.asarray(compiled.run(x)[0])

    t = torch.from_numpy(x)
    h = F.conv2d(t, torch.from_numpy(w1), padding=1)
    h = F.batch_norm(h, torch.from_numpy(mean), torch.from_numpy(var),
                     torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5)
    h = torch.clamp(h, 0.0, 6.0)
    h = h.mean(dim=(2, 3))
    h = h @ torch.from_numpy(wfc) + torch.from_numpy(bfc)
    want = torch.softmax(h, dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got.shape == (4, ncls)


def test_maxpool_and_avgpool():
    for op, tfn in (("MaxPool", F.max_pool2d), ("AveragePool", F.avg_pool2d)):
        g = Graph(
            name="pool",
            nodes=[Node(op_type=op, inputs=["X"], outputs=["Y"],
                        attributes={
                            "kernel_shape": Attribute.make("kernel_shape", [2, 2]),
                            "strides": Attribute.make("strides", [2, 2]),
                        })],
            inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, 2, 8, 8])],
            outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[-1, 2, 4, 4])],
        )
        compiled = compile_model_bytes(Model(graph=g).serialize(), "pool")
        x = np.random.default_rng(0).standard_normal((1, 2, 8, 8)).astype(np.float32)
        got = np.asarray(compiled.run(x)[0])
        want = tfn(torch.from_numpy(x), 2, 2).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_blob_cnn_batch_inference(tmp_path, clean_registry):
    """mobilenet-style blob flow: dynamic batch inferred from blob length
    (the reference's e2 example sends 1x224x224x3 zero bytes)."""
    import infera_tpu as it
    from infera_tpu.onnx import proto

    model, _, _ = _conv_model()
    p = tmp_path / "cnn.onnx"
    proto.save_model_file(model, p)
    it.load_model("cnn", str(p))
    blob = np.zeros(2 * 8 * 16 * 16, "<f4").tobytes()  # batch of 2
    res = it.predict_from_blob("cnn", blob)
    assert res.rows == 2
