"""Programmatic ONNX model construction for tests and benchmarks.

The reference ships tiny committed .onnx files (test/models/README.md:
linear.onnx = y = 2x1 - x2 + 0.5x3 + 0.25 over input [1,3]; multi_output.onnx
= Identity over [1,4]). We synthesize semantically identical models with our
own protobuf writer so the repo carries no binary blobs, plus larger MLP /
multi-output / tree-ensemble models for the benchmark configs in
/root/repo/BASELINE.json.
"""

from __future__ import annotations

import numpy as np

from .proto import (
    Attribute,
    DataType,
    Graph,
    Model,
    Node,
    Tensor,
    ValueInfo,
    save_model_file,
)


def linear_model() -> Model:
    """y = 2*x1 - 1*x2 + 0.5*x3 + 0.25, input [1,3] → output [1,1].

    Matches the reference test model (SURVEY.md §2.3; weights verified from
    test/models/linear.onnx bytes): Z = MatMul(X, W); Y = Add(Z, B).
    """
    w = np.array([[2.0], [-1.0], [0.5]], dtype=np.float32)
    b = np.array([0.25], dtype=np.float32)
    g = Graph(
        name="LinearModel",
        nodes=[
            Node(op_type="MatMul", inputs=["X", "W"], outputs=["Z"]),
            Node(op_type="Add", inputs=["Z", "B"], outputs=["Y"]),
        ],
        initializers={"W": Tensor.from_array("W", w), "B": Tensor.from_array("B", b)},
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[1, 3])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[1, 1])],
    )
    return Model(graph=g, opset_imports=[("", 13)])


def multi_output_model() -> Model:
    """Identity over [1,4] (reference test/models/multi_output.onnx)."""
    g = Graph(
        name="MultiOutputModel",
        nodes=[Node(op_type="Identity", inputs=["X"], outputs=["Y"])],
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[1, 4])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[1, 4])],
    )
    return Model(graph=g, opset_imports=[("", 13)])


def mlp_model(
    in_dim: int = 16,
    hidden: tuple = (64, 64),
    out_dim: int = 8,
    seed: int = 0,
    softmax: bool = True,
    dynamic_batch: bool = True,
) -> Model:
    """An MLP classifier for the BASELINE.json config-2 benchmark."""
    rng = np.random.default_rng(seed)
    nodes = []
    inits = {}
    prev = "X"
    dims = [in_dim, *hidden, out_dim]
    for li in range(len(dims) - 1):
        w = rng.standard_normal((dims[li], dims[li + 1]), dtype=np.float32)
        w *= np.float32(1.0 / np.sqrt(dims[li]))
        b = rng.standard_normal(dims[li + 1], dtype=np.float32) * np.float32(0.1)
        inits[f"W{li}"] = Tensor.from_array(f"W{li}", w)
        inits[f"B{li}"] = Tensor.from_array(f"B{li}", b)
        nodes.append(Node(op_type="Gemm", inputs=[prev, f"W{li}", f"B{li}"],
                          outputs=[f"H{li}"]))
        if li < len(dims) - 2:
            nodes.append(Node(op_type="Relu", inputs=[f"H{li}"], outputs=[f"A{li}"]))
            prev = f"A{li}"
        else:
            prev = f"H{li}"
    if softmax:
        nodes.append(
            Node(op_type="Softmax", inputs=[prev], outputs=["Y"],
                 attributes={"axis": Attribute.make("axis", -1)})
        )
    else:
        nodes.append(Node(op_type="Identity", inputs=[prev], outputs=["Y"]))
    batch_dim = -1 if dynamic_batch else 1
    g = Graph(
        name="MlpClassifier",
        nodes=nodes,
        initializers=inits,
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[batch_dim, in_dim])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[batch_dim, out_dim])],
    )
    return Model(graph=g, opset_imports=[("", 13)])


def write_reference_test_models(directory) -> dict:
    """Write linear.onnx and multi_output.onnx into `directory`.

    Returns {model_name: path}. Used by the parity test-suite in place of the
    reference's committed binaries.
    """
    import os

    os.makedirs(directory, exist_ok=True)
    paths = {}
    for name, model in (("linear", linear_model()), ("multi_output", multi_output_model())):
        p = os.path.join(directory, f"{name}.onnx")
        save_model_file(model, p)
        paths[name] = p
    return paths
