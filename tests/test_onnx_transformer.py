"""Transformer-block ONNX coverage: attention expressed with the core op set
(MatMul/Transpose/Softmax/Add/Mul/ReduceMean/Sqrt...) must match torch."""

import numpy as np
import torch

from infera_tpu.onnx.executor import compile_model_bytes
from infera_tpu.onnx.proto import (
    Attribute,
    DataType,
    Graph,
    Model,
    Node,
    Tensor,
    ValueInfo,
)


def test_single_head_attention_block():
    """softmax(QK^T/sqrt(d)) V with residual + layernorm-lite (mean/var via
    ReduceMean), all through the ONNX op set."""
    rng = np.random.default_rng(0)
    seq, d = 16, 32
    wq = rng.standard_normal((d, d)).astype(np.float32) * 0.2
    wk = rng.standard_normal((d, d)).astype(np.float32) * 0.2
    wv = rng.standard_normal((d, d)).astype(np.float32) * 0.2
    scale = np.float32(1.0 / np.sqrt(d))

    nodes = [
        Node(op_type="MatMul", inputs=["X", "WQ"], outputs=["Q"]),
        Node(op_type="MatMul", inputs=["X", "WK"], outputs=["K"]),
        Node(op_type="MatMul", inputs=["X", "WV"], outputs=["V"]),
        Node(op_type="Transpose", inputs=["K"], outputs=["KT"],
             attributes={"perm": Attribute.make("perm", [1, 0])}),
        Node(op_type="MatMul", inputs=["Q", "KT"], outputs=["QK"]),
        Node(op_type="Mul", inputs=["QK", "scale"], outputs=["QKs"]),
        Node(op_type="Softmax", inputs=["QKs"], outputs=["A"],
             attributes={"axis": Attribute.make("axis", -1)}),
        Node(op_type="MatMul", inputs=["A", "V"], outputs=["AV"]),
        Node(op_type="Add", inputs=["AV", "X"], outputs=["R"]),
        # mean-center (layernorm-lite)
        Node(op_type="ReduceMean", inputs=["R"], outputs=["mu"],
             attributes={"axes": Attribute.make("axes", [-1]),
                         "keepdims": Attribute.make("keepdims", 1)}),
        Node(op_type="Sub", inputs=["R", "mu"], outputs=["Y"]),
    ]
    g = Graph(
        name="attn",
        nodes=nodes,
        initializers={
            "WQ": Tensor.from_array("WQ", wq),
            "WK": Tensor.from_array("WK", wk),
            "WV": Tensor.from_array("WV", wv),
            "scale": Tensor.from_array("scale", np.asarray(scale)),
        },
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[seq, d])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[seq, d])],
    )
    compiled = compile_model_bytes(Model(graph=g).serialize(), "attn")
    x = rng.standard_normal((seq, d)).astype(np.float32)
    got = np.asarray(compiled.run(x)[0])

    t = torch.from_numpy(x)
    q = t @ torch.from_numpy(wq)
    k = t @ torch.from_numpy(wk)
    v = t @ torch.from_numpy(wv)
    a = torch.softmax((q @ k.T) * scale, dim=-1)
    r = a @ v + t
    want = (r - r.mean(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_layernorm_and_gelu_ops():
    rng = np.random.default_rng(0)
    d = 16
    scale = rng.standard_normal(d).astype(np.float32)
    bias = rng.standard_normal(d).astype(np.float32)
    g = Graph(
        name="ln",
        nodes=[
            Node(op_type="LayerNormalization", inputs=["X", "S", "B"],
                 outputs=["L"],
                 attributes={"axis": Attribute.make("axis", -1),
                             "epsilon": Attribute.make("epsilon", 1e-5)}),
            Node(op_type="Gelu", inputs=["L"], outputs=["Y"]),
        ],
        initializers={"S": Tensor.from_array("S", scale),
                      "B": Tensor.from_array("B", bias)},
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, d])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[-1, d])],
    )
    compiled = compile_model_bytes(Model(graph=g).serialize(), "ln")
    x = rng.standard_normal((8, d)).astype(np.float32)
    got = np.asarray(compiled.run(x)[0])
    t = torch.from_numpy(x)
    ln = torch.nn.functional.layer_norm(
        t, (d,), torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5)
    want = torch.nn.functional.gelu(ln).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_transformer_encoder_matches_torch():
    """Full multi-head pre-LN encoder (builder.transformer_encoder_model)
    vs an independent torch implementation over the SAME weights."""
    import torch
    import torch.nn.functional as F

    from infera_tpu.onnx.builder import transformer_encoder_model
    from infera_tpu.onnx.executor import compile_model_bytes

    seq, d, h, layers, ncls = 16, 64, 4, 2, 8
    m = transformer_encoder_model(seq=seq, d_model=d, n_heads=h,
                                  n_layers=layers, n_classes=ncls)
    W = {k: torch.from_numpy(np.asarray(t.array).copy())
         for k, t in m.graph.initializers.items()}
    cm = compile_model_bytes(m.serialize(), "tfenc")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, seq * d)).astype(np.float32)
    got = np.asarray(cm.run(x)[0])

    t = torch.from_numpy(x).reshape(3, seq, d)
    dh = d // h
    for li in range(layers):
        p = f"L{li}_"
        ln1 = F.layer_norm(t, (d,), W[p + "ln1_g"], W[p + "ln1_b"], 1e-5)
        q = (ln1 @ W[p + "Wq"]).reshape(3, seq, h, dh).permute(0, 2, 1, 3)
        k = (ln1 @ W[p + "Wk"]).reshape(3, seq, h, dh).permute(0, 2, 1, 3)
        v = (ln1 @ W[p + "Wv"]).reshape(3, seq, h, dh).permute(0, 2, 1, 3)
        sc = (q @ k.transpose(-1, -2)) / np.sqrt(dh)
        ctx = (sc.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(3, seq, d)
        t = t + ctx @ W[p + "Wo"]
        ln2 = F.layer_norm(t, (d,), W[p + "ln2_g"], W[p + "ln2_b"], 1e-5)
        ff = F.gelu(ln2 @ W[p + "W1"] + W[p + "b1"], approximate="none")
        t = t + ff @ W[p + "W2"] + W[p + "b2"]
    want = (t.mean(dim=1) @ W["Wcls"] + W["bcls"]).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_transformer_encoder_through_sql_blob():
    """The encoder runs through the SQL surface's blob path with batch
    inferred from the dynamic dim (engine.rs:221-238 semantics)."""
    import tempfile

    import infera_tpu as it
    from infera_tpu.onnx.builder import transformer_encoder_model
    from infera_tpu.registry import MODELS
    from infera_tpu.sql import Connection

    m = transformer_encoder_model(seq=4, d_model=16, n_heads=2,
                                  n_layers=1, n_classes=3)
    with tempfile.NamedTemporaryFile(suffix=".onnx", delete=False) as f:
        f.write(m.serialize())
        path = f.name
    conn = Connection()
    conn.execute(f"select infera_load_model('tfenc', '{path}')")
    nbytes = 4 * 16 * 4
    rows = conn.execute(
        "select infera_predict_from_blob('tfenc', "
        f"cast(repeat(chr(0), {nbytes}) as blob)) r").rows
    (out,) = rows[0]
    assert len(out) == 3
    MODELS.clear()


def test_transformer_encoder_quantized_paths():
    """bf16 and int8 load-time quantization apply to the transformer's
    MatMul weights through the generic engine path (quantization is not
    MLP-specific)."""
    from infera_tpu.onnx.builder import transformer_encoder_model
    from infera_tpu.onnx.executor import compile_model_bytes

    m = transformer_encoder_model(seq=8, d_model=32, n_heads=2,
                                  n_layers=1, n_classes=4)
    data = m.serialize()
    x = np.random.default_rng(0).standard_normal((4, 8 * 32)).astype(
        np.float32)
    f32 = np.asarray(compile_model_bytes(data, "q_f32").run(x)[0])
    bf16 = np.asarray(
        compile_model_bytes(data, "q_bf16", precision="bf16").run(x)[0])
    i8 = np.asarray(
        compile_model_bytes(data, "q_int8", precision="int8").run(x)[0])
    scale = np.abs(f32).max()
    assert np.abs(bf16 - f32).max() / scale < 0.02
    assert np.abs(i8 - f32).max() / scale < 0.05
