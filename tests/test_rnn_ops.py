"""RNN/GRU/LSTM lowerings vs torch references (gate orders remapped:
ONNX LSTM iofc vs torch ifgo; ONNX GRU zrh vs torch rzn)."""

import numpy as np
import pytest
import torch

from infera_tpu.onnx import rnn_ops  # noqa: F401 - registers ops
from infera_tpu.onnx.ops import get_impl
from infera_tpu.onnx.proto import Attribute, Node

SEQ, BATCH, IN, HID = 5, 3, 4, 6


def run_op(op, inputs, attrs=None, n_outputs=2):
    names = [f"i{k}" for k in range(len(inputs))]
    node = Node(op_type=op, inputs=names,
                outputs=[f"o{k}" for k in range(n_outputs)],
                attributes={k: Attribute.make(k, v)
                            for k, v in (attrs or {}).items()})

    class Ctx:
        def as_static(self, v):
            return v if isinstance(v, np.ndarray) else None

    return [np.asarray(o) for o in get_impl("", op)(node, inputs, Ctx())]


def _lstm_onnx_weights(lstm, reverse=False):
    sfx = "_reverse" if reverse else ""
    w = getattr(lstm, f"weight_ih_l0{sfx}").detach().numpy()  # [4h, in] ifgo
    r = getattr(lstm, f"weight_hh_l0{sfx}").detach().numpy()
    bi = getattr(lstm, f"bias_ih_l0{sfx}").detach().numpy()
    bh = getattr(lstm, f"bias_hh_l0{sfx}").detach().numpy()
    h = HID

    def reorder(m):  # ifgo → iofc
        i, f, g, o = m[:h], m[h:2*h], m[2*h:3*h], m[3*h:]
        return np.concatenate([i, o, f, g], 0)

    return reorder(w), reorder(r), np.concatenate([reorder(bi), reorder(bh)], 0)


@pytest.mark.parametrize("direction", ["forward", "bidirectional"])
def test_lstm_vs_torch(direction):
    bidi = direction == "bidirectional"
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(IN, HID, bidirectional=bidi)
    x = np.random.default_rng(0).standard_normal((SEQ, BATCH, IN)).astype(np.float32)
    h0 = np.random.default_rng(1).standard_normal(
        (2 if bidi else 1, BATCH, HID)).astype(np.float32)
    c0 = np.random.default_rng(2).standard_normal(h0.shape).astype(np.float32)

    ws, rs, bs = zip(*[_lstm_onnx_weights(lstm, rev)
                       for rev in ([False, True] if bidi else [False])])
    W, R, B = np.stack(ws), np.stack(rs), np.stack(bs)
    y, yh, yc = run_op("LSTM", [x, W, R, B, None, h0, c0],
                       {"hidden_size": HID, "direction": direction},
                       n_outputs=3)

    ty, (th, tc) = lstm(torch.from_numpy(x),
                        (torch.from_numpy(h0), torch.from_numpy(c0)))
    # torch Y is [seq, batch, dirs*h]; ONNX is [seq, dirs, batch, h]
    dirs = 2 if bidi else 1
    ty = ty.detach().numpy().reshape(SEQ, BATCH, dirs, HID).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(y, ty, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh, th.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yc, tc.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_gru_vs_torch():
    torch.manual_seed(1)
    gru = torch.nn.GRU(IN, HID)
    x = np.random.default_rng(3).standard_normal((SEQ, BATCH, IN)).astype(np.float32)
    h = HID
    w = gru.weight_ih_l0.detach().numpy()  # [3h, in] rzn
    r = gru.weight_hh_l0.detach().numpy()
    bi = gru.bias_ih_l0.detach().numpy()
    bh = gru.bias_hh_l0.detach().numpy()

    def reorder(m):  # rzn → zrh
        rr, zz, nn = m[:h], m[h:2*h], m[2*h:]
        return np.concatenate([zz, rr, nn], 0)

    W = reorder(w)[None]
    R = reorder(r)[None]
    B = np.concatenate([reorder(bi), reorder(bh)], 0)[None]
    # torch GRU applies the reset gate AFTER the hidden matmul
    y, yh = run_op("GRU", [x, W, R, B],
                   {"hidden_size": HID, "linear_before_reset": 1})
    ty, th = gru(torch.from_numpy(x))
    np.testing.assert_allclose(y[:, 0], ty.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh, th.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_rnn_vs_torch():
    torch.manual_seed(2)
    rnn = torch.nn.RNN(IN, HID)
    x = np.random.default_rng(4).standard_normal((SEQ, BATCH, IN)).astype(np.float32)
    W = rnn.weight_ih_l0.detach().numpy()[None]
    R = rnn.weight_hh_l0.detach().numpy()[None]
    B = np.concatenate([rnn.bias_ih_l0.detach().numpy(),
                        rnn.bias_hh_l0.detach().numpy()], 0)[None]
    y, yh = run_op("RNN", [x, W, R, B], {"hidden_size": HID})
    ty, th = rnn(torch.from_numpy(x))
    np.testing.assert_allclose(y[:, 0], ty.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh, th.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_model_end_to_end():
    """A full LSTM sequence classifier through the engine: LSTM → last
    hidden → Gemm."""
    from infera_tpu.onnx.executor import compile_model_bytes
    from infera_tpu.onnx.proto import (
        DataType, Graph, Model, Node, Tensor, ValueInfo,
    )

    rng = np.random.default_rng(5)
    W = rng.standard_normal((1, 4 * HID, IN)).astype(np.float32) * 0.3
    R = rng.standard_normal((1, 4 * HID, HID)).astype(np.float32) * 0.3
    Wd = rng.standard_normal((HID, 2)).astype(np.float32)
    g = Graph(
        name="lstm_clf",
        nodes=[
            Node(op_type="LSTM", inputs=["X", "W", "R"],
                 outputs=["Y", "Yh", "Yc"],
                 attributes={"hidden_size": Attribute.make("hidden_size", HID)}),
            Node(op_type="Squeeze", inputs=["Yh", "sq_axes"], outputs=["H"]),
            Node(op_type="MatMul", inputs=["H", "Wd"], outputs=["logits"]),
        ],
        initializers={
            "W": Tensor.from_array("W", W),
            "R": Tensor.from_array("R", R),
            "Wd": Tensor.from_array("Wd", Wd),
            "sq_axes": Tensor.from_array("sq_axes", np.array([0], np.int64)),
        },
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT,
                          shape=[SEQ, -1, IN])],
        outputs=[ValueInfo(name="logits", elem_type=DataType.FLOAT,
                           shape=[-1, 2])],
    )
    compiled = compile_model_bytes(Model(graph=g).serialize(), "lstm_clf")
    x = rng.standard_normal((SEQ, BATCH, IN)).astype(np.float32)
    got = np.asarray(compiled.run(x)[0])
    assert got.shape == (BATCH, 2)
    # independent recurrence in numpy
    h = np.zeros((BATCH, HID), np.float32)
    c = np.zeros((BATCH, HID), np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    for t in range(SEQ):
        gates = x[t] @ W[0].T + h @ R[0].T
        i = sig(gates[:, :HID])
        o = sig(gates[:, HID:2*HID])
        f = sig(gates[:, 2*HID:3*HID])
        gg = np.tanh(gates[:, 3*HID:])
        c = f * c + i * gg
        h = o * np.tanh(c)
    np.testing.assert_allclose(got, h @ Wd, rtol=1e-4, atol=1e-5)
