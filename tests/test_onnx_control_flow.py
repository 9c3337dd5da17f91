"""ONNX control-flow ops (If / Loop / Scan) — tract-opset parity
(/root/reference/infera/src/engine.rs:49-55) lowered to lax.cond /
while_loop / scan so the body stays inside the jitted XLA computation."""

import numpy as np
import pytest

from infera_tpu.onnx import builder, proto
from infera_tpu.onnx.executor import compile_model_bytes


def _roundtrip(model):
    """serialize → parse → compile: proves subgraph attrs survive the codec."""
    return compile_model_bytes(model.serialize(), "cf")


def test_if_static_condition_folds():
    x = np.arange(8, dtype=np.float32).reshape(2, 4) - 3.0
    m = _roundtrip(builder.if_model(static_cond=True))
    np.testing.assert_allclose(np.asarray(m.run(x)[0]), 2 * x + 1, rtol=1e-6)
    m = _roundtrip(builder.if_model(static_cond=False))
    np.testing.assert_allclose(np.asarray(m.run(x)[0]), -x, rtol=1e-6)


def test_if_traced_condition_lax_cond():
    m = _roundtrip(builder.if_model())
    x_pos = np.full((2, 4), 1.5, np.float32)
    x_neg = np.full((2, 4), -1.5, np.float32)
    np.testing.assert_allclose(
        np.asarray(m.run(x_pos)[0]), 2 * x_pos + 1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.run(x_neg)[0]), -x_neg, rtol=1e-6)


def test_loop_while_path():
    trips = 5
    m = _roundtrip(builder.loop_model(trips=trips))
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_allclose(
        np.asarray(m.run(x)[0]), (trips + 1) * x, rtol=1e-6)


def test_loop_scan_output_path():
    trips = 4
    m = _roundtrip(builder.loop_model(trips=trips, scan_output=True))
    x = np.arange(8, dtype=np.float32).reshape(2, 4)
    outs = m.run(x)
    np.testing.assert_allclose(np.asarray(outs[0]), (trips + 1) * x, rtol=1e-6)
    # per-iteration scan output: sum(v_k) for k = 1..trips, v_k = (k+1)*X
    want = np.asarray([(k + 2) * x.sum() for k in range(trips)], np.float32)
    np.testing.assert_allclose(np.asarray(outs[1]), want, rtol=1e-5)


def test_scan_cumsum():
    m = _roundtrip(builder.scan_model())
    x = np.random.default_rng(0).standard_normal((6, 4)).astype(np.float32)
    outs = m.run(x)
    np.testing.assert_allclose(np.asarray(outs[0]), x.sum(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[1]), np.cumsum(x, 0), rtol=1e-5)


def test_loop_early_exit_exact():
    """Body flips cond to false after 3 iterations; while_loop must stop
    there even though M allows 10 (exact ONNX early-exit semantics)."""
    from infera_tpu.onnx.proto import (
        Attribute, DataType, Graph, Model, Node, Tensor, ValueInfo)

    body = Graph(
        name="body",
        nodes=[
            Node(op_type="Less", inputs=["i", "two"], outputs=["c_out"]),
            Node(op_type="Add", inputs=["v_in", "X"], outputs=["v_out"]),
        ],
        inputs=[
            ValueInfo(name="i", elem_type=DataType.INT64, shape=[]),
            ValueInfo(name="c_in", elem_type=DataType.BOOL, shape=[]),
            ValueInfo(name="v_in", elem_type=DataType.FLOAT, shape=[-1, 4]),
        ],
        outputs=[
            ValueInfo(name="c_out", elem_type=DataType.BOOL, shape=[]),
            ValueInfo(name="v_out", elem_type=DataType.FLOAT, shape=[-1, 4]),
        ],
    )
    g = Graph(
        name="EarlyExit",
        nodes=[Node(op_type="Loop", inputs=["M", "go", "X"], outputs=["Y"],
                    attributes={"body": Attribute.make("body", body)})],
        initializers={
            "M": Tensor.from_array("M", np.asarray(10, np.int64)),
            "go": Tensor.from_array("go", np.asarray(True, np.bool_)),
            "two": Tensor.from_array("two", np.asarray(2, np.int64)),
        },
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, 4])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[-1, 4])],
    )
    m = _roundtrip(Model(graph=g, opset_imports=[("", 17)]))
    x = np.ones((2, 4), np.float32)
    # iteration k runs with i=k; after i=2 the body reports cond=False, but
    # that iteration's v_out still lands → v = X + 3X = 4X... ONNX runs the
    # body while cond from the PREVIOUS iteration is true: i=0,1,2 execute
    # (c_out of i=2 is False, stopping i=3) → v0 + 3 adds = 4x? No: v starts
    # at X, 3 adds → 4X only if i=0..2 all add. c_out(i) = i < 2: i=0→T,
    # i=1→T, i=2→F. Iterations 0,1,2 all execute their Add; loop stops
    # before i=3. Final v = X + 3*X = 4*X.
    np.testing.assert_allclose(np.asarray(m.run(x)[0]), 4 * x, rtol=1e-6)


def test_probit_post_transform():
    """PROBIT = inverse standard-normal CDF (fixes the round-1 raise)."""
    from scipy.stats import norm  # available via the baked-in stack
    import jax.numpy as jnp

    from infera_tpu.onnx.ml_ops import _post_transform

    p = np.asarray([0.1, 0.25, 0.5, 0.9], np.float32)
    got = np.asarray(_post_transform(jnp.asarray(p), "PROBIT"))
    np.testing.assert_allclose(got, norm.ppf(p), rtol=1e-4, atol=1e-5)


def test_softmax_zero_post_transform():
    import jax.numpy as jnp

    from infera_tpu.onnx.ml_ops import _post_transform

    y = np.asarray([[1.0, 0.0, 2.0], [0.0, 0.0, 0.0]], np.float32)
    got = np.asarray(_post_transform(jnp.asarray(y), "SOFTMAX_ZERO"))
    e1, e2 = np.exp(1.0 - 2.0), np.exp(0.0)
    np.testing.assert_allclose(
        got[0], [e1 / (e1 + e2), 0.0, e2 / (e1 + e2)], rtol=1e-5)
    np.testing.assert_allclose(got[1], [0.0, 0.0, 0.0], atol=1e-7)
