"""Model quantization (bf16 / int8 weight paths) — an extension over the
reference (its ROADMAP §"Model quantization" item is unchecked). The f32
default must stay reference-exact; quantized loads trade small accuracy for
MXU-native throughput."""

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.errors import OnnxError, SqlError
from infera_tpu.onnx import builder, proto
from infera_tpu.onnx.executor import compile_model_bytes


def _save(model, tmp_path, fname):
    p = tmp_path / fname
    proto.save_model_file(model, p)
    return str(p)


def test_default_precision_stays_exact(tmp_path, clean_registry):
    """The 1.75 anchor must be bit-stable under the default f32 policy."""
    p = _save(builder.linear_model(), tmp_path, "linear.onnx")
    it.load_model("linear", p)
    res = it.predict("linear", np.array([[1.0, 2.0, 3.0]], np.float32))
    assert abs(float(res.data[0]) - 1.75) < 1e-6
    # default info envelope keeps the reference-exact 4 keys
    assert it.get_model_info("linear") == (
        '{"name":"linear","input_shape":[1,3],"output_shape":[1,1],"loaded":true}'
    )


@pytest.mark.parametrize("precision,rtol", [("bf16", 0.05), ("int8", 0.08)])
def test_quantized_mlp_close_to_f32(tmp_path, clean_registry, precision, rtol):
    model = builder.mlp_model(in_dim=16, hidden=(64, 64), out_dim=8,
                              softmax=False, seed=2)
    p = _save(model, tmp_path, "mlp.onnx")
    it.load_model("mlp_f32", p)
    it.load_model("mlp_q", p, precision=precision)
    x = np.random.default_rng(0).standard_normal((256, 16)).astype(np.float32)
    ref = np.asarray(it.predict("mlp_f32", x).data)
    got = np.asarray(it.predict("mlp_q", x).data)
    # relative to the output magnitude, not elementwise (outputs near 0)
    scale = np.abs(ref).mean()
    assert np.abs(got - ref).mean() < rtol * scale
    assert it.get_model_info("mlp_q").endswith(f'"precision":"{precision}"}}')


def test_int8_gemm_transb(clean_registry):
    """Per-channel scales must follow the effective (post-transpose) weight
    orientation."""
    from infera_tpu.onnx.proto import (
        Attribute, DataType, Graph, Model, Node, Tensor, ValueInfo,
    )

    rng = np.random.default_rng(3)
    w = rng.standard_normal((4, 8)).astype(np.float32)  # [out, in] (transB)
    g = Graph(
        name="g",
        nodes=[Node(op_type="Gemm", inputs=["X", "W"], outputs=["Y"],
                    attributes={"transB": Attribute.make("transB", 1)})],
        initializers={"W": Tensor.from_array("W", w)},
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, 8])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[-1, 4])],
    )
    model = Model(graph=g)
    x = rng.standard_normal((32, 8)).astype(np.float32)
    ref = np.asarray(compile_model_bytes(model.serialize(), "t_f32").run(x)[0])
    got = np.asarray(
        compile_model_bytes(model.serialize(), "t_q", precision="int8").run(x)[0])
    assert np.abs(got - ref).mean() < 0.05 * np.abs(ref).mean()


def test_invalid_precision_rejected(tmp_path, clean_registry):
    p = _save(builder.linear_model(), tmp_path, "linear.onnx")
    with pytest.raises(OnnxError, match="unsupported precision 'fp4'"):
        it.load_model("bad", p, precision="fp4")


def test_sql_three_arg_load(tmp_path, clean_registry):
    from infera_tpu.sql import Connection

    p = _save(builder.mlp_model(in_dim=4, hidden=(8,), out_dim=2,
                                softmax=False, seed=1), tmp_path, "m.onnx")
    conn = Connection()
    rows = conn.execute(
        f"select infera_load_model('mq', '{p}', 'bf16')").rows
    assert rows == [(True,)]
    out = conn.execute(
        "select infera_get_model_info('mq')").rows[0][0]
    assert '"precision":"bf16"' in out
    # 2-arg parity form still enforces its exact arity message
    with pytest.raises(SqlError, match="expects exactly 2 arguments"):
        conn.execute("select infera_load_model('x')")


def test_sql_invalid_precision_message(tmp_path, clean_registry):
    from infera_tpu.sql import Connection

    p = _save(builder.linear_model(), tmp_path, "linear.onnx")
    conn = Connection()
    with pytest.raises(SqlError,
                       match="Failed to load model 'lq'.*unsupported precision"):
        conn.execute(f"select infera_load_model('lq', '{p}', 'q4')")


def test_int8_static_calibration(tmp_path, clean_registry):
    """First execution calibrates static per-tensor activation scales; the
    second execution uses them (constant-folded dequant) and stays close to
    f32. Out-of-range later batches clip (standard int8 semantics) but
    in-range batches match the dynamic path's accuracy."""
    from infera_tpu.onnx import builder
    from infera_tpu.onnx.executor import compile_model_bytes

    m = builder.mlp_model(in_dim=16, hidden=(64, 64), out_dim=8)
    c8 = compile_model_bytes(m.serialize(), "m8", precision="int8")
    cf = compile_model_bytes(m.serialize(), "mf", precision="f32")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((512, 16)).astype(np.float32)

    out1 = np.asarray(c8.run(x)[0])   # calibrates, then runs static
    assert c8._int8_calibrated
    out2 = np.asarray(c8.run(x)[0])   # static path, cached scales
    ref = np.asarray(cf.run(x)[0])
    np.testing.assert_allclose(out1, ref, rtol=0.15, atol=0.15)
    np.testing.assert_allclose(out2, ref, rtol=0.15, atol=0.15)

    # a same-distribution second batch also stays close
    x2 = rng.standard_normal((256, 16)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(c8.run(x2)[0]),
                               np.asarray(cf.run(x2)[0]),
                               rtol=0.2, atol=0.2)


def test_int8_explicit_calibrate_api(tmp_path, clean_registry):
    from infera_tpu.onnx import builder
    from infera_tpu.onnx.executor import compile_model_bytes

    m = builder.mlp_model(in_dim=8, hidden=(32,), out_dim=4)
    c8 = compile_model_bytes(m.serialize(), "m8b", precision="int8")
    sample = np.random.default_rng(1).standard_normal((128, 8)).astype(np.float32)
    c8.calibrate_int8([sample])
    assert c8._int8_calibrated
    out = np.asarray(c8.run(sample)[0])
    assert np.isfinite(out).all()


def test_int8_fused_chain_static_scales():
    """The fused int8 MLP chain (hidden activations stay int8) engages
    after calibration and matches the per-layer static path exactly —
    requantization uses the same calibrated scales, so hidden int8 values
    are identical (onnx/fusion.py maybe_run_int8_fused)."""
    import numpy as np

    from infera_tpu.onnx.builder import mlp_model
    from infera_tpu.onnx.executor import compile_model_bytes

    data = mlp_model(in_dim=64, hidden=(64, 64), out_dim=8).serialize()
    x = np.random.default_rng(0).standard_normal((512, 64)).astype(
        np.float32)
    f32 = np.asarray(compile_model_bytes(data, "q_f").run(x)[0])
    m8 = compile_model_bytes(data, "q_8", precision="int8")
    m8.calibrate_int8([x[:256]])
    # calibration actually recorded static scales (the flag-propagation
    # regression left them None and the dynamic path silently running)
    assert all(getattr(nd, "_infera_act_scale", None)
               for nd in m8.mlp_plan[2])
    out8 = np.asarray(m8.run(x)[0])
    assert getattr(m8, "_int8_fused_cache", None)  # fused path executed
    scale = np.abs(f32).max()
    assert np.abs(out8 - f32).max() / scale < 0.05
    m8b = compile_model_bytes(data, "q_8b", precision="int8")
    m8b.calibrate_int8([x[:256]])
    m8b.mlp_plan = None  # force the per-layer static path
    ref8 = np.asarray(m8b.run(x)[0])
    np.testing.assert_array_equal(out8, ref8)


def test_int8_fused_cache_keys_on_scales():
    """ADVICE r3 (low): the fused-int8 jit cache bakes the calibrated
    activation scales in as constants, so its key must include them — a
    changed scale must miss the cache (fresh compile), not silently reuse
    the stale closure."""
    import numpy as np

    from infera_tpu.onnx.builder import mlp_model
    from infera_tpu.onnx.executor import compile_model_bytes
    from infera_tpu.onnx.fusion import maybe_run_int8_fused

    data = mlp_model(in_dim=32, hidden=(32,), out_dim=4).serialize()
    x = np.random.default_rng(1).standard_normal((64, 32)).astype(np.float32)
    m8 = compile_model_bytes(data, "q_key", precision="int8")
    m8.calibrate_int8([x])
    out_a = np.asarray(maybe_run_int8_fused(m8, x))
    assert len(m8._int8_fused_cache) == 1
    for nd in m8.mlp_plan[2]:
        nd._infera_act_scale = nd._infera_act_scale * 2.0
    out_b = np.asarray(maybe_run_int8_fused(m8, x))
    assert len(m8._int8_fused_cache) == 2  # new scales -> new cache entry
    assert not np.array_equal(out_a, out_b)
