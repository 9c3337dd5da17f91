"""MLP graph-pattern fusion tests: detection and fused-path equivalence."""

import numpy as np
import pytest

from infera_tpu.onnx import builder
from infera_tpu.onnx.executor import compile_model_bytes
from infera_tpu.onnx.fusion import detect_mlp


def test_detects_builder_mlp():
    m = builder.mlp_model(in_dim=8, hidden=(16, 16), out_dim=4, softmax=True)
    plan = detect_mlp(m.graph)
    assert plan is not None
    params, final_softmax = plan
    assert final_softmax
    assert [w.shape for w, _ in params] == [(8, 16), (16, 16), (16, 4)]


def test_detects_linear_model():
    m = builder.linear_model()
    plan = detect_mlp(m.graph)
    assert plan is not None
    params, final_softmax = plan
    assert not final_softmax
    assert len(params) == 1 and params[0][0].shape == (3, 1)
    np.testing.assert_array_equal(params[0][1], np.array([0.25], np.float32))


def test_rejects_non_mlp():
    assert detect_mlp(builder.multi_output_model().graph) is None
    assert detect_mlp(builder.gbt_regressor_model(n_features=4, n_trees=2,
                                                  depth=2).graph) is None


def test_fused_path_matches_xla(monkeypatch):
    """Route the fused path through interpret mode so the equivalence check
    runs off-TPU."""
    import infera_tpu.ops.pallas_mlp as pm

    monkeypatch.setenv("INFERA_PALLAS_MLP", "1")
    orig = pm.fused_mlp_padded

    def interp(params, x, tile_n=1024, final_softmax=False, interpret=False):
        return orig(params, x, tile_n=256, final_softmax=final_softmax,
                    interpret=True)

    monkeypatch.setattr(pm, "fused_mlp_padded", interp)

    m = builder.mlp_model(in_dim=8, hidden=(16,), out_dim=4, softmax=True)
    compiled = compile_model_bytes(m.serialize(), "mlp")
    assert compiled.mlp_plan is not None
    x = np.random.default_rng(0).standard_normal((32, 8)).astype(np.float32)
    out_fused = np.asarray(compiled.run(x)[0])

    monkeypatch.delenv("INFERA_PALLAS_MLP")
    compiled2 = compile_model_bytes(m.serialize(), "mlp2")
    out_xla = np.asarray(compiled2.run(x)[0])
    np.testing.assert_allclose(out_fused, out_xla, rtol=1e-4, atol=1e-5)
