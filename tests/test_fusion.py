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
    params, final_softmax = plan[0], plan[1]
    assert final_softmax
    assert [w.shape for w, _ in params] == [(8, 16), (16, 16), (16, 4)]


def test_detects_linear_model():
    m = builder.linear_model()
    plan = detect_mlp(m.graph)
    assert plan is not None
    params, final_softmax = plan[0], plan[1]
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


def test_auto_probe_picks_faster_path(monkeypatch):
    """Mode auto (env unset): the engine times kernel vs XLA once per
    (model, shape), caches the choice on the model, and never re-probes."""
    import infera_tpu.onnx.fusion as fu

    monkeypatch.delenv("INFERA_PALLAS_MLP", raising=False)
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    probes = {"n": 0}

    def fake_probe(run_kernel, run_xla, arr, iters=20):
        probes["n"] += 1
        return "xla"

    monkeypatch.setattr(fu, "_probe_choice", fake_probe)
    m = builder.mlp_model(in_dim=8, hidden=(16,), out_dim=4)
    compiled = compile_model_bytes(m.serialize(), "mlp_probe")
    x = np.random.default_rng(0).standard_normal((32, 8)).astype(np.float32)
    out1 = np.asarray(compiled.run(x)[0])   # probes once, picks xla
    out2 = np.asarray(compiled.run(x)[0])   # cached decision, no re-probe
    assert probes["n"] == 1
    assert compiled._pallas_choice == {(32, 8): "xla"}
    np.testing.assert_allclose(out1, out2)

    # a different batch shape probes again
    x2 = np.random.default_rng(1).standard_normal((64, 8)).astype(np.float32)
    compiled.run(x2)
    assert probes["n"] == 2


def test_auto_probe_kernel_wins(monkeypatch):
    """When the probe says the kernel is faster, the kernel path runs
    (validated through interpret mode off-TPU) and matches XLA."""
    import infera_tpu.onnx.fusion as fu
    import infera_tpu.ops.pallas_mlp as pm

    monkeypatch.delenv("INFERA_PALLAS_MLP", raising=False)
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    monkeypatch.setattr(fu, "_probe_choice", lambda *a, **k: "pallas")
    orig = pm.fused_mlp_padded
    monkeypatch.setattr(
        pm, "fused_mlp_padded",
        lambda params, x, tile_n=1024, final_softmax=False, interpret=False:
        orig(params, x, tile_n=256, final_softmax=final_softmax,
             interpret=True))
    m = builder.mlp_model(in_dim=8, hidden=(16,), out_dim=4)
    compiled = compile_model_bytes(m.serialize(), "mlp_pwin")
    x = np.random.default_rng(0).standard_normal((32, 8)).astype(np.float32)
    out_fused = np.asarray(compiled.run(x)[0])
    monkeypatch.setenv("INFERA_PALLAS_MLP", "0")
    out_xla = np.asarray(compiled.run(x)[0])
    np.testing.assert_allclose(out_fused, out_xla, rtol=1e-4, atol=1e-5)


def test_force_off_skips_probe(monkeypatch):
    import infera_tpu.onnx.fusion as fu

    monkeypatch.setenv("INFERA_PALLAS_MLP", "0")
    monkeypatch.setattr(fu, "_probe_choice",
                        lambda *a, **k: (_ for _ in ()).throw(AssertionError))
    m = builder.mlp_model(in_dim=8, hidden=(16,), out_dim=4)
    compiled = compile_model_bytes(m.serialize(), "mlp_off")
    x = np.random.default_rng(0).standard_normal((16, 8)).astype(np.float32)
    compiled.run(x)
    assert not hasattr(compiled, "_pallas_choice")
