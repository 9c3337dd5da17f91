"""Pallas kernel tests (interpret mode on CPU; the compiled path runs on the
real chip via bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from infera_tpu.ops.pallas_mlp import fused_mlp_padded, vmem_fits
from infera_tpu.ops.pallas_query import fused_mlp_query


@pytest.fixture(scope="module")
def mlp_params():
    rng = np.random.default_rng(0)
    dims = [32, 128, 128, 16]
    params = []
    for i in range(len(dims) - 1):
        params.append((
            jnp.asarray(rng.standard_normal((dims[i], dims[i + 1])), jnp.float32) * 0.2,
            jnp.asarray(rng.standard_normal(dims[i + 1]), jnp.float32) * 0.1,
        ))
    return params


def _ref_mlp(params, x):
    h = np.asarray(x)
    for i, (w, b) in enumerate(params):
        h = h @ np.asarray(w) + np.asarray(b)
        if i < len(params) - 1:
            h = np.maximum(h, 0)
    return h


def test_fused_mlp_matches_reference(mlp_params):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1000, 32)), jnp.float32)
    out = fused_mlp_padded(mlp_params, x, tile_n=256, interpret=True)
    want = _ref_mlp(mlp_params, x)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
    assert out.shape == (1000, 16)


def test_fused_query_matches_reference(mlp_params):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2048, 32)), jnp.float32)
    counts, sums = fused_mlp_query(mlp_params, x, tile_n=256, interpret=True)
    h = _ref_mlp(mlp_params, x)
    pred = h.argmax(-1)
    sel = h[:, 0] > 0
    ec = np.zeros(16)
    es = np.zeros(16)
    np.add.at(ec, pred, sel.astype(float))
    np.add.at(es, pred, np.where(sel, h[:, 0], 0.0))
    np.testing.assert_allclose(np.asarray(counts), ec, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sums), es, rtol=1e-3, atol=1e-3)
    assert float(counts.sum()) == float(sel.sum())


def test_fused_query_bf16_matches_bf16_reference(mlp_params):
    """bf16-compute variant (f32 accumulate): must match a numpy emulation
    of the same precision recipe, and stay near the f32 answer."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2048, 32)), jnp.float32)
    counts, sums = fused_mlp_query(mlp_params, x, tile_n=256, interpret=True,
                                   compute_dtype=jnp.bfloat16)
    # numpy bf16 emulation: round inputs/weights to bf16, accumulate in f32
    def bf16(a):
        return np.asarray(jnp.asarray(a, jnp.bfloat16).astype(jnp.float32))

    h = bf16(x)
    for i, (w, b) in enumerate(mlp_params):
        h = (h @ bf16(w)).astype(np.float32) + np.asarray(b)
        if i < len(mlp_params) - 1:
            h = bf16(np.maximum(h, 0))
    pred = h.argmax(-1)
    sel = h[:, 0] > 0
    ec = np.zeros(16)
    es = np.zeros(16)
    np.add.at(ec, pred, sel.astype(float))
    np.add.at(es, pred, np.where(sel, h[:, 0], 0.0))
    np.testing.assert_allclose(np.asarray(counts), ec, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sums), es, rtol=2e-2, atol=1e-2)
    # and the bf16 answer is a faithful approximation of the f32 one
    c32, s32 = fused_mlp_query(mlp_params, x, tile_n=256, interpret=True)
    assert abs(float(counts.sum()) - float(c32.sum())) <= 8
    np.testing.assert_allclose(float(sums.sum()), float(s32.sum()), rtol=5e-2)


def test_vmem_budget_check(mlp_params):
    small = [(np.asarray(w), np.asarray(b)) for w, b in mlp_params]
    assert vmem_fits(small, 1024, 32)
    rng = np.random.default_rng(0)
    huge = [(rng.standard_normal((4096, 4096)).astype(np.float32),
             np.zeros(4096, np.float32))]
    assert not vmem_fits(huge, 1024, 4096)


def test_fused_query_columnar_matches_rowmajor(mlp_params):
    """The feature-major kernel (round-3 layout fix: lane-dense [d, tile]
    blocks + lane-strided accumulators) computes identical counts and
    matching sums to the row-major kernel and numpy reference."""
    from infera_tpu.ops.pallas_query import fused_mlp_query_columnar

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1024, 32)), jnp.float32)
    c_row, s_row = fused_mlp_query(mlp_params, x, tile_n=256, interpret=True)
    c_col, s_col = fused_mlp_query_columnar(mlp_params, x.T, tile_n=256,
                                            interpret=True)
    h = _ref_mlp(mlp_params, x)
    pred = h.argmax(axis=1)
    sel = h[:, 0] > 0
    want_c = np.zeros(16)
    want_s = np.zeros(16)
    np.add.at(want_c, pred[sel], 1.0)
    np.add.at(want_s, pred[sel], h[sel, 0])
    np.testing.assert_allclose(np.asarray(c_col), want_c, atol=0)
    np.testing.assert_allclose(np.asarray(c_row), np.asarray(c_col), atol=0)
    np.testing.assert_allclose(np.asarray(s_col), want_s, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_row), np.asarray(s_col),
                               rtol=1e-4, atol=1e-4)


def test_int8_columnar_query_matches_static_path():
    """int8 columnar kernel (interpret): counts/sums track the f32 kernel
    within int8 quantization tolerance, and the math matches the static-
    calibration epilogue exactly (same scales as onnx/fusion's chain)."""
    import numpy as np

    from infera_tpu.ops.pallas_query import (
        fused_mlp_query_columnar, fused_mlp_query_columnar_int8,
        quantize_mlp_static)

    rng = np.random.default_rng(3)
    dims = [32, 64, 16]
    params = []
    for i in range(len(dims) - 1):
        w = rng.standard_normal((dims[i], dims[i + 1])).astype(
            np.float32) / np.float32(np.sqrt(dims[i]))
        b = rng.standard_normal(dims[i + 1]).astype(np.float32) * 0.1
        params.append((w, b.astype(np.float32)))
    n = 2048
    x = rng.standard_normal((n, 32)).astype(np.float32)
    qparams, s0 = quantize_mlp_static(params, x[:512])
    xq = np.clip(np.rint(x / s0), -127, 127).astype(np.int8).T.copy()
    c8, s8 = fused_mlp_query_columnar_int8(qparams, jnp.asarray(xq),
                                           tile_n=256, interpret=True)
    jp = [(jnp.asarray(w), jnp.asarray(b)) for w, b in params]
    cf, sf = fused_mlp_query_columnar(jp, jnp.asarray(x.T.copy()),
                                      tile_n=256, interpret=True)
    c8, s8, cf, sf = map(np.asarray, (c8, s8, cf, sf))
    assert c8.sum() == pytest.approx(cf.sum(), rel=0.02)  # same filter rate
    assert abs(c8 - cf).sum() / max(cf.sum(), 1) < 0.05   # few class flips
    assert s8.sum() == pytest.approx(sf.sum(), rel=0.05)


def test_int8_shift_only_query_matches_emulation():
    """Shift-only int8 kernel (VERDICT r4 item 5): power-of-two scales
    make the hidden epilogues pure integer shifts; the interpret-mode
    kernel must match quantize_mlp_shift's numpy integer emulation
    EXACTLY (same classifications, same counts), track the f32 kernel
    within quantization tolerance, and the gate must refuse models whose
    class-flip rate exceeds the bound."""
    import numpy as np

    from infera_tpu.ops.pallas_query import (
        fused_mlp_query_columnar, fused_mlp_query_columnar_int8_shift,
        quantize_mlp_shift)

    rng = np.random.default_rng(5)
    dims = [32, 64, 16]
    params = []
    for i in range(len(dims) - 1):
        w = rng.standard_normal((dims[i], dims[i + 1])).astype(
            np.float32) / np.float32(np.sqrt(dims[i]))
        b = rng.standard_normal(dims[i + 1]).astype(np.float32) * 0.1
        params.append((w, b.astype(np.float32)))
    n = 2048
    x = rng.standard_normal((n, 32)).astype(np.float32)
    got = quantize_mlp_shift(params, x[:512], max_flip_rate=0.05)
    assert got is not None
    qparams, s0, flip = got
    assert 0.0 <= flip <= 0.05
    # every hidden requant multiplier is an exact power of two (the input
    # scale itself need not be — only the layer RATIOS enter the shifts)
    for li in range(len(qparams) - 1):
        assert qparams[li][1].dtype == np.int32  # sl
        assert qparams[li][2].dtype == np.int32  # sr
    xq = np.clip(np.rint(x / s0), -127, 127).astype(np.int8).T.copy()
    c8, s8 = fused_mlp_query_columnar_int8_shift(
        qparams, jnp.asarray(xq), tile_n=256, interpret=True)
    jp = [(jnp.asarray(w), jnp.asarray(b)) for w, b in params]
    cf, sf = fused_mlp_query_columnar(jp, jnp.asarray(x.T.copy()),
                                      tile_n=256, interpret=True)
    c8, s8, cf, sf = map(np.asarray, (c8, s8, cf, sf))
    # integer pipeline emulation (the gate's own math) — counts bit-exact
    q = np.clip(np.rint(x / s0), -127, 127).astype(np.int64)
    for i in range(len(params)):
        wq = qparams[i][0].astype(np.int64).T
        y = q @ wq
        if i == len(params) - 1:
            h = y.astype(np.float64) * qparams[i][1].reshape(-1) \
                + qparams[i][3].reshape(-1)
        else:
            sl = qparams[i][1].reshape(-1).astype(np.int64)
            sr = qparams[i][2].reshape(-1).astype(np.int64)
            # qparams[3] pre-folds bias + rounding half
            q = np.clip(((y << sl) + qparams[i][3].reshape(-1))
                        >> sr, 0, 127)
    pred = np.argmax(h, axis=-1)
    sel = h[:, 0] > 0
    want_counts = np.bincount(pred[sel], minlength=16).astype(np.float64)
    np.testing.assert_array_equal(c8, want_counts)
    # tracks the f32 kernel within int8 tolerance
    assert c8.sum() == pytest.approx(cf.sum(), rel=0.03)
    assert abs(c8 - cf).sum() / max(cf.sum(), 1) < 0.06
    assert s8.sum() == pytest.approx(sf.sum(), rel=0.05)
    # gate refusal: an impossible flip bound returns None
    assert quantize_mlp_shift(params, x[:512], max_flip_rate=0.0) is None \
        or flip == 0.0
