"""Distributed-layer tests on the 8-device virtual CPU mesh
(SURVEY.md §4: simulated multi-chip tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infera_tpu.parallel.mesh import make_mesh
from infera_tpu.parallel.pipeline import (
    example_inputs,
    make_distributed_query_step,
    mlp_apply,
)
from infera_tpu.parallel.shuffle import shuffle_by_hash


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape["dp"] == 8
    assert mesh.shape["mp"] == 1


def test_shuffle_roundtrip(mesh):
    """Every row must arrive exactly once at the device owning its hash."""
    n = 8 * 64
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 30, n).astype(np.uint32)
    vals = rng.standard_normal(n).astype(np.float32)
    valid, keys_out, vals_out = shuffle_by_hash(
        mesh, jnp.asarray(keys), [jnp.asarray(keys.astype(np.int32)),
                                  jnp.asarray(vals)]
    )
    valid = np.asarray(valid)
    keys_out = np.asarray(keys_out)
    vals_out = np.asarray(vals_out)

    # collect valid rows and compare multiset against input
    got = sorted(zip(keys_out[valid].tolist(), vals_out[valid].tolist()))
    want = sorted(zip(keys.astype(np.int32).tolist(), vals.tolist()))
    assert got == want

    # ownership: rows on device d all have hash % 8 == d
    ndev = 8
    per_dev = len(valid) // ndev
    for d in range(ndev):
        seg_keys = keys_out[d * per_dev : (d + 1) * per_dev]
        seg_valid = valid[d * per_dev : (d + 1) * per_dev]
        assert (seg_keys[seg_valid].astype(np.uint32) % ndev == d).all()


def test_distributed_step_matches_single_device(mesh):
    """The 8-device pipeline must produce identical results to a plain
    single-device evaluation of the same query."""
    n_rows, in_dim, out_dim, n_groups = 8 * 32, 8, 4, 8
    cap = n_rows // 8
    step = make_distributed_query_step(mesh, n_groups=n_groups, cap=cap)
    params, x, keys = example_inputs(mesh, n_rows, in_dim, out_dim, n_groups)
    sums, counts, total = jax.block_until_ready(step(params, x, keys))

    # reference: single-device numpy
    xh = np.asarray(x)
    kh = np.asarray(keys)
    ph = [(np.asarray(w), np.asarray(b)) for w, b in params]
    h = xh
    for i, (w, b) in enumerate(ph):
        h = h @ w + b
        if i < len(ph) - 1:
            h = np.maximum(h, 0)
    sel = h[:, 0] > 0
    exp_total = sel.sum()
    exp_sums = np.zeros(n_groups)
    exp_counts = np.zeros(n_groups)
    np.add.at(exp_sums, kh % n_groups, np.where(sel, h[:, 0], 0.0))
    np.add.at(exp_counts, kh % n_groups, sel.astype(np.float64))

    assert float(total) == pytest.approx(float(exp_total))
    np.testing.assert_allclose(np.asarray(counts), exp_counts, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums), exp_sums, rtol=1e-4, atol=1e-4)


def test_mlp_apply_precision():
    rng = np.random.default_rng(0)
    params = [
        (jnp.asarray(rng.standard_normal((4, 8)), jnp.float32), jnp.zeros(8, jnp.float32)),
        (jnp.asarray(rng.standard_normal((8, 2)), jnp.float32), jnp.zeros(2, jnp.float32)),
    ]
    x = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    out = mlp_apply(params, x)
    h = np.maximum(np.asarray(x) @ np.asarray(params[0][0]), 0)
    expected = h @ np.asarray(params[1][0])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_device_join_correctness():
    from infera_tpu.ops.device_join import inner_join_indices_device

    rng = np.random.default_rng(1)
    lk = rng.integers(0, 50, 300).astype(np.int64)
    rk = rng.integers(0, 50, 200).astype(np.int64)
    li, ri = inner_join_indices_device(lk, rk)
    got = sorted(zip(lk[li].tolist(), li.tolist(), ri.tolist()))
    # reference nested loop
    want = sorted(
        (int(lk[i]), i, j)
        for i in range(len(lk))
        for j in range(len(rk))
        if lk[i] == rk[j]
    )
    assert [(k, i) for k, i, _ in got] == [(k, i) for k, i, _ in want]
    assert all(lk[i] == rk[j] for _, i, j in got)
    assert len(got) == len(want)


def test_device_join_empty():
    from infera_tpu.ops.device_join import inner_join_indices_device

    li, ri = inner_join_indices_device(
        np.array([1, 2, 3], np.int64), np.array([7, 8], np.int64)
    )
    assert len(li) == 0 and len(ri) == 0


def test_skewed_keys_with_split_matches_reference(mesh):
    """90%-hot-key distribution: hot-partition splitting must keep results
    exact (final psum merges split partials) and balance the receive load."""
    import jax

    n_rows, in_dim, out_dim, n_groups = 8 * 64, 8, 4, 8
    cap = n_rows // 8
    step = make_distributed_query_step(mesh, n_groups=n_groups, cap=cap,
                                       skew_split=True, hot_factor=2.0)
    params, x, _ = example_inputs(mesh, n_rows, in_dim, out_dim, n_groups)
    rng = np.random.default_rng(7)
    raw = np.where(rng.random(n_rows) < 0.9, 3, rng.integers(0, n_groups, n_rows))
    keys = jax.device_put(
        jnp.asarray(raw.astype(np.int32)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp")),
    )
    sums, counts, total = jax.block_until_ready(step(params, x, keys))

    xh = np.asarray(x)
    ph = [(np.asarray(w), np.asarray(b)) for w, b in params]
    h = xh
    for i, (w, b) in enumerate(ph):
        h = h @ w + b
        if i < len(ph) - 1:
            h = np.maximum(h, 0)
    sel = h[:, 0] > 0
    exp_sums = np.zeros(n_groups)
    exp_counts = np.zeros(n_groups)
    np.add.at(exp_sums, raw % n_groups, np.where(sel, h[:, 0], 0.0))
    np.add.at(exp_counts, raw % n_groups, sel.astype(np.float64))
    np.testing.assert_allclose(np.asarray(counts), exp_counts, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums), exp_sums, rtol=1e-4, atol=1e-4)
    assert float(total) == pytest.approx(float(sel.sum()))


def test_tensor_parallel_mlp_matches_replicated():
    """(dp=4, mp=2) mesh: column/row-sharded weights + psum must equal the
    replicated single-device MLP."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from infera_tpu.parallel.pipeline import make_tp_inference_step

    mesh = make_mesh(8, mp=2)
    rng = np.random.default_rng(0)
    d_in, hidden, d_out, n = 8, 32, 4, 4 * 16
    w1 = rng.standard_normal((d_in, hidden)).astype(np.float32) * 0.3
    b1 = rng.standard_normal(hidden).astype(np.float32) * 0.1
    w2 = rng.standard_normal((hidden, d_out)).astype(np.float32) * 0.3
    b2 = rng.standard_normal(d_out).astype(np.float32) * 0.1
    x = rng.standard_normal((n, d_in)).astype(np.float32)

    params = (
        (jax.device_put(jnp.asarray(w1), NamedSharding(mesh, P(None, "mp"))),
         jax.device_put(jnp.asarray(b1), NamedSharding(mesh, P("mp")))),
        (jax.device_put(jnp.asarray(w2), NamedSharding(mesh, P("mp", None))),
         jax.device_put(jnp.asarray(b2), NamedSharding(mesh, P()))),
    )
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp", None)))
    step = make_tp_inference_step(mesh)
    out = np.asarray(jax.block_until_ready(step(params, xs)))

    want = np.maximum(x @ w1 + b1, 0) @ w2 + b2
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_onnx_model_data_parallel_inference(mesh):
    """Any loaded ONNX model runs dp-sharded over the mesh and matches the
    single-device result."""
    from infera_tpu.onnx import builder
    from infera_tpu.onnx.executor import compile_model_bytes

    model = compile_model_bytes(
        builder.mlp_model(in_dim=8, hidden=(16,), out_dim=4).serialize(), "m")
    x = np.random.default_rng(0).standard_normal((8 * 16, 8)).astype(np.float32)
    sharded = np.asarray(model.run_data_parallel(mesh, jnp.asarray(x))[0])
    single = np.asarray(model.run(x)[0])
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_gbt_data_parallel(mesh):
    from infera_tpu.onnx import builder
    from infera_tpu.onnx.executor import compile_model_bytes

    model = compile_model_bytes(
        builder.gbt_regressor_model(n_features=4, n_trees=4, depth=3).serialize(),
        "gbt")
    x = np.random.default_rng(1).standard_normal((8 * 8, 4)).astype(np.float32)
    sharded = np.asarray(model.run_data_parallel(mesh, jnp.asarray(x))[0])
    single = np.asarray(model.run(x)[0])
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_pipeline_parallel_matches_sequential():
    """GPipe microbatch pipeline over the mp axis == sequential layer stack."""
    import jax
    import jax.numpy as jnp

    from infera_tpu.parallel.mesh import make_mesh
    from infera_tpu.parallel.pipeline import make_pp_inference_step

    n_stages, n_micro, mb, d = 4, 6, 8, 16
    mesh = make_mesh(4, mp=4)  # dp=1, mp=4 (stage axis)
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((n_stages, d, d)), jnp.float32) * 0.3
    B = jnp.asarray(rng.standard_normal((n_stages, d)), jnp.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((n_micro, mb, d)), jnp.float32)

    step = make_pp_inference_step(mesh, n_stages, n_micro)
    got = np.asarray(step((W, B), x))

    h = np.asarray(x).reshape(-1, d)
    for s in range(n_stages):
        h = np.maximum(h @ np.asarray(W[s]) + np.asarray(B[s]), 0.0)
    want = h.reshape(n_micro, mb, d)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_expert_parallel_routing_matches_dense():
    """MoE routing over the mp axis: every row gets its own expert's output."""
    import jax
    import jax.numpy as jnp

    from infera_tpu.parallel.mesh import make_mesh
    from infera_tpu.parallel.pipeline import make_ep_inference_step

    n_experts, d = 4, 8
    mesh = make_mesh(4, mp=4)
    rng = np.random.default_rng(1)
    EW = jnp.asarray(rng.standard_normal((n_experts, d, d)), jnp.float32) * 0.4
    EB = jnp.asarray(rng.standard_normal((n_experts, d)), jnp.float32) * 0.1
    n = 64  # rows per device slice is n/4
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    eid = jnp.asarray(rng.integers(0, n_experts, n), jnp.int32)

    step = make_ep_inference_step(mesh, n_experts, cap=n)  # cap ample
    got, routed = step(EW, EB, x, eid)
    got = np.asarray(got)
    assert int(routed) == n

    xh = np.asarray(x)
    want = np.empty_like(xh)
    for i in range(n):
        e = int(eid[i])
        want[i] = np.maximum(xh[i] @ np.asarray(EW[e]) + np.asarray(EB[e]), 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(causal):
    """Sequence-parallel ring attention == dense softmax attention."""
    import jax.numpy as jnp

    from infera_tpu.parallel.mesh import make_mesh
    from infera_tpu.parallel.ring_attention import make_ring_attention_step

    mesh = make_mesh(4, mp=4)
    seq, d = 32, 16  # 8 rows per device
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((seq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((seq, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((seq, d)), jnp.float32)

    step = make_ring_attention_step(mesh, causal=causal)
    got = np.asarray(step(q, k, v))

    scores = (np.asarray(q) @ np.asarray(k).T) / np.sqrt(d)
    if causal:
        scores = np.where(np.triu(np.ones((seq, seq), bool), 1), -np.inf, scores)
    w = np.exp(scores - scores.max(axis=1, keepdims=True))
    w = w / w.sum(axis=1, keepdims=True)
    want = w @ np.asarray(v)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
