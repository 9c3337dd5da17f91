"""ai.onnx.ml tree-ensemble lowering tests: the gather-based traversal must
match a straightforward host-side tree walk."""

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.onnx import builder, proto
from infera_tpu.onnx.executor import compile_model_bytes


def _host_gbt_predict(model: proto.Model, x: np.ndarray) -> np.ndarray:
    """Reference implementation: per-row, per-tree pointer chase."""
    node = model.graph.nodes[0]
    a = {k: v.value for k, v in node.attributes.items()}
    tree_ids = np.asarray(a["nodes_treeids"])
    node_ids = np.asarray(a["nodes_nodeids"])
    feats = np.asarray(a["nodes_featureids"])
    modes = a["nodes_modes"]
    values = np.asarray(a["nodes_values"], np.float32)
    t_child = np.asarray(a["nodes_truenodeids"])
    f_child = np.asarray(a["nodes_falsenodeids"])
    trees = np.unique(tree_ids)
    # index node table per tree
    tbl = {}
    for k in range(len(tree_ids)):
        tbl[(tree_ids[k], node_ids[k])] = k
    leaf_w = {}
    for t, nd, tid, w in zip(a["target_treeids"], a["target_nodeids"],
                             a["target_ids"], a["target_weights"]):
        leaf_w[(t, nd)] = leaf_w.get((t, nd), 0.0) + w
    base = a.get("base_values", [0.0])[0]
    out = np.zeros(len(x), np.float32)
    for i, row in enumerate(x):
        acc = base
        for t in trees:
            nd = 0
            while True:
                k = tbl[(t, nd)]
                if modes[k] == "LEAF":
                    acc += leaf_w.get((t, nd), 0.0)
                    break
                nd = t_child[k] if row[feats[k]] <= values[k] else f_child[k]
        out[i] = acc
    return out


def test_gbt_regressor_matches_host_walk():
    model = builder.gbt_regressor_model(n_features=8, n_trees=5, depth=4, seed=3)
    compiled = compile_model_bytes(model.serialize(), "gbt")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 8)).astype(np.float32)
    got = np.asarray(compiled.run(x)[0]).reshape(-1)
    want = _host_gbt_predict(model, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gbt_through_predict_api(tmp_path, clean_registry):
    model = builder.gbt_regressor_model(n_features=4, n_trees=3, depth=3, seed=1)
    p = tmp_path / "gbt.onnx"
    proto.save_model_file(model, p)
    it.load_model("gbt", str(p))
    info = it.get_model_info("gbt")
    assert '"input_shape":[-1,4]' in info
    x = np.random.default_rng(2).standard_normal((10, 4)).astype(np.float32)
    res = it.predict("gbt", x)
    assert (res.rows, res.cols) == (10, 1)
    want = _host_gbt_predict(model, x)
    np.testing.assert_allclose(res.data, want, rtol=1e-5, atol=1e-5)


def test_tree_classifier():
    """Hand-built 2-tree classifier over 2 classes."""
    from infera_tpu.onnx.proto import (
        Attribute, DataType, Graph, Model, Node, ValueInfo,
    )

    # tree 0: x0 <= 0 → class0 weight 1 ; else class1 weight 1
    attrs = {
        "classlabels_int64s": Attribute.make("classlabels_int64s", [10, 20]),
        "nodes_treeids": Attribute.make("nodes_treeids", [0, 0, 0]),
        "nodes_nodeids": Attribute.make("nodes_nodeids", [0, 1, 2]),
        "nodes_featureids": Attribute.make("nodes_featureids", [0, 0, 0]),
        "nodes_modes": Attribute.make("nodes_modes",
                                      ["BRANCH_LEQ", "LEAF", "LEAF"]),
        "nodes_values": Attribute.make("nodes_values", [0.0, 0.0, 0.0]),
        "nodes_truenodeids": Attribute.make("nodes_truenodeids", [1, 0, 0]),
        "nodes_falsenodeids": Attribute.make("nodes_falsenodeids", [2, 0, 0]),
        "class_treeids": Attribute.make("class_treeids", [0, 0]),
        "class_nodeids": Attribute.make("class_nodeids", [1, 2]),
        "class_ids": Attribute.make("class_ids", [0, 1]),
        "class_weights": Attribute.make("class_weights", [1.0, 1.0]),
        "post_transform": Attribute.make("post_transform", "NONE"),
    }
    g = Graph(
        name="clf",
        nodes=[Node(op_type="TreeEnsembleClassifier", domain="ai.onnx.ml",
                    inputs=["X"], outputs=["label", "scores"],
                    attributes=attrs)],
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, 1])],
        outputs=[
            ValueInfo(name="label", elem_type=DataType.INT64, shape=[-1]),
            ValueInfo(name="scores", elem_type=DataType.FLOAT, shape=[-1, 2]),
        ],
    )
    model = Model(graph=g, opset_imports=[("", 13), ("ai.onnx.ml", 3)])
    compiled = compile_model_bytes(model.serialize(), "clf")
    x = np.array([[-1.0], [1.0], [0.0]], np.float32)
    label, scores = compiled.run(x)
    np.testing.assert_array_equal(np.asarray(label), [10, 20, 10])
    np.testing.assert_array_equal(np.asarray(scores),
                                  [[1, 0], [0, 1], [1, 0]])


def test_linear_regressor_ml():
    from infera_tpu.onnx.proto import (
        Attribute, DataType, Graph, Model, Node, ValueInfo,
    )

    attrs = {
        "coefficients": Attribute.make("coefficients", [2.0, -1.0, 0.5]),
        "intercepts": Attribute.make("intercepts", [0.25]),
        "targets": Attribute.make("targets", 1),
    }
    g = Graph(
        name="lr",
        nodes=[Node(op_type="LinearRegressor", domain="ai.onnx.ml",
                    inputs=["X"], outputs=["Y"], attributes=attrs)],
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, 3])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[-1, 1])],
    )
    compiled = compile_model_bytes(Model(graph=g).serialize(), "lr")
    out = np.asarray(compiled.run(np.array([[1.0, 2.0, 3.0]], np.float32))[0])
    assert abs(float(out.reshape(-1)[0]) - 1.75) < 1e-6


def _compile_fresh(model, name):
    """Fresh compile (fresh Node objects) so the tree-mode env var is
    re-read at trace time."""
    return compile_model_bytes(model.serialize(), name)


def test_gemm_matches_gather_complete_trees(monkeypatch):
    """The matmul-only (GEMM) forest evaluation must agree with the gather
    traversal on complete heap-layout trees (the xgboost/sklearn export
    shape) to float tolerance, and with the host walk."""
    model = builder.gbt_regressor_model(n_features=8, n_trees=7, depth=5, seed=11)
    x = np.random.default_rng(4).standard_normal((257, 8)).astype(np.float32)

    monkeypatch.setenv("INFERA_TREE_MODE", "gather")
    got_gather = np.asarray(_compile_fresh(model, "gbt_ga").run(x)[0])
    monkeypatch.setenv("INFERA_TREE_MODE", "gemm")
    got_gemm = np.asarray(_compile_fresh(model, "gbt_ge").run(x)[0])

    np.testing.assert_allclose(got_gemm, got_gather, rtol=1e-6, atol=1e-6)
    want = _host_gbt_predict(model, x)
    np.testing.assert_allclose(got_gemm.reshape(-1), want, rtol=1e-5, atol=1e-5)


def test_gemm_large_batch_tiling(monkeypatch):
    """N far above the GEMM row tile exercises the lax.map tiling + the
    non-divisible padding path."""
    model = builder.gbt_regressor_model(n_features=4, n_trees=3, depth=3, seed=5)
    x = np.random.default_rng(6).standard_normal((10000, 4)).astype(np.float32)
    monkeypatch.setenv("INFERA_TREE_MODE", "gemm")
    from infera_tpu.onnx import ml_ops
    monkeypatch.setattr(ml_ops._PackedTrees, "_GEMM_TILE", 1024)
    got = np.asarray(_compile_fresh(model, "gbt_big").run(x)[0]).reshape(-1)
    want = _host_gbt_predict(model, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gemm_irregular_trees(monkeypatch):
    """Non-complete trees, non-heap node ids, mixed branch modes, and a
    single-leaf tree: GEMM and gather paths must agree exactly."""
    from infera_tpu.onnx.proto import (
        Attribute, DataType, Graph, Model, Node, ValueInfo,
    )

    # tree 0: root is a leaf (weight 0.7)
    # tree 1: skewed left chain with mixed modes and shuffled node ids:
    #   node 0: f0 BRANCH_GT 0.5  -> true: node 3, false: node 1 (leaf, w=1)
    #   node 3: f1 BRANCH_LT -0.2 -> true: node 2 (leaf, w=2), false: node 4 (leaf, w=3)
    attrs = {
        "n_targets": Attribute.make("n_targets", 1),
        "nodes_treeids": Attribute.make("nodes_treeids", [0, 1, 1, 1, 1, 1]),
        "nodes_nodeids": Attribute.make("nodes_nodeids", [0, 0, 1, 3, 2, 4]),
        "nodes_featureids": Attribute.make("nodes_featureids", [0, 0, 0, 1, 0, 0]),
        "nodes_modes": Attribute.make(
            "nodes_modes",
            ["LEAF", "BRANCH_GT", "LEAF", "BRANCH_LT", "LEAF", "LEAF"]),
        "nodes_values": Attribute.make("nodes_values", [0.0, 0.5, 0.0, -0.2, 0.0, 0.0]),
        "nodes_truenodeids": Attribute.make("nodes_truenodeids", [0, 3, 0, 2, 0, 0]),
        "nodes_falsenodeids": Attribute.make("nodes_falsenodeids", [0, 1, 0, 4, 0, 0]),
        "target_treeids": Attribute.make("target_treeids", [0, 1, 1, 1]),
        "target_nodeids": Attribute.make("target_nodeids", [0, 1, 2, 4]),
        "target_ids": Attribute.make("target_ids", [0, 0, 0, 0]),
        "target_weights": Attribute.make("target_weights", [0.7, 1.0, 2.0, 3.0]),
        "post_transform": Attribute.make("post_transform", "NONE"),
    }
    g = Graph(
        name="irregular",
        nodes=[Node(op_type="TreeEnsembleRegressor", domain="ai.onnx.ml",
                    inputs=["X"], outputs=["Y"], attributes=attrs)],
        inputs=[ValueInfo(name="X", elem_type=DataType.FLOAT, shape=[-1, 2])],
        outputs=[ValueInfo(name="Y", elem_type=DataType.FLOAT, shape=[-1, 1])],
    )
    model = Model(graph=g, opset_imports=[("", 13), ("ai.onnx.ml", 3)])
    x = np.array([[0.6, -0.5], [0.6, 0.0], [0.4, 9.0], [0.5, -9.0]], np.float32)
    # manual expectation: tree0 always 0.7; tree1:
    #   row0: x0>0.5 true -> node3; x1<-0.2 true -> leaf2 (2.0) => 2.7
    #   row1: x0>0.5 true -> node3; x1<-0.2 false -> leaf4 (3.0) => 3.7
    #   row2: x0>0.5 false -> leaf1 (1.0) => 1.7
    #   row3: x0>0.5 false (0.5 not > 0.5) -> leaf1 => 1.7
    want = np.array([2.7, 3.7, 1.7, 1.7], np.float32)

    monkeypatch.setenv("INFERA_TREE_MODE", "gemm")
    got_gemm = np.asarray(_compile_fresh(model, "irr_ge").run(x)[0]).reshape(-1)
    monkeypatch.setenv("INFERA_TREE_MODE", "gather")
    got_gather = np.asarray(_compile_fresh(model, "irr_ga").run(x)[0]).reshape(-1)
    np.testing.assert_allclose(got_gemm, want, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(got_gemm, got_gather)


def test_gemm_oversize_falls_back(monkeypatch):
    """Forests whose path tables exceed the limit use the gather path in
    auto mode and raise under forced gemm."""
    from infera_tpu.onnx import ml_ops

    monkeypatch.setattr(ml_ops._PackedTrees, "_GEMM_C_LIMIT", 16)
    model = builder.gbt_regressor_model(n_features=4, n_trees=2, depth=3, seed=9)
    x = np.random.default_rng(1).standard_normal((8, 4)).astype(np.float32)
    monkeypatch.setenv("INFERA_TREE_MODE", "auto")
    got = np.asarray(_compile_fresh(model, "fb_auto").run(x)[0]).reshape(-1)
    np.testing.assert_allclose(got, _host_gbt_predict(model, x), rtol=1e-5, atol=1e-5)

    monkeypatch.setenv("INFERA_TREE_MODE", "gemm")
    from infera_tpu.errors import OnnxError
    with pytest.raises(OnnxError, match="GEMM path-table limit"):
        _compile_fresh(model, "fb_force").run(x)
