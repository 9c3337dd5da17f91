"""ai.onnx.ml operator lowerings (TreeEnsemble*, Linear*, Scaler, ...).

The reference supports these through tract (SURVEY.md §7.3 flags
TreeEnsemble as required for the GBT benchmark config). Two TPU lowerings:

1. **GEMM evaluation** (default for ensembles that fit): the whole forest is
   expressed as three batched matmuls per row tile (Hummingbird-style):
   ``X @ A`` gathers every tested feature value via a one-hot selection
   matrix (exact: one 1.0 coefficient per column), a comparison against the
   threshold vector yields the 0/1 decision vector ``S``, ``S @ C`` scores
   every leaf against its root-to-leaf path (+1 true-ancestor / −1
   false-ancestor), and the unique leaf with score == #true-ancestors is
   dotted with the leaf-weight table. Every FLOP lands on the MXU; there
   are zero gathers. Integer-valued f32 arithmetic keeps it bit-exact with
   the traversal path.

2. **Gather-based level-synchronous traversal** (fallback for forests too
   large/deep for the GEMM tables): node tables packed into dense
   [n_trees, max_nodes] matrices; execution iterates max_depth times,
   gathering (feature, threshold, children) per (row, tree) and advancing —
   no data-dependent control flow, fully vectorized.

Selection: ``INFERA_TREE_MODE`` = ``auto`` (default) | ``gemm`` | ``gather``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import OnnxError
from .ops import register

# branch-mode codes for the packed node table
_MODES = {
    "BRANCH_LEQ": 0,
    "BRANCH_LT": 1,
    "BRANCH_GTE": 2,
    "BRANCH_GT": 3,
    "BRANCH_EQ": 4,
    "BRANCH_NEQ": 5,
    "LEAF": 6,
}


class _PackedTrees:
    """Dense node tables for one tree ensemble."""

    def __init__(self, node, n_out: int, weights_key: str):
        tree_ids = np.asarray(node.attr("nodes_treeids"), np.int64)
        node_ids = np.asarray(node.attr("nodes_nodeids"), np.int64)
        feats = np.asarray(node.attr("nodes_featureids"), np.int64)
        modes = [m if isinstance(m, str) else m.decode() for m in node.attr("nodes_modes")]
        values = np.asarray(node.attr("nodes_values"), np.float32)
        true_ids = np.asarray(node.attr("nodes_truenodeids"), np.int64)
        false_ids = np.asarray(node.attr("nodes_falsenodeids"), np.int64)

        trees = np.unique(tree_ids)
        self.n_trees = len(trees)
        tree_index = {t: i for i, t in enumerate(trees)}
        max_nodes = int(node_ids.max()) + 1 if len(node_ids) else 1

        shape = (self.n_trees, max_nodes)
        self.feature = np.zeros(shape, np.int32)
        self.threshold = np.zeros(shape, np.float32)
        self.true_child = np.zeros(shape, np.int32)
        self.false_child = np.zeros(shape, np.int32)
        self.mode = np.full(shape, _MODES["LEAF"], np.int32)

        for k in range(len(tree_ids)):
            t = tree_index[tree_ids[k]]
            nd = node_ids[k]
            self.feature[t, nd] = feats[k]
            self.threshold[t, nd] = values[k]
            self.true_child[t, nd] = true_ids[k]
            self.false_child[t, nd] = false_ids[k]
            m = modes[k]
            if m not in _MODES:
                raise OnnxError(f"unsupported tree branch mode {m}")
            self.mode[t, nd] = _MODES[m]

        # leaf payout table [n_trees, max_nodes, n_out]
        w_tree = np.asarray(node.attr(f"{weights_key}_treeids"), np.int64)
        w_node = np.asarray(node.attr(f"{weights_key}_nodeids"), np.int64)
        w_id = np.asarray(node.attr(f"{weights_key}_ids"), np.int64)
        w_val = np.asarray(node.attr(f"{weights_key}_weights"), np.float32)
        self.weights = np.zeros((self.n_trees, max_nodes, n_out), np.float32)
        for k in range(len(w_tree)):
            t = tree_index[w_tree[k]]
            self.weights[t, w_node[k], w_id[k]] += w_val[k]

        # max depth bound: a binary tree with M nodes has depth <= M, but
        # realistic exports are balanced; walk to compute the true depth.
        self.max_depth = self._compute_depth(max_nodes)
        self.max_nodes = max_nodes

        # Heap-layout detection: when every internal node's children are
        # 2i+1 / 2i+2 (complete trees — the layout xgboost/sklearn exports
        # and our builder emit), child ids come from arithmetic instead of
        # two table gathers per level (~40% of traversal gathers saved).
        internal = self.mode != _MODES["LEAF"]
        idx = np.arange(max_nodes)[None, :]
        self.heap_layout = bool(
            np.all(np.where(internal, self.true_child == 2 * idx + 1, True))
            and np.all(np.where(internal, self.false_child == 2 * idx + 2, True))
        )

    def _compute_depth(self, max_nodes: int) -> int:
        depth = np.zeros((self.n_trees, max_nodes), np.int32)
        maxd = 0
        for t in range(self.n_trees):
            # BFS from root 0
            frontier = [0]
            d = 0
            seen = set()
            while frontier and d <= max_nodes:
                nxt = []
                for nd in frontier:
                    if nd in seen:
                        continue
                    seen.add(nd)
                    if self.mode[t, nd] != _MODES["LEAF"]:
                        nxt.append(int(self.true_child[t, nd]))
                        nxt.append(int(self.false_child[t, nd]))
                frontier = nxt
                if frontier:
                    d += 1
            maxd = max(maxd, d)
        del depth
        return maxd

    def traverse(self, x) -> jnp.ndarray:
        """Level-synchronous traversal. x: [N, d] → leaf node ids [N, T]."""
        n = x.shape[0]
        t_feature = jnp.asarray(self.feature)
        t_threshold = jnp.asarray(self.threshold)
        t_true = jnp.asarray(self.true_child)
        t_false = jnp.asarray(self.false_child)
        t_mode = jnp.asarray(self.mode)

        cur = jnp.zeros((n, self.n_trees), jnp.int32)
        tree_off = jnp.arange(self.n_trees, dtype=jnp.int32) * self.max_nodes

        def flat_gather(table, cur):
            return jnp.take(table.reshape(-1), tree_off[None, :] + cur)

        only_leq = bool((self.mode[self.mode != _MODES["LEAF"]] == 0).all())
        for _ in range(self.max_depth):
            f = flat_gather(t_feature, cur)          # [N, T]
            th = flat_gather(t_threshold, cur)
            md = flat_gather(t_mode, cur)
            xv = jnp.take_along_axis(x, f.astype(jnp.int32), axis=1)
            if only_leq:
                go_true = xv <= th  # single-comparison fast path
            else:
                go_true = jnp.select(
                    [md == 0, md == 1, md == 2, md == 3, md == 4, md == 5],
                    [xv <= th, xv < th, xv >= th, xv > th, xv == th, xv != th],
                    default=jnp.zeros_like(xv, dtype=bool),
                )
            if self.heap_layout:
                nxt = 2 * cur + jnp.where(go_true, 1, 2)
            else:
                nxt = jnp.where(go_true, flat_gather(t_true, cur),
                                flat_gather(t_false, cur))
            cur = jnp.where(md == _MODES["LEAF"], cur, nxt)
        return cur

    def payout(self, cur) -> jnp.ndarray:
        """Sum leaf weights over trees: [N, T] leaf ids → [N, n_out]."""
        n_out = self.weights.shape[2]
        w = jnp.asarray(self.weights.reshape(-1, n_out))
        tree_off = jnp.arange(self.n_trees, dtype=jnp.int32) * self.max_nodes
        leaf_w = jnp.take(w, tree_off[None, :] + cur, axis=0)  # [N, T, n_out]
        return jnp.sum(leaf_w, axis=1)

    # ---- GEMM (matmul-only) evaluation --------------------------------

    # device-side f32 bytes we allow the path-score matrix C [T, I, L] to
    # occupy before falling back to the gather traversal (64 MiB)
    _GEMM_C_LIMIT = 64 << 20

    def _build_gemm_tables(self):
        """DFS every tree once; emit per-tree internal/leaf numbering, the
        ±1 ancestry matrix C, true-ancestor counts D, and leaf weights W.
        Returns None when the forest is too large for dense path tables."""
        leaf_code = _MODES["LEAF"]
        per_tree = []
        max_i = max_l = 0
        for t in range(self.n_trees):
            internal, leaves = [], []
            stack = [(0, ())]
            steps = 0
            while stack:
                nd, anc = stack.pop()
                steps += 1
                if steps > 4 * self.max_nodes:  # malformed/cyclic table
                    return None
                if self.mode[t, nd] == leaf_code:
                    leaves.append((nd, anc))
                    continue
                i = len(internal)
                internal.append(nd)
                stack.append((int(self.false_child[t, nd]), anc + ((i, -1),)))
                stack.append((int(self.true_child[t, nd]), anc + ((i, 1),)))
            per_tree.append((internal, leaves))
            max_i = max(max_i, len(internal))
            max_l = max(max_l, len(leaves))
        max_i = max(max_i, 1)
        max_l = max(max_l, 1)
        if self.n_trees * max_i * max_l * 4 > self._GEMM_C_LIMIT:
            return None

        n_out = self.weights.shape[2]
        feat = np.zeros((self.n_trees, max_i), np.int32)
        thresh = np.zeros((self.n_trees, max_i), np.float32)
        mode = np.full((self.n_trees, max_i), _MODES["LEAF"], np.int32)
        C = np.zeros((self.n_trees, max_i, max_l), np.int8)
        D = np.full((self.n_trees, max_l), -1, np.float32)
        W = np.zeros((self.n_trees, max_l, n_out), np.float32)
        for t, (internal, leaves) in enumerate(per_tree):
            for i, nd in enumerate(internal):
                feat[t, i] = self.feature[t, nd]
                thresh[t, i] = self.threshold[t, nd]
                mode[t, i] = self.mode[t, nd]
            for li, (nd, anc) in enumerate(leaves):
                D[t, li] = sum(1 for _, d in anc if d == 1)
                W[t, li] = self.weights[t, nd]
                for i, d in anc:
                    C[t, i, li] = d
        only_leq = bool((mode[mode != leaf_code] == _MODES["BRANCH_LEQ"]).all())
        return {"feat": feat, "thresh": thresh, "mode": mode, "C": C,
                "D": D, "W": W, "only_leq": only_leq}

    @property
    def gemm(self):
        if not hasattr(self, "_gemm"):
            self._gemm = self._build_gemm_tables()
        return self._gemm

    def _gemm_eval_tile(self, x) -> jnp.ndarray:
        """One row tile through the three-matmul forest: [n, F] → [n, n_out]."""
        g = self.gemm
        hi = jax.lax.Precision.HIGHEST
        n_feat = x.shape[1]
        # A[t, i, f]: one-hot feature selector — X @ A reproduces every
        # tested feature value exactly (single 1.0 coefficient per column)
        sel = jax.nn.one_hot(jnp.asarray(g["feat"]), n_feat, dtype=jnp.float32)
        xa = jnp.einsum("nf,tif->nti", x, sel, precision=hi,
                        preferred_element_type=jnp.float32)
        th = jnp.asarray(g["thresh"])
        if g["only_leq"]:
            s = xa <= th
        else:
            md = jnp.asarray(g["mode"])
            s = jnp.select(
                [md == 0, md == 1, md == 2, md == 3, md == 4, md == 5],
                [xa <= th, xa < th, xa >= th, xa > th, xa == th, xa != th],
                default=jnp.zeros_like(xa, dtype=bool),
            )
        s = s.astype(jnp.float32)
        # leaf l is reached iff its path score equals its true-ancestor
        # count (integer-valued f32 arithmetic → exact equality).
        # DEFAULT precision is EXACT here: s ∈ {0,1} and C ∈ {-1,0,1} are
        # bf16-exact, the MXU accumulates the ≤depth-magnitude integer
        # score without rounding, and the bf16-rounded output is exact for
        # integers < 2^8 — round-4 TPU profiling measured this einsum (79%
        # of the forest FLOPs) 6x cheaper than HIGHEST with bit-identical
        # `hit` masks (verified vs the gather-exact pipeline on-chip).
        score = jnp.einsum("nti,til->ntl", s,
                           jnp.asarray(g["C"], jnp.float32),
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)
        hit = (score == jnp.asarray(g["D"])).astype(jnp.float32)
        return jnp.einsum("ntl,tlo->no", hit, jnp.asarray(g["W"]),
                          precision=hi, preferred_element_type=jnp.float32)

    _GEMM_TILE = 4096

    def gemm_eval(self, x) -> jnp.ndarray:
        """Forest output [N, n_out] via matmuls only, tiled over rows so the
        [n, T, I] / [n, T, L] intermediates stay HBM-small at any N."""
        n = x.shape[0]
        tile = self._GEMM_TILE
        if n <= 2 * tile:
            return self._gemm_eval_tile(x)
        pad = (-n) % tile
        xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
        tiles = xp.reshape(-1, tile, x.shape[1])
        y = jax.lax.map(self._gemm_eval_tile, tiles)
        return y.reshape(-1, self.weights.shape[2])[:n]

    # ---- Pallas in-kernel forest tables -------------------------------

    # each chunk of trees fits one 128-lane MXU strip: sum(internal) <= 128
    # and sum(leaves) <= 128, so the whole chunk evaluates as two
    # [128,128]-class matmuls per row tile inside the SQL kernel
    _PALLAS_STRIP = 128
    _PALLAS_TABLE_LIMIT = 2 << 20  # f32 bytes across all chunk constants

    def _build_pallas_forest(self, n_features: int):
        """Strip-packed GEMM-forest tables for the fused SQL Pallas kernel
        (sql/device_plan._PallasLowerer). Trees are DFS-numbered exactly as
        _build_gemm_tables, then greedily packed into chunks whose internal
        and leaf counts both fit a 128-row strip; per chunk the kernel runs

            xa    = sel_c  @ h          (one-hot select, HIGHEST — exact)
            s     = xa {<=,<} th_c      ({0,1} decision vector)
            score = C_c    @ s          (DEFAULT bf16 — integer-exact, the
                                         config-4 roofline trick)
            hit   = score == D_c        (unique leaf per tree)
            out  += W_c^T  @ hit

        Identical-topology trees (complete heap forests — the benchmark
        class) share ONE deduplicated C matrix. Returns None whenever the
        forest doesn't fit the strip packing (caller rides the XLA GEMM
        path instead — semantics never regress)."""
        leaf_code = _MODES["LEAF"]
        used = {int(m) for m in np.unique(self.mode)} - {leaf_code}
        if used not in ({_MODES["BRANCH_LEQ"]}, {_MODES["BRANCH_LT"]}):
            return None
        strict = used == {_MODES["BRANCH_LT"]}
        strip = self._PALLAS_STRIP
        trees = []
        for t in range(self.n_trees):
            internal, leaves = [], []
            stack = [(0, ())]
            steps = 0
            while stack:
                nd, anc = stack.pop()
                steps += 1
                if steps > 4 * self.max_nodes:
                    return None
                if self.mode[t, nd] == leaf_code:
                    leaves.append((nd, anc))
                    continue
                i = len(internal)
                internal.append(nd)
                stack.append((int(self.false_child[t, nd]),
                              anc + ((i, -1),)))
                stack.append((int(self.true_child[t, nd]),
                              anc + ((i, 1),)))
            if len(internal) > strip or len(leaves) > strip:
                return None
            trees.append((internal, leaves))
        n_out = self.weights.shape[2]
        if n_out > strip:
            return None
        # greedy strip packing
        chunks, cur, ci, cl = [], [], 0, 0
        for t, (internal, leaves) in enumerate(trees):
            if ci + len(internal) > strip or cl + len(leaves) > strip:
                chunks.append(cur)
                cur, ci, cl = [], 0, 0
            cur.append(t)
            ci += len(internal)
            cl += len(leaves)
        if cur:
            chunks.append(cur)
        nch = len(chunks)
        sel = np.zeros((nch * strip, n_features), np.float32)
        # padded internal rows: sel row is zero -> xa = 0; th = -BIG makes
        # the decision 0 under both <= and <
        th = np.full((nch * strip, 1), -np.float32(1 << 30), np.float32)
        # padded leaf rows: C row zero -> score 0; D = -1 never hits
        d_all = np.full((nch * strip, 1), -1.0, np.float32)
        wT = np.zeros((nch * n_out, strip), np.float32)
        c_mats: list = []
        c_idx: list = []
        uniq: dict = {}
        for c, tlist in enumerate(chunks):
            C = np.zeros((strip, strip), np.float32)  # [leaf, internal]
            io = lo = 0
            for t in tlist:
                internal, leaves = trees[t]
                for i, nd in enumerate(internal):
                    f = int(self.feature[t, nd])
                    if f >= n_features:
                        return None
                    sel[c * strip + io + i, f] = 1.0
                    th[c * strip + io + i, 0] = self.threshold[t, nd]
                for li, (nd, anc) in enumerate(leaves):
                    d_all[c * strip + lo + li, 0] = float(
                        sum(1 for _, d in anc if d == 1))
                    wT[c * n_out:(c + 1) * n_out, lo + li] = \
                        self.weights[t, nd]
                    for i, d in anc:
                        C[lo + li, io + i] = d
                io += len(internal)
                lo += len(leaves)
            key = C.tobytes()
            ui = uniq.get(key)
            if ui is None:
                ui = len(c_mats)
                uniq[key] = ui
                c_mats.append(C)
            c_idx.append(ui)
        c_all = np.concatenate(c_mats, axis=0)
        total = sel.nbytes + th.nbytes + d_all.nbytes + wT.nbytes \
            + c_all.nbytes
        if total > self._PALLAS_TABLE_LIMIT:
            return None
        return {"sel": sel, "th": th, "C": c_all, "c_idx": tuple(c_idx),
                "D": d_all, "wT": wT, "n_chunks": nch, "n_out": n_out,
                "strict": strict, "strip": strip}

    def pallas_forest(self, n_features: int):
        key = getattr(self, "_pallas_forest_key", None)
        if key != n_features:
            self._pallas_forest_key = n_features
            self._pallas_forest = self._build_pallas_forest(n_features)
        return self._pallas_forest

    def evaluate(self, x) -> jnp.ndarray:
        """Dispatch: GEMM when the path tables fit (INFERA_TREE_MODE=auto),
        else gather traversal. [N, F] → [N, n_out] summed over trees."""
        pref = os.environ.get("INFERA_TREE_MODE", "auto")
        if pref != "gather" and self.gemm is not None:
            return self.gemm_eval(x)
        if pref == "gemm" and self.gemm is None:
            raise OnnxError("INFERA_TREE_MODE=gemm but the ensemble exceeds "
                            "the GEMM path-table limit")
        return self.payout(self.traverse(x))


def _post_transform(y, kind: str):
    import jax

    if kind in (None, "NONE", b"NONE"):
        return y
    if isinstance(kind, bytes):
        kind = kind.decode()
    if kind == "SOFTMAX":
        return jax.nn.softmax(y, axis=-1)
    if kind == "LOGISTIC":
        return jax.nn.sigmoid(y)
    if kind == "SOFTMAX_ZERO":
        # ONNX Runtime semantics: zero scores stay zero; softmax over the rest
        from jax import lax as _lax

        nz = y != 0
        shifted = jnp.where(nz, y, -jnp.inf)
        m = jnp.max(shifted, axis=-1, keepdims=True)
        e = jnp.where(nz, jnp.exp(shifted - jnp.where(jnp.isfinite(m), m, 0.0)), 0.0)
        s = jnp.sum(e, axis=-1, keepdims=True)
        return jnp.where(s > 0, e / jnp.where(s > 0, s, 1.0), 0.0)
    if kind == "PROBIT":
        # probit(p) = sqrt(2) * erfinv(2p - 1)  (inverse standard-normal CDF)
        from jax import lax as _lax

        return np.sqrt(2.0).astype(np.float32) * _lax.erf_inv(2.0 * y - 1.0)
    raise OnnxError(f"unsupported post_transform {kind}")


@register("TreeEnsembleRegressor", domain="ai.onnx.ml")
def _tree_regressor(node, inputs, ctx):
    x = jnp.asarray(inputs[0], jnp.float32)
    n_targets = int(node.attr("n_targets", 1))
    packed = _cached_pack(node, n_targets, "target")
    y = packed.evaluate(x)
    base = node.attr("base_values")
    if base:
        y = y + jnp.asarray(base, jnp.float32)
    agg = node.attr("aggregate_function", "SUM")
    if isinstance(agg, bytes):
        agg = agg.decode()
    if agg == "AVERAGE":
        y = y / packed.n_trees
    elif agg not in ("SUM", None):
        raise OnnxError(f"unsupported aggregate_function {agg}")
    return [_post_transform(y, node.attr("post_transform", "NONE"))]


@register("TreeEnsembleClassifier", domain="ai.onnx.ml")
def _tree_classifier(node, inputs, ctx):
    x = jnp.asarray(inputs[0], jnp.float32)
    labels_int = node.attr("classlabels_int64s")
    labels_str = node.attr("classlabels_strings")
    n_classes = len(labels_int or labels_str or [])
    if n_classes == 0:
        raise OnnxError("TreeEnsembleClassifier without class labels")
    packed = _cached_pack(node, n_classes, "class")
    scores = packed.evaluate(x)
    base = node.attr("base_values")
    if base:
        scores = scores + jnp.asarray(base, jnp.float32)
    # binary ensembles may emit a single score column
    if n_classes == 2 and scores.shape[1] == 1:
        scores = jnp.concatenate([-scores, scores], axis=1)
    scores = _post_transform(scores, node.attr("post_transform", "NONE"))
    idx = jnp.argmax(scores, axis=-1)
    if labels_int is not None:
        label = jnp.take(jnp.asarray(np.asarray(labels_int, np.int64)), idx)
    else:
        label = idx  # string labels surface as indices
    return [label, scores]


def _cached_pack(node, n_out: int, key: str) -> _PackedTrees:
    # cache on the Node object itself: id()-keyed global dicts can collide
    # when ids are reused after garbage collection
    entry = getattr(node, "_infera_packed_trees", None)
    if entry is None or entry[0] != (n_out, key):
        entry = ((n_out, key), _PackedTrees(node, n_out, key))
        node._infera_packed_trees = entry
    return entry[1]


@register("LinearRegressor", domain="ai.onnx.ml")
def _linear_regressor(node, inputs, ctx):
    import jax

    x = jnp.asarray(inputs[0], jnp.float32)
    targets = int(node.attr("targets", 1))
    coeff = jnp.asarray(node.attr("coefficients"), jnp.float32).reshape(targets, -1)
    y = jnp.dot(x, coeff.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    inter = node.attr("intercepts")
    if inter:
        y = y + jnp.asarray(inter, jnp.float32)
    return [_post_transform(y, node.attr("post_transform", "NONE"))]


@register("LinearClassifier", domain="ai.onnx.ml")
def _linear_classifier(node, inputs, ctx):
    import jax

    x = jnp.asarray(inputs[0], jnp.float32)
    labels_int = node.attr("classlabels_ints")
    labels_str = node.attr("classlabels_strings")
    n_classes = len(labels_int or labels_str or [])
    coeff = jnp.asarray(node.attr("coefficients"), jnp.float32).reshape(n_classes, -1)
    y = jnp.dot(x, coeff.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    inter = node.attr("intercepts")
    if inter:
        y = y + jnp.asarray(inter, jnp.float32)
    scores = _post_transform(y, node.attr("post_transform", "NONE"))
    idx = jnp.argmax(scores, axis=-1)
    if labels_int is not None:
        label = jnp.take(jnp.asarray(np.asarray(labels_int, np.int64)), idx)
    else:
        label = idx
    return [label, scores]


@register("Scaler", domain="ai.onnx.ml")
def _scaler(node, inputs, ctx):
    x = jnp.asarray(inputs[0], jnp.float32)
    offset = node.attr("offset")
    scale = node.attr("scale")
    if offset:
        x = x - jnp.asarray(offset, jnp.float32)
    if scale:
        x = x * jnp.asarray(scale, jnp.float32)
    return [x]


@register("Normalizer", domain="ai.onnx.ml")
def _normalizer(node, inputs, ctx):
    x = jnp.asarray(inputs[0], jnp.float32)
    norm = node.attr("norm", "MAX")
    if isinstance(norm, bytes):
        norm = norm.decode()
    if norm == "MAX":
        d = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    elif norm == "L1":
        d = jnp.sum(jnp.abs(x), axis=-1, keepdims=True)
    elif norm == "L2":
        d = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    else:
        raise OnnxError(f"unsupported norm {norm}")
    return [x / jnp.where(d == 0, 1.0, d)]


@register("ZipMap", domain="ai.onnx.ml")
def _zipmap(node, inputs, ctx):
    # map output is represented by its score tensor
    return [inputs[0]]


@register("ArrayFeatureExtractor", domain="ai.onnx.ml")
def _array_feature_extractor(node, inputs, ctx):
    x = inputs[0]
    idx = jnp.asarray(inputs[1]).astype(jnp.int32).reshape(-1)
    return [jnp.take(x, idx, axis=-1)]
