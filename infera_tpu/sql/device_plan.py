"""Fused device execution of SQL queries (SURVEY.md §7.2 M2).

For the query shapes the benchmarks care about — aggregates over a scan of
one table with a numeric WHERE filter, optional GROUP BY over up to 4
integer-valued keys (mixed-radix combined key), and ``infera_predict`` /
``infera_predict_multi_list(...)[k]`` calls in expressions — the whole plan
lowers to ONE jitted XLA program: columns move to HBM once, the model graph
inlines into the same program (so XLA fuses cast → matmul → filter →
segment-reduce), and only the per-group results return to the host.

Anything outside the supported shape returns None and the generic executor
path runs instead, so semantics never regress. Constraints for eligibility:

- single base table, all referenced columns numeric with no NULLs
- WHERE/expressions: numeric arithmetic/comparison/boolean, abs/sqrt/...,
  infera_predict with a constant model name
- select items: count/sum/avg/min/max aggregates over such expressions,
  plus (with GROUP BY) the group key expression itself
- no HAVING/DISTINCT/subqueries (host path handles those)

The compiled program is cached per (SQL shape, column set, row bucket) so
repeated queries skip tracing.
"""

from __future__ import annotations

import numpy as np

from ..columnar import Column, Table
from ..columnar import types as T
from ..registry import MODELS
from . import ast as A

# row count below which fusion isn't worth the compile
MIN_DEVICE_ROWS = 1 << 14

_AGG_NAMES = {"count", "sum", "avg", "mean", "min", "max",
              "stddev", "stddev_samp", "stddev_pop",
              "var_samp", "var_pop", "variance", "median", "mode",
              "quantile_cont", "quantile_disc", "quantile",
              "percentile_cont", "percentile_disc",
              "count_if", "countif", "bool_and", "bool_or", "product",
              "arg_min", "arg_max", "min_by", "max_by",
              "approx_count_distinct"}

# quantile family: name -> continuous interpolation?
_QUANTILE_FAMILY = {"quantile_cont": True, "percentile_cont": True,
                    "quantile_disc": False, "quantile": False,
                    "percentile_disc": False}
_SCALAR_FNS = {"abs", "sqrt", "floor", "ceil", "round", "exp", "log"}

# variance family: (ddof, apply_sqrt) — decomposes into (sum, sum-of-squares)
# partials that commute with the mesh exchange (VERDICT round-2 item 4)
_VAR_FAMILY = {
    "stddev": (1, True), "stddev_samp": (1, True), "stddev_pop": (0, True),
    "var_samp": (1, False), "variance": (1, False), "var_pop": (0, False),
}

# group-count cap for the segment reduction (static shape requirement)
MAX_GROUPS = 1 << 16


class _Unsupported(Exception):
    pass


def _contains_int_window(e) -> bool:
    """True when the expression contains an integer-valued window
    (ranking / count) — their consuming SUM/MIN/MAX render BIGINT on the
    host, which the f32 fused carrier would demote to DOUBLE."""
    return A.contains_node(
        e, lambda x: isinstance(x, A.WindowFunc) and x.name.lower() in (
            "row_number", "rank", "dense_rank", "ntile", "count"))


# --- shared device-resident table block (VERDICT r4 item 3b) --------------
# ONE stacked feature-major [C, n_pad] f32 block per table is THE canonical
# device representation all single-device tiers key off: the pallas kernel
# reads it directly (or row-gathers a per-query subset on device), and
# float columns' per-column `_device_array` caches become zero-upload
# device slices of it — killing the 390-425 ms duplicate-upload phase the
# round-4 session measured when the XLA and pallas tiers each uploaded
# their own copy of the same table.

BLOCK_PAD = 4096  # LCM of the pallas tile sizes (2048/4096)

# {(source array ids, n_pad): (pinned arrays, device block)} — global so
# every Connection over the same catalog shares one upload
_TABLE_BLOCK_CACHE: dict = {}


def _block_eligible(col) -> bool:
    d = col.data
    if getattr(col, "validity", None) is not None:
        return False
    if d.dtype.kind == "f":
        return True
    if d.dtype.kind in "iu":
        if not d.size:
            return True
        rng = getattr(col, "_int_range", None)
        if rng is None:
            rng = (int(d.min()), int(d.max()))
            col._int_range = rng
        return rng[0] >= -(1 << 24) and rng[1] <= (1 << 24)
    return False


def get_table_block(conn, table):
    """(xc [C, n_pad] f32 device array, {column key: row}, n_pad) over the
    table's block-eligible numeric columns, cached per connection (source
    arrays value-pinned against id reuse). None when nothing is eligible.
    Aliased keys (\"t.f1\" and \"f1\" sharing one Column) map to one row."""
    n = table.num_rows
    by_id: dict = {}
    row_map: dict = {}
    for k, c in table.columns.items():
        if not _block_eligible(c):
            continue
        i = by_id.get(id(c.data))
        if i is None:
            i = len(by_id)
            by_id[id(c.data)] = i
        row_map[k] = i
    if not by_id:
        return None
    arrs = [None] * len(by_id)
    pin = [None] * len(by_id)
    for k, i in row_map.items():
        arrs[i] = table.columns[k].data
        pin[i] = table.columns[k].data
    n_pad = -(-max(n, 1) // BLOCK_PAD) * BLOCK_PAD
    bkey = (tuple(id(a) for a in arrs), n_pad)
    # process-global cache: connections sharing a catalog share the
    # device-resident block (a per-connection cache re-uploaded 111 ms of
    # identical data on the round-5 TPU session)
    cache = _TABLE_BLOCK_CACHE
    ent = cache.get(bkey)
    if ent is None:
        import jax.numpy as jnp

        host = np.zeros((len(arrs), n_pad), np.float32)
        for i, a in enumerate(arrs):
            host[i, :n] = np.asarray(a, np.float32)
        xc = jnp.asarray(host)
        if len(cache) >= 4:
            cache.pop(next(iter(cache)))
        ent = (tuple(pin), xc)  # the VALUE pins the source arrays
        cache[bkey] = ent
    return ent[1], row_map, n_pad


def _block_view(conn, xc_full, idxs: tuple):
    """[len(idxs), n_pad] device view of the table block in kernel row
    order: the block itself when idxs is the identity, else a cached
    device-side row gather (HBM-to-HBM, no host transfer)."""
    if idxs == tuple(range(int(xc_full.shape[0]))):
        return xc_full
    import jax
    import jax.numpy as jnp

    cache = getattr(conn, "_block_view_cache", None)
    if cache is None:
        cache = {}
        conn._block_view_cache = cache
    key = (id(xc_full), idxs)
    ent = cache.get(key)
    if ent is None:
        view = jax.jit(lambda b: b[jnp.asarray(idxs, jnp.int32), :])(
            xc_full)
        if len(cache) >= 16:
            cache.pop(next(iter(cache)))
        ent = (xc_full, view)  # the VALUE pins the block against id reuse
        cache[key] = ent
    return ent[1]


def device_column_array(col, key=None, block=None, n=None):
    """THE per-column device array, cached on the Column. Float columns
    resolve to device slices of the shared table block when one is passed
    (device-to-device, no host transfer); integer columns keep raw int32
    uploads — downstream bit-level consumers (HLL hashing, limb words)
    need exact integer dtypes."""
    dev = getattr(col, "_device_array", None)
    if dev is not None:
        return dev
    import jax.numpy as jnp

    if block is not None and col.data.dtype.kind == "f":
        xc, row_map, _pad = block
        i = row_map.get(key)
        if i is not None:
            dev = xc[i, :n]
            col._device_array = dev
            return dev
    dev = jnp.asarray(col.data)
    col._device_array = dev
    return dev


class _Lowerer:
    """AST → jnp closure over a dict of device columns."""

    def __init__(self, table: Table):
        self.table = table
        self.used_columns: dict = {}
        self.models: dict = {}
        self.has_window = False  # windows need the un-sharded global sort

    def _column(self, name: str, qualifier):
        key = f"{qualifier}.{name}" if qualifier else name
        col = self.table.columns.get(key)
        if col is None:
            for k in self.table.columns:
                parts = k.split(".")
                if qualifier is not None:
                    # EXACT qualified match only (case-insensitive): a
                    # bare-name fallback here captured OTHER tables'
                    # qualified refs — a correlated subquery's `o.k`
                    # silently bound to the inner `i.k`, turning the
                    # correlation predicate into a tautology and the
                    # whole subquery into its global aggregate (round-5
                    # fix, found extending decorrelation)
                    if len(parts) >= 2 \
                            and parts[0].lower() == qualifier.lower() \
                            and parts[-1].lower() == name.lower():
                        col = self.table.columns[k]
                        key = k
                        break
                elif parts[-1].lower() == name.lower():
                    col = self.table.columns[k]
                    key = k
                    break
        if col is None:
            raise _Unsupported(f"unknown column {name}")
        if not col.sql_type.is_numeric or col.validity is not None:
            raise _Unsupported(f"column {name} not device-eligible")
        self.used_columns[key] = col
        return key

    def lower(self, expr: A.Expr):
        """Return fn(cols: dict[str, jnp.ndarray]) -> jnp array [n]."""
        import jax
        import jax.numpy as jnp

        if isinstance(expr, A.Literal):
            if expr.value is None or isinstance(expr.value, str):
                raise _Unsupported("non-numeric literal")
            v = float(expr.value) if not isinstance(expr.value, bool) else bool(expr.value)
            return lambda cols: v
        if isinstance(expr, A.ColumnRef):
            key = self._column(expr.name, expr.table)
            return lambda cols: cols[key]
        if isinstance(expr, A.Cast):
            tname = expr.type_name.upper()
            if tname not in (
                "FLOAT", "REAL", "DOUBLE", "INTEGER", "INT", "BIGINT", "DECIMAL",
            ):
                raise _Unsupported(f"cast to {expr.type_name}")
            inner = self.lower(expr.operand)
            if tname in ("INTEGER", "INT", "BIGINT"):
                # host casts truncate toward zero; keep f32 carrier dtype
                return lambda cols: jnp.trunc(
                    jnp.asarray(inner(cols), jnp.float32))
            return lambda cols: jnp.asarray(inner(cols)).astype(jnp.float32)
        if isinstance(expr, A.Unary):
            inner = self.lower(expr.operand)
            if expr.op == "-":
                return lambda cols: -inner(cols)
            if expr.op == "NOT":
                return lambda cols: jnp.logical_not(inner(cols))
            raise _Unsupported(f"unary {expr.op}")
        if isinstance(expr, A.Binary):
            left = self.lower(expr.left)
            right = self.lower(expr.right)
            ops = {
                "+": jnp.add, "-": jnp.subtract, "*": jnp.multiply,
                "%": jnp.mod,
                "=": jnp.equal, "<>": jnp.not_equal, "<": jnp.less,
                "<=": jnp.less_equal, ">": jnp.greater, ">=": jnp.greater_equal,
                "AND": jnp.logical_and, "OR": jnp.logical_or,
            }
            if expr.op == "/":
                return lambda cols: jnp.asarray(left(cols), jnp.float32) / jnp.asarray(right(cols), jnp.float32)
            fn = ops.get(expr.op)
            if fn is None:
                raise _Unsupported(f"binary {expr.op}")
            return lambda cols: fn(left(cols), right(cols))
        if isinstance(expr, A.Between):
            inner = self.lower(expr.operand)
            lo = self.lower(expr.low)
            hi = self.lower(expr.high)
            if expr.negated:
                return lambda cols: jnp.logical_not(
                    (inner(cols) >= lo(cols)) & (inner(cols) <= hi(cols)))
            return lambda cols: (inner(cols) >= lo(cols)) & (inner(cols) <= hi(cols))
        if isinstance(expr, A.FuncCall):
            name = expr.name.lower()
            if name == "infera_predict":
                return self._lower_predict(expr)
            if name == "list_extract":
                # infera_predict_multi_list(...)[k] — a multi-output model's
                # k-th (1-based) output column, fused into the device plan
                inner, idx = expr.args[0], expr.args[1]
                if (isinstance(inner, A.FuncCall)
                        and inner.name.lower() == "infera_predict_multi_list"
                        and isinstance(idx, A.Literal)
                        and isinstance(idx.value, (int, float))
                        and not isinstance(idx.value, bool)):
                    return self._lower_predict(inner, out_col=int(idx.value) - 1)
                raise _Unsupported("list_extract outside predict_multi_list")
            if name in _SCALAR_FNS:
                inner = self.lower(expr.args[0])
                fn = {
                    "abs": jnp.abs, "sqrt": jnp.sqrt, "floor": jnp.floor,
                    "ceil": jnp.ceil, "round": jnp.round, "exp": jnp.exp,
                    "log": jnp.log,
                }[name]
                return lambda cols: fn(jnp.asarray(inner(cols), jnp.float32))
            raise _Unsupported(f"function {name}")
        if isinstance(expr, A.WindowFunc):
            return self._lower_window(expr)
        raise _Unsupported(type(expr).__name__)

    # window names the fused plan computes in-program (VERDICT r4 item 7)
    _WIN_OK = frozenset({"row_number", "rank", "dense_rank", "count",
                         "sum", "avg", "mean", "min", "max"})

    def _lower_window(self, wf: A.WindowFunc):
        """Device window closure: ONE lax.sort by (partition, order, rowid)
        then segmented scans — ranking arithmetic, double-single
        (two-f32-limb, ~2^-48 rel) running sums, and flagged associative
        min/max scans — gathered at the frame-end position and scattered
        back to row order. Covers the default RANGE frame (peers), ROWS
        UNBOUNDED..CURRENT, and whole-partition frames; everything else
        raises (host path keeps full frames)."""
        import functools as _ft

        import jax
        import jax.numpy as jnp

        name = wf.name.lower()
        if name not in self._WIN_OK:
            raise _Unsupported(f"window {name}")
        self.has_window = True
        frame = wf.frame
        if not wf.order_by:
            fkind = "whole"
        elif frame is None:
            fkind = "default"
        else:
            unit, start, end = frame
            if start == "unbounded_preceding" and end == "current":
                fkind = "default" if unit == "range" else "rows_cur"
            elif (start == "unbounded_preceding"
                    and end == "unbounded_following"):
                fkind = "whole"
            else:
                raise _Unsupported("window frame")
        if name in ("row_number", "rank", "dense_rank"):
            arg_fn = None
        elif not wf.args:
            if name != "count":
                raise _Unsupported(f"window {name} without argument")
            arg_fn = None
        else:
            # f32 carrier: float-typed arguments only (integer window
            # sums would silently drop BIGINT exactness — host path)
            self._require_float_refs(wf.args[0])
            arg_fn = self.lower(wf.args[0])
        for e in wf.partition_by:
            self._require_f32_exact_refs(e)
        for oi in wf.order_by:
            self._require_f32_exact_refs(oi.expr)
        part_fns = [self.lower(e) for e in wf.partition_by]
        ord_specs = [(self.lower(oi.expr), oi.ascending)
                     for oi in wf.order_by]
        wf_key = repr(wf)

        def run(cols):
            # one sort+scan per DISTINCT window expression per trace: the
            # flattened query references the window output in several
            # aggregate slots, each holding its own closure copy
            # (round-5 review fix — the cache rides the per-trace cols
            # dict, so retraces never see stale arrays)
            wcache = cols.setdefault("__window_cache__", {})
            if wf_key in wcache:
                return wcache[wf_key]
            out = self._run_window(cols, part_fns, ord_specs, arg_fn,
                                   name, fkind)
            wcache[wf_key] = out
            return out

        return run

    @staticmethod
    def _run_window(cols, part_fns, ord_specs, arg_fn, name, fkind):
        import functools as _ft

        import jax
        import jax.numpy as jnp

        if True:
            parts = [jnp.asarray(f(cols), jnp.float32) for f in part_fns]
            orders = []
            for f, asc in ord_specs:
                v = jnp.asarray(f(cols), jnp.float32)
                orders.append(v if asc else -v)
            av = (None if arg_fn is None
                  else jnp.asarray(arg_fn(cols), jnp.float32))
            n = None
            for v in parts + orders + ([] if av is None else [av]):
                if getattr(v, "ndim", 0) >= 1:
                    n = v.shape[-1] if v.ndim > 1 else v.shape[0]
                    break
            if n is None:
                raise _Unsupported("window over constants")

            def full(v):
                v = jnp.asarray(v, jnp.float32).reshape(-1)
                return (jnp.broadcast_to(v, (n,)) if v.shape[0] == 1
                        and n != 1 else v)

            parts = [full(v) for v in parts]
            orders = [full(v) for v in orders]
            rowid = jnp.arange(n, dtype=jnp.int32)
            ops_ = tuple(parts) + tuple(orders) + (rowid,)
            if av is not None:
                ops_ = ops_ + (full(av),)
            srt = jax.lax.sort(ops_, num_keys=len(parts) + len(orders) + 1)
            np_, no_ = len(parts), len(orders)
            p_s, o_s = srt[:np_], srt[np_:np_ + no_]
            r_s = srt[np_ + no_]
            v_s = srt[-1] if av is not None else None
            idx = jnp.arange(n, dtype=jnp.int32)
            one = jnp.ones(1, bool)
            if p_s:
                chg = _ft.reduce(jnp.logical_or,
                                 [p[1:] != p[:-1] for p in p_s])
                gchg = jnp.concatenate([one, chg])
            else:
                gchg = idx == 0
            if o_s:
                och = _ft.reduce(jnp.logical_or,
                                 [o[1:] != o[:-1] for o in o_s])
                kchg = gchg | jnp.concatenate([one, och])
            else:
                kchg = gchg  # no ORDER BY: whole partition is one peer set
            pstart = jax.lax.cummax(jnp.where(gchg, idx, 0))
            peer_lo = jax.lax.cummax(jnp.where(kchg, idx, 0))
            nxt = jnp.where(jnp.concatenate([kchg[1:], one]), idx, n - 1)
            peer_hi = jax.lax.cummin(nxt[::-1])[::-1]
            pnxt = jnp.where(jnp.concatenate([gchg[1:], one]), idx, n - 1)
            pend = jax.lax.cummin(pnxt[::-1])[::-1]  # last row of partition
            hi_pos = {"whole": pend, "default": peer_hi,
                      "rows_cur": idx}[fkind]
            if name == "row_number":
                out_s = (idx - pstart + 1).astype(jnp.float32)
            elif name == "rank":
                out_s = (peer_lo - pstart + 1).astype(jnp.float32)
            elif name == "dense_rank":
                kc = jnp.cumsum(kchg.astype(jnp.int32))
                out_s = (kc - kc[pstart] + 1).astype(jnp.float32)
            elif name == "count" and v_s is None:
                out_s = (hi_pos - pstart + 1).astype(jnp.float32)
            elif name in ("min", "max"):
                scan = _seg_scan_extreme(jax, jnp, v_s, gchg,
                                         name == "min")
                out_s = scan[hi_pos]
            else:
                s_hi, s_lo = _seg_scan_sum_ds(jax, jnp, v_s, gchg)
                run_sum = s_hi[hi_pos] + s_lo[hi_pos]
                if name == "count":
                    out_s = (hi_pos - pstart + 1).astype(jnp.float32)
                elif name == "sum":
                    out_s = run_sum
                else:  # avg / mean
                    cntf = (hi_pos - pstart + 1).astype(jnp.float32)
                    out_s = run_sum / cntf
            return jnp.zeros(n, jnp.float32).at[r_s].set(out_s)

    def _require_float_refs(self, e):
        refs: list = []
        _find_column_refs(e, refs)
        for r in refs:
            key = self._column(r.name, r.table)
            t = self.table.columns[key].sql_type
            if not (t.is_float or t.name == "DECIMAL"):
                raise _Unsupported("integer window argument (host path)")

    def _require_f32_exact_refs(self, e):
        refs: list = []
        _find_column_refs(e, refs)
        for r in refs:
            key = self._column(r.name, r.table)
            col = self.table.columns[key]
            d = col.data
            if d.dtype.kind in "iu" and d.size:
                rng = getattr(col, "_int_range", None)
                if rng is None:
                    rng = (int(d.min()), int(d.max()))
                    col._int_range = rng
                if rng[0] < -(1 << 24) or rng[1] > (1 << 24):
                    raise _Unsupported("window key beyond f32 exactness")

    def _lower_predict(self, expr: A.FuncCall, out_col: int | None = None):
        """Lower infera_predict (out_col None → requires a 1-col output) or
        an infera_predict_multi_list element access (out_col = 0-based)."""
        import jax.numpy as jnp

        if not expr.args or not isinstance(expr.args[0], A.Literal) or not isinstance(
            expr.args[0].value, str
        ):
            raise _Unsupported("infera_predict needs a constant model name")
        model_name = expr.args[0].value
        model = MODELS.get(model_name)
        if model is None:
            raise _Unsupported(f"model {model_name} not loaded at plan time")
        if out_col is not None and out_col < 0:
            raise _Unsupported("list index < 1")
        feature_fns = [self.lower(a) for a in expr.args[1:]]
        ishape = model.input_shape
        inner = ishape[1:] if ishape else []
        if any(d <= 0 for d in inner) and inner:
            pass
        if inner and all(d > 0 for d in inner):
            expected = 1
            for d in inner:
                expected *= d
            if expected != len(feature_fns):
                raise _Unsupported("feature count mismatch (host path reports it)")
        self.models[model_name] = model

        def run(cols):
            feats = jnp.stack(
                [jnp.asarray(f(cols), jnp.float32) for f in feature_fns], axis=1
            )
            out = model._run_graph(feats)[0]
            if out_col is not None:
                out2 = out.reshape(out.shape[0], -1)
                if out_col >= out2.shape[1]:
                    raise _Unsupported("list index beyond model output width")
                return out2[:, out_col]
            if out.ndim > 1:
                if out.shape[1] != 1:
                    raise _Unsupported("multi-output model under infera_predict")
                out = out[:, 0]
            return out

        return run


def _seg_scan_sum_ds(jax, jnp, v, flag):
    """Segmented inclusive prefix sum as a double-single (hi, lo) f32 pair
    via ONE associative_scan — ~2^-48 relative accuracy, matching the host
    path's f64 prefix sums at f32 output precision (the compensated
    running sums VERDICT r4 item 7 asks for). ``flag`` marks segment
    starts. The two_sum inside the combiner pins through a NaN-shaped
    predicate (v == v) XLA cannot constant-fold, so the compensation
    survives the simplifier (mesh_plan._opaque_pin discipline)."""
    z = jnp.float32(0.0)

    def comb(a, b):
        af, ah, al = a
        bf, bh, bl = b
        s = ah + bh
        t = jnp.where(s == s, s - ah, z)  # unfoldable pin
        e = (ah - (s - t)) + (bh - t)
        lo = e + al + bl
        hi2 = s + lo
        lo2 = lo - jnp.where(hi2 == hi2, hi2 - s, z)
        return (af | bf, jnp.where(bf, bh, hi2), jnp.where(bf, bl, lo2))

    _f, hi, lo = jax.lax.associative_scan(comb, (flag, v, jnp.zeros_like(v)))
    return hi, lo


def _seg_scan_extreme(jax, jnp, v, flag, is_min):
    """Segmented inclusive running min/max via one associative_scan."""
    op = jnp.minimum if is_min else jnp.maximum

    def comb(a, b):
        af, avv = a
        bf, bvv = b
        return (af | bf, jnp.where(bf, bvv, op(avv, bvv)))

    _f, out = jax.lax.associative_scan(comb, (flag, v))
    return out


class _PallasLowerer(_Lowerer):
    """Same AST→closure lowering as _Lowerer, but the closures run INSIDE
    the Pallas fused-plan kernel (ops/pallas_sql.py): columns resolve to
    [1, tile] rows of the stacked feature-major block, and
    ``infera_predict`` lowers to an in-kernel MXU MLP over VMEM-resident
    weights (model.mlp_plan) instead of calling the ONNX executor — the
    inter-layer activations never leave VMEM. f32 HIGHEST matmul precision
    keeps the 1e-5 matmul-parity invariant."""

    def __init__(self, table: Table):
        super().__init__(table)
        self.weight_arrays: list = []  # flat [wT, b, ...] np arrays

    def _lower_window(self, wf):
        # windows need a global sort — impossible inside the tile-local
        # kernel; the XLA fused program carries them instead
        raise _Unsupported("window functions stay on the XLA program")

    def _lower_predict(self, expr: A.FuncCall, out_col: int | None = None):
        if (not expr.args or not isinstance(expr.args[0], A.Literal)
                or not isinstance(expr.args[0].value, str)):
            raise _Unsupported("infera_predict needs a constant model name")
        model_name = expr.args[0].value
        model = MODELS.get(model_name)
        if model is None:
            raise _Unsupported(f"model {model_name} not loaded at plan time")
        self.models[model_name] = model
        precision = getattr(model, "precision", "f32") or "f32"
        plan = getattr(model, "mlp_plan", None)
        if plan is not None:
            if precision not in ("f32", "bf16"):
                raise _Unsupported("int8 models stay on the XLA path")
            return self._lower_mlp(expr, model, plan, out_col,
                                   bf16=precision == "bf16")
        from ..onnx.fusion import detect_tree

        tree = detect_tree(model.graph)
        if tree is not None:
            return self._lower_tree(expr, model, tree[0], out_col,
                                    is_classifier=tree[1])
        raise _Unsupported("pallas plan needs an MLP or tree-forest model")

    def _lower_mlp(self, expr, model, plan, out_col, *, bf16=False):
        """In-kernel MXU MLP. bf16 mirrors _policy_dot's bf16 policy: both
        operands cast to bf16, f32 accumulation (DEFAULT precision =
        single-pass MXU-native rate, ~half the f32 HIGHEST matmul cost)."""
        import jax
        import jax.numpy as jnp

        params, final_softmax = plan[0], plan[1]
        d_in = params[0][0].shape[0]
        d_out = params[-1][0].shape[1]
        oc = self._pick_out_col(out_col, d_out)
        feature_fns = [self.lower(a) for a in expr.args[1:]]
        if len(feature_fns) != d_in:
            raise _Unsupported("feature count mismatch (host path reports it)")
        base = len(self.weight_arrays)
        if bf16:
            import ml_dtypes

            wdt = ml_dtypes.bfloat16
        else:
            wdt = np.float32
        for w, b in params:
            self.weight_arrays.append(
                np.ascontiguousarray(np.asarray(w, np.float32).T
                                     .astype(wdt)))
            self.weight_arrays.append(
                np.asarray(b, np.float32).reshape(-1, 1))
        n_layers = len(params)
        prec = (jax.lax.Precision.DEFAULT if bf16
                else jax.lax.Precision.HIGHEST)

        def run(cols):
            wr = cols["__weights__"]
            h = self._feature_block(cols, feature_fns)
            for li in range(n_layers):
                w = wr[base + 2 * li]
                b = wr[base + 2 * li + 1]
                if bf16:
                    h = jnp.asarray(h, jnp.bfloat16)
                h = jax.lax.dot_general(
                    w, h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec) + b
                if li < n_layers - 1:
                    h = jnp.maximum(h, 0.0)
            if final_softmax:
                h = jax.nn.softmax(h, axis=0)
            return h[oc:oc + 1, :]

        return run

    def _lower_tree(self, expr, model, node, out_col, is_classifier=False):
        """In-kernel GEMM forest (VERDICT r4 item 1): the strip-packed
        tables from _PackedTrees.pallas_forest evaluate the whole ensemble
        as per-chunk [128,128]-class matmuls — the tree-query class
        (BASELINE config 4) joins the device_plan_pallas tier instead of
        riding the scatter-prone XLA aggregate tail. Round 5: classifiers
        too — per-class base values add in-kernel, monotone post
        transforms skip (argmax-invariant), and the label resolves via a
        first-tie argmax + one-hot label map, matching jnp.argmax."""
        import jax
        import jax.numpy as jnp

        if is_classifier:
            labels_int = node.attr("classlabels_int64s")
            labels_str = node.attr("classlabels_strings")
            n_cls = len(labels_int or labels_str or [])
            if n_cls == 0:
                raise _Unsupported("classifier without class labels")
            post = node.attr("post_transform", "NONE")
            if isinstance(post, bytes):
                post = post.decode()
            # argmax-invariant transforms only (SOFTMAX_ZERO is not;
            # PROBIT's erf_inv is NaN outside [0,1] and raw ensemble
            # scores routinely leave that range — host argmax over NaN
            # differs, so it stays on XLA — round-5 review fix)
            if post not in (None, "NONE", "SOFTMAX", "LOGISTIC"):
                raise _Unsupported(f"post_transform {post}")
            if labels_int is not None and any(
                    abs(int(v)) > (1 << 24) for v in labels_int):
                raise _Unsupported("class label beyond f32 exactness")
            return self._lower_tree_tables(
                expr, model, node, out_col, n_out_attr=n_cls,
                weights_key="class", classifier=(labels_int, n_cls),
                post="NONE", agg="SUM")

        n_targets = int(node.attr("n_targets", 1))
        agg = node.attr("aggregate_function", "SUM")
        if isinstance(agg, bytes):
            agg = agg.decode()
        if agg not in ("SUM", "AVERAGE", None):
            raise _Unsupported(f"aggregate_function {agg}")
        post = node.attr("post_transform", "NONE")
        if isinstance(post, bytes):
            post = post.decode()
        if post not in (None, "NONE", "LOGISTIC"):
            raise _Unsupported(f"post_transform {post}")
        return self._lower_tree_tables(
            expr, model, node, out_col, n_out_attr=n_targets,
            weights_key="target", classifier=None, post=post, agg=agg)

    def _lower_tree_tables(self, expr, model, node, out_col, *, n_out_attr,
                           weights_key, classifier, post, agg):
        import jax
        import jax.numpy as jnp

        from ..onnx import ml_ops as ML

        ishape = model.input_shape
        d_in = ishape[1] if len(ishape) > 1 and ishape[1] > 0 else None
        if d_in is None:
            d_in = len(expr.args) - 1
        packed = ML._cached_pack(node, n_out_attr, weights_key)
        tables = packed.pallas_forest(d_in)
        if tables is None:
            raise _Unsupported("forest exceeds the strip-packing limits")
        n_out = tables["n_out"]
        if classifier is not None:
            labels_int, n_cls = classifier
            # the classifier's OUTPUT is one label column
            oc = self._pick_out_col(out_col, 1)
        else:
            oc = self._pick_out_col(out_col, n_out)
        feature_fns = [self.lower(a) for a in expr.args[1:]]
        if len(feature_fns) != d_in:
            raise _Unsupported("feature count mismatch (host path reports it)")
        nch = tables["n_chunks"]
        c_idx = tables["c_idx"]
        strip = tables["strip"]
        strict = tables["strict"]
        bvals = node.attr("base_values")
        # AVERAGE folds into the weight table; scalar per-output bias
        # applies post-slice, per-class biases ride a weight-array row
        # (pallas kernels reject captured closure arrays)
        wT = tables["wT"]
        bias_oc = 0.0
        bias_arr = None
        if bvals:
            if classifier is not None:
                bias_arr = np.asarray(bvals, np.float32).reshape(-1, 1)
            else:
                bias_oc = float(bvals[oc])
        if agg == "AVERAGE":
            # XLA path divides AFTER the base add (ml_ops._tree_regressor)
            wT = wT * np.float32(1.0 / packed.n_trees)
            bias_oc = bias_oc / packed.n_trees
        base = len(self.weight_arrays)
        self.weight_arrays.extend(
            [tables["sel"], tables["th"], tables["C"], tables["D"], wT])
        extra = len(self.weight_arrays)
        if bias_arr is not None:
            self.weight_arrays.append(bias_arr)
        lab_idx = None
        if classifier is not None and labels_int is not None:
            larr = np.asarray(labels_int, np.float32).reshape(-1, 1)
            if not np.array_equal(larr.reshape(-1),
                                  np.arange(len(larr), dtype=np.float32)):
                lab_idx = len(self.weight_arrays)
                self.weight_arrays.append(larr)
        bias_idx = extra if bias_arr is not None else None
        hi = jax.lax.Precision.HIGHEST
        lo = jax.lax.Precision.DEFAULT

        def run(cols):
            wr = cols["__weights__"]
            sel_a, th_a, c_a, d_a, wt_a = wr[base:base + 5]
            h = self._feature_block(cols, feature_fns)
            acc = None
            for c in range(nch):
                selc = sel_a[c * strip:(c + 1) * strip, :]
                thc = th_a[c * strip:(c + 1) * strip, :]
                Cc = c_a[c_idx[c] * strip:(c_idx[c] + 1) * strip, :]
                Dc = d_a[c * strip:(c + 1) * strip, :]
                Wc = wt_a[c * n_out:(c + 1) * n_out, :]
                # one-hot select reproduces each tested feature exactly
                xa = jax.lax.dot_general(
                    selc, h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hi)
                s = jnp.where(xa < thc if strict else xa <= thc,
                              jnp.float32(1.0), jnp.float32(0.0))
                # DEFAULT is exact: s/C are bf16-exact integers and the
                # score magnitude is bounded by the tree depth (< 2^8) —
                # the config-4 roofline trick (ml_ops._gemm_eval_tile)
                score = jax.lax.dot_general(
                    Cc, s, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=lo)
                hit = jnp.where(score == Dc, jnp.float32(1.0),
                                jnp.float32(0.0))
                contrib = jax.lax.dot_general(
                    Wc, hit, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hi)
                acc = contrib if acc is None else acc + contrib
            if classifier is None:
                y = acc[oc:oc + 1, :]
                if bias_oc:
                    y = y + jnp.float32(bias_oc)
                if post == "LOGISTIC":
                    y = jax.nn.sigmoid(y)
                return y
            # classifier tail: base add → (binary expand) → argmax with
            # FIRST-index tie-break (jnp.argmax parity) → label map
            scores = acc
            if bias_idx is not None:
                scores = scores + wr[bias_idx]
            if n_cls == 2 and scores.shape[0] == 1:
                scores = jnp.concatenate([-scores, scores], axis=0)
            m = jnp.max(scores, axis=0, keepdims=True)
            # tpu.iota is integer-only — build int32 then widen
            iota = jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 0).astype(jnp.float32)
            idx = jnp.min(jnp.where(scores == m, iota,
                                    jnp.float32(1 << 20)),
                          axis=0, keepdims=True)
            if lab_idx is None:
                return idx  # labels are 0..n-1 (or string → index)
            onehot = jnp.where(iota == idx, jnp.float32(1.0),
                               jnp.float32(0.0))
            return jnp.sum(onehot * wr[lab_idx], axis=0, keepdims=True)

        return run

    @staticmethod
    def _pick_out_col(out_col, d_out):
        if out_col is None:
            if d_out != 1:
                raise _Unsupported("multi-output model under infera_predict")
            return 0
        if out_col < 0 or out_col >= d_out:
            raise _Unsupported("list index beyond model output width")
        return out_col

    @staticmethod
    def _feature_block(cols, feature_fns):
        import jax.numpy as jnp

        zeros = cols["__zeros__"]
        feats = []
        for f in feature_fns:
            v = jnp.asarray(f(cols), jnp.float32)
            feats.append(v.reshape(1, 1) + zeros if v.ndim == 0 else v)
        return jnp.concatenate(feats, axis=0)  # [d_in, tile]


# aggregate names the Pallas fused plan carries. Round-5 widening (VERDICT
# r4 item 2): the variance family, count_if, bool_and/or, product,
# exact-int64 limb sums (isum/iavg via f32-exact byte rows), and the
# DISTINCT presence family all lower onto the kernel's [G, 128]
# lane-accumulator scheme. Median/quantile (sorts), mode/hll (big side
# tables), arg_min/max and lexicographic int64 min/max (two-level
# selection) keep the XLA program.
_PALLAS_OK_AGGS = frozenset(
    {"key", "count", "count_star", "sum", "avg", "mean", "min", "max",
     "var", "cif", "band", "bor", "prod", "isum", "iavg",
     "dcount", "dsum", "davg", "argmn", "argmx", "imin", "imax",
     "mode"})

# DISTINCT slots: value index rides the kernel lanes, <= 4 banks of 128
PALLAS_MAX_DIST_DOMAIN = 512


def _try_pallas_fused(conn, sel, table, n, n_groups, strides, agg_plans,
                      items_plan, having_aggs, plan_key, dist_domains=None):
    """Lower the fused plan through the Pallas columnar kernel
    (ops/pallas_sql.py). Returns the _assemble_result 5-tuple or None
    (caller falls through to the XLA program — semantics never regress)."""
    from ..ops import pallas_sql as PS

    mode = PS.pallas_sql_mode()
    if mode == "0":
        return None
    import jax

    # the tunneled TPU platform reports backend "axon", not "tpu" — treat
    # anything that isn't the CPU/GPU host backend as real TPU hardware
    # (same convention as onnx/fusion.maybe_run_fused)
    interpret = jax.default_backend() in ("cpu", "gpu")
    if interpret and mode != "1":
        return None  # interpret mode is the test hook, not a fast path
    if not (1 <= n_groups <= PS.PALLAS_MAX_GROUPS) or n < MIN_DEVICE_ROWS:
        return None
    if any(p[0] not in _PALLAS_OK_AGGS for p in agg_plans):
        return None
    dist_domains = dist_domains or {}
    from .int_agg import byte_columns

    pl_low = _PallasLowerer(table)
    extra_rows: dict = {}  # synthetic block rows (int64 byte limbs)

    def _byte_keys(col_key):
        col = table.columns[col_key]
        bts = byte_columns(col)
        keys = []
        for j, b in enumerate(bts):
            k = f"{col_key}#b{j}"
            extra_rows[k] = b
            keys.append(k)
        return keys

    try:
        where_fn = pl_low.lower(sel.where) if sel.where is not None else None
        key_fns = [pl_low.lower(g) for g in sel.group_by]
        sum_fns: list = []
        min_fns: list = []
        max_fns: list = []
        dist_fns: list = []
        arg_specs: list = []  # (skey fn, is_min) arg_min/arg_max slots
        lex_specs: list = []  # (byte-row keys, is_min) int64 min/max
        slot_map: list = []  # per agg_plans entry
        nodes = [node for _k, node in items_plan] + list(having_aggs)
        for ai, ((pname, payload), node) in enumerate(zip(agg_plans, nodes)):
            if pname == "key":
                slot_map.append(("key", payload))
                continue
            if pname in ("count", "count_star"):
                # device-eligible columns carry no NULLs → count(expr)
                # counts exactly the selected rows (same as the XLA path)
                slot_map.append(("count", None))
                continue
            if pname in ("imin", "imax"):
                # exact int64 extremes: lexicographic 16-bit word cascade
                # over the byte-limb rows (round 5)
                lex_specs.append((tuple(_byte_keys(payload)),
                                  pname == "imin"))
                slot_map.append((pname, len(lex_specs) - 1))
                continue
            if pname in ("isum", "iavg"):
                # 8-bit limb rows (f32-exact) + a magnitude-estimate row
                bkeys = _byte_keys(payload)
                base_i = len(sum_fns)
                for k in bkeys:
                    sum_fns.append(lambda cols, k=k: cols[k])

                def est_fn(cols, bk=tuple(bkeys)):
                    import jax.numpy as jnp
                    lo_u = (cols[bk[0]] + cols[bk[1]] * 256.0
                            + cols[bk[2]] * 65536.0
                            + cols[bk[3]] * 16777216.0)
                    hi_u = (cols[bk[4]] + cols[bk[5]] * 256.0
                            + cols[bk[6]] * 65536.0
                            + cols[bk[7]] * 16777216.0)
                    hi_s = jnp.where(hi_u >= 2147483648.0,
                                     hi_u - 4294967296.0, hi_u)
                    return jnp.abs(hi_s * 4294967296.0 + lo_u)

                sum_fns.append(est_fn)
                slot_map.append((pname, base_i))
                continue
            if pname == "var":
                vfn0, _dd, _sq, shift = payload
                arg_fn = pl_low.lower(node.args[0])
                sh = float(shift)
                base_i = len(sum_fns)
                sum_fns.append(lambda cols, f=arg_fn, s=sh: f(cols) - s)

                def sq_fn(cols, f=arg_fn, s=sh):
                    v = f(cols) - s
                    return v * v

                sum_fns.append(sq_fn)
                slot_map.append(("var", base_i))
                continue
            if pname in ("dcount", "dsum", "davg", "mode"):
                v_dom = dist_domains.get(ai)
                if v_dom is None or v_dom > PALLAS_MAX_DIST_DOMAIN:
                    return None
                arg_fn = pl_low.lower(node.args[0])
                dist_fns.append((arg_fn, int(v_dom),
                                 "mode" if pname == "mode" else "dist"))
                slot_map.append((pname, len(dist_fns) - 1))
                continue
            if pname in ("argmn", "argmx"):
                # winning row id in-kernel (lexicographic value+rowid
                # accumulators); the host gathers the arg — any type
                skey_fn = pl_low.lower(node.args[1])
                arg_specs.append((skey_fn, pname == "argmn"))
                slot_map.append((pname, len(arg_specs) - 1))
                continue
            arg_fn = pl_low.lower(node.args[0])
            if pname in ("sum", "avg", "mean"):
                sum_fns.append(arg_fn)
                slot_map.append((pname, len(sum_fns) - 1))
            elif pname == "cif":
                sum_fns.append(lambda cols, f=arg_fn: _bool_row(f(cols)))
                slot_map.append(("cif", len(sum_fns) - 1))
            elif pname == "prod":
                base_i = len(sum_fns)
                sum_fns.append(
                    lambda cols, f=arg_fn: _bool_row(f(cols) < 0.0))
                sum_fns.append(
                    lambda cols, f=arg_fn: _bool_row(f(cols) == 0.0))

                def log_fn(cols, f=arg_fn):
                    import jax.numpy as jnp
                    v = jnp.asarray(f(cols), jnp.float32)
                    safe = jnp.where(v == 0.0, jnp.float32(1.0), v)
                    return jnp.where(v != 0.0,
                                     jnp.log2(jnp.abs(safe)),
                                     jnp.float32(0.0))

                sum_fns.append(log_fn)
                slot_map.append(("prod", base_i))
            elif pname == "band":
                min_fns.append(lambda cols, f=arg_fn: _bool_row(f(cols)))
                slot_map.append(("band", len(min_fns) - 1))
            elif pname == "bor":
                max_fns.append(lambda cols, f=arg_fn: _bool_row(f(cols)))
                slot_map.append(("bor", len(max_fns) - 1))
            elif pname == "min":
                min_fns.append(arg_fn)
                slot_map.append(("min", len(min_fns) - 1))
            else:
                max_fns.append(arg_fn)
                slot_map.append(("max", len(max_fns) - 1))
    except _Unsupported:
        return None
    if not (pl_low.used_columns or extra_rows) or \
            len(pl_low.used_columns) + len(extra_rows) > PS.PALLAS_MAX_COLS:
        return None
    if sum(w.nbytes for w in pl_low.weight_arrays) > \
            PS.PALLAS_MAX_WEIGHT_BYTES:
        return None
    # the stacked block is f32: integer columns must be exactly
    # representable (the XLA path rides int32 — exact to 2^31)
    for c in pl_low.used_columns.values():
        d = c.data
        if d.dtype.kind in "iu" and d.size:
            rng = getattr(c, "_int_range", None)
            if rng is None:
                rng = (int(d.min()), int(d.max()))
                c._int_range = rng
            if rng[0] < -(1 << 24) or rng[1] > (1 << 24):
                return None
    col_keys = sorted(pl_low.used_columns) + sorted(extra_rows)
    col_arrays = [pl_low.used_columns[k].data
                  for k in sorted(pl_low.used_columns)] \
        + [extra_rows[k] for k in sorted(extra_rows)]
    # per-query view of the shared table block (device row-gather, or the
    # block itself when the query reads every block column) — the upload
    # happened once for ALL tiers (VERDICT r4 item 3b)
    xc_dev = None
    if not extra_rows:
        blk = get_table_block(conn, table)
        if blk is not None:
            xc_full, rmap, _bpad = blk
            if all(k in rmap for k in col_keys):
                idxs = tuple(rmap[k] for k in col_keys)
                xc_dev = _block_view(conn, xc_full, idxs)
    res = PS.execute_fused_plan(
        conn, plan_key=plan_key, col_arrays=col_arrays, col_keys=col_keys,
        weights=pl_low.weight_arrays, where_fn=where_fn, key_fns=key_fns,
        strides=strides, n_groups=n_groups, sum_fns=sum_fns,
        min_fns=min_fns, max_fns=max_fns, n=n, interpret=interpret,
        dist_fns=dist_fns, arg_specs=arg_specs, lex_specs=lex_specs,
        xc_dev=xc_dev)
    if res is None:
        return None

    def fold64(i):
        s, c = res["sums"][i]
        return np.asarray(s, np.float64) + np.asarray(c, np.float64)

    results: list = []
    for spec, si in slot_map:
        if spec == "key":
            results.append(np.asarray(res["kmaxs"][si]))
        elif spec == "count":
            results.append(res["count"])
        elif spec in ("sum", "avg", "mean", "cif"):
            results.append(res["sums"][si])  # (sum, comp) f32 pair
        elif spec == "var":
            results.append((fold64(si), fold64(si + 1)))
        elif spec in ("isum", "iavg"):
            limbs = np.stack(
                [np.rint(fold64(si + j)).astype(np.int64)
                 for j in range(8)], axis=1)
            results.append((limbs, fold64(si + 8)))
        elif spec == "prod":
            s, c = res["sums"][si + 2]
            results.append((fold64(si), fold64(si + 1), s, c))
        elif spec in ("min", "band"):
            results.append(np.asarray(res["mins"][si]))
        elif spec in ("max", "bor"):
            results.append(np.asarray(res["maxs"][si]))
        elif spec == "mode":
            # unique-max only: a tied max needs the host catalog's
            # first-occurrence tie-break, which the XLA program carries
            # (its first-seen matrix) — fall through to IT, not host.
            # DEAD groups (count 0) "tie" trivially at count 0 — ignore.
            live_g = np.asarray(res["count"]) > 0
            if bool(((res["dhis"][si] > 1.0) & live_g).any()):
                return None
            results.append((res["dlos"][si], res["dcounts"][si],
                            res["dbads"][si]))
        elif spec == "dcount":
            results.append((res["dcounts"][si], res["dbads"][si]))
        elif spec in ("argmn", "argmx"):
            results.append((res["argrids"][si],))
        elif spec in ("imin", "imax"):
            # 16-bit sign-biased words -> the finalize's (hi, lo_biased)
            # int32 convention (int_agg.fold_lex_host)
            w3, w2, w1, w0 = [np.rint(np.asarray(w, np.float64))
                              .astype(np.int64)
                              for w in res["lexwords"][si]]
            u_hi = np.clip(w3, 0, None) * 65536 + np.clip(w2, 0, None)
            u_lo = np.clip(w1, 0, None) * 65536 + np.clip(w0, 0, None)
            dead = (w3 < 0) | (w3 >= (1 << 16))  # fill -> empty group
            hi = (u_hi - (1 << 31)).astype(np.int64)
            lo_biased = ((u_lo ^ (1 << 31)) - (1 << 32) * (u_lo >= (1 << 31))
                         ).astype(np.int64)
            # empty groups: mirror the XLA identities (INT32_MAX / MIN
            # words) so dead slots fold to harmless extremes
            if bool(dead.any()):
                hi = np.where(dead, np.int64(2**31 - 1), hi)
                lo_biased = np.where(dead, np.int64(2**31 - 1), lo_biased)
            results.append((hi.astype(np.int32),
                            lo_biased.astype(np.int32)))
        else:  # dsum / davg
            results.append((res["dcounts"][si], res["dlos"][si],
                            res["dhis"][si], res["dbads"][si]))
    return (results, res["count"], res["kmins"], res["kmaxs"],
            res["fracs"])


def _bool_row(v):
    import jax.numpy as jnp

    return jnp.asarray(v, bool).astype(jnp.float32)


def _having_supported(expr: A.Expr) -> bool:
    """HAVING predicates the device path handles: aggregate calls, numeric
    literals, and arithmetic/comparison/boolean combinators (no bare column
    refs — the host path keeps those)."""
    if isinstance(expr, A.Literal):
        return expr.value is None or not isinstance(expr.value, str)
    if isinstance(expr, A.FuncCall):
        return expr.name.lower() in _AGG_NAMES
    if isinstance(expr, A.Unary):
        return expr.op in ("-", "NOT") and _having_supported(expr.operand)
    if isinstance(expr, A.Binary):
        return (expr.op in ("+", "-", "*", "/", "%", "=", "<>", "<", "<=",
                            ">", ">=", "AND", "OR")
                and _having_supported(expr.left)
                and _having_supported(expr.right))
    if isinstance(expr, A.Between):
        return (_having_supported(expr.operand)
                and _having_supported(expr.low)
                and _having_supported(expr.high))
    return False


def _eval_having(expr: A.Expr, agg_arrays: dict) -> np.ndarray:
    """Evaluate the HAVING predicate over per-group numpy arrays
    (agg_arrays maps id(agg node) → np array)."""
    if isinstance(expr, A.Literal):
        return np.asarray(expr.value)
    if isinstance(expr, A.FuncCall):
        return agg_arrays[id(expr)]
    if isinstance(expr, A.Unary):
        v = _eval_having(expr.operand, agg_arrays)
        return np.logical_not(v) if expr.op == "NOT" else -v
    if isinstance(expr, A.Between):
        v = _eval_having(expr.operand, agg_arrays)
        lo = _eval_having(expr.low, agg_arrays)
        hi = _eval_having(expr.high, agg_arrays)
        res = (v >= lo) & (v <= hi)
        return np.logical_not(res) if expr.negated else res
    l_ = _eval_having(expr.left, agg_arrays)
    r_ = _eval_having(expr.right, agg_arrays)
    ops = {"+": np.add, "-": np.subtract, "*": np.multiply,
           "/": np.divide, "%": np.mod,
           "=": np.equal, "<>": np.not_equal, "<": np.less,
           "<=": np.less_equal, ">": np.greater, ">=": np.greater_equal,
           "AND": np.logical_and, "OR": np.logical_or}
    return ops[expr.op](l_, r_)


def _find_column_refs(expr: A.Expr, out: list):
    if isinstance(expr, A.ColumnRef):
        out.append(expr)
        return
    for attr in ("operand", "left", "right", "low", "high"):
        child = getattr(expr, attr, None)
        if isinstance(child, A.Expr):
            _find_column_refs(child, out)
    if isinstance(expr, A.FuncCall):
        for a in expr.args:
            if isinstance(a, A.Expr):
                _find_column_refs(a, out)


def _group_keys_int32_safe(lowerer, group_by) -> bool:
    """Group keys ride to device as int32 (x64 disabled): an int64/uint64
    column with values outside int32 aliases mod 2^32 at upload, which slips
    past the per-bucket collision guard (it compares post-truncation values).
    Probe referenced wide-integer columns host-side; out of range → host path."""
    for g in group_by:
        refs: list = []
        _find_column_refs(g, refs)
        for e in refs:
            try:
                key = lowerer._column(e.name, e.table)
            except _Unsupported:
                return False
            col = (lowerer.col_for_key(key) if hasattr(lowerer, "col_for_key")
                   else lowerer.table.columns[key])
            d = col.data
            if d.dtype.kind in "iu" and d.dtype.itemsize > 4 and d.size:
                rng = getattr(col, "_int_range", None)
                if rng is None:
                    rng = (int(d.min()), int(d.max()))
                    col._int_range = rng
                if rng[0] < -(1 << 31) or rng[1] >= (1 << 31):
                    return False
    return True


def _find_aggs(expr: A.Expr, out: list):
    if isinstance(expr, A.FuncCall) and expr.name.lower() in _AGG_NAMES:
        out.append(expr)
        return
    for attr in ("operand", "left", "right", "low", "high"):
        child = getattr(expr, attr, None)
        if isinstance(child, A.Expr):
            _find_aggs(child, out)
    if isinstance(expr, A.FuncCall):
        for a in expr.args:
            if isinstance(a, A.Expr):
                _find_aggs(a, out)


def _finalize_agg(pname, payload, res, group_count):
    """Fold one device aggregate's raw output into final host values.

    Returns (values [Gtot], sql_type, badmask | None) — badmask marks groups
    whose result is undefined (var with count <= ddof, avg of 0 rows); the
    caller falls back to the host path when a LIVE group is bad. Returns
    None for host fallback (distinct invalid flag, iavg overflow); raises
    SqlError for genuine SUM(BIGINT) overflow (host-path parity)."""
    from .int_agg import fold_lex_host, fold_limbs_host

    if pname in ("count", "count_star", "count_matched"):
        return np.asarray(res).astype(np.int64), T.BIGINT, None
    if pname == "cif":
        if isinstance(res, tuple):  # mesh: compensated (s, c) pair tables
            s64 = (np.asarray(res[0], np.float64)
                   + np.asarray(res[1], np.float64))
            if s64.ndim == 2:
                ps = s64.sum(axis=0)
                s64 = np.tile(ps, len(group_count) // ps.shape[0])
        else:
            s64 = np.asarray(res, np.float64)
        return np.rint(s64).astype(np.int64), T.BIGINT, None
    if pname in ("band", "bor"):
        # the and/or distinction lives in the min-vs-max partial upstream
        v = np.asarray(res, np.float64)
        return v >= 0.5, T.BOOLEAN, np.asarray(group_count) == 0
    if pname == "prod":
        def _fold2(a, b=None):
            x = np.asarray(a, np.float64)
            if b is not None:
                x = x + np.asarray(b, np.float64)
            if x.ndim == 2:  # mesh: per-source aligned tables
                xs = x.sum(axis=0)
                x = np.tile(xs, len(group_count) // xs.shape[0])
            return x
        if len(res) == 6:  # mesh: three (s, c) pairs
            neg = _fold2(res[0], res[1])
            zero = _fold2(res[2], res[3])
            l64 = _fold2(res[4], res[5])
        else:              # single-device: (negs, zeros, ls, lc)
            neg = _fold2(res[0])
            zero = _fold2(res[1])
            l64 = _fold2(res[2], res[3])
        sign = np.where(np.rint(neg).astype(np.int64) % 2 == 1, -1.0, 1.0)
        with np.errstate(over="ignore"):
            # sign * 0.0 preserves IEEE signed zero — host-path parity
            vals = np.where(zero > 0.5, sign * 0.0, sign * np.exp2(l64))
        return vals, T.DOUBLE, np.asarray(group_count) == 0
    if pname in ("argmn", "argmx"):
        _vfn, acol = payload
        rid = np.asarray(res[0]).astype(np.int64)
        bad = (rid < 0) | (rid >= len(acol.data))
        vals = np.empty(len(rid), dtype=object)
        for i, r in enumerate(rid):
            vals[i] = acol.value(int(r)) if not bad[i] else None
        return vals, acol.sql_type, bad
    if pname == "hll":
        from ..ops.aggregate import hll_estimate_from_hist

        hist = np.asarray(res, np.float64)
        if hist.ndim == 3:  # mesh: gathered [ndev, G, 55] owner tables
            hist = hist.reshape(-1, 55)
        return (hll_estimate_from_hist(hist), T.BIGINT,
                np.asarray(group_count) == 0)
    if pname in ("isum", "iavg"):
        if len(res) == 3:  # mesh merge returns 16-bit-widened limb words
            lo16, hi16, est = res
            limbs = (np.asarray(lo16, np.int64)
                     + (np.asarray(hi16, np.int64) << 16))
        else:
            limbs_d, est = res
            limbs = np.asarray(limbs_d, np.int64)
        est = np.asarray(est, np.float64)
        total = fold_limbs_host(limbs)
        if pname == "isum":
            if (est >= 2.0**62).any():
                from ..errors import SqlError

                raise SqlError("Out of Range Error: overflow in SUM(BIGINT)")
            return total, T.BIGINT, None
        if (est >= 2.0**62).any():
            return None  # exact int64 sum impossible → host path
        c = np.asarray(group_count, np.float64)
        return (total.astype(np.float64) / np.where(c == 0, 1.0, c),
                T.DOUBLE, c == 0)
    if pname in ("imin", "imax"):
        hi, lo = res
        return fold_lex_host(np.asarray(hi), np.asarray(lo)), T.BIGINT, None
    if pname == "var":
        _fn, ddof, sq, _shift = payload
        s = np.asarray(res[0], np.float64)
        s2 = np.asarray(res[1], np.float64)
        c = np.asarray(group_count, np.float64)
        bad = c <= ddof
        var = (s2 - s * s / np.where(c == 0, 1.0, c)) / np.where(
            bad, 1.0, c - ddof)
        var = np.maximum(var, 0.0)
        return (np.sqrt(var) if sq else var), T.DOUBLE, bad
    if pname == "median":
        lo, hi = res
        c = np.asarray(group_count, np.float64)
        vals = (np.asarray(lo, np.float64) + np.asarray(hi, np.float64)) / 2.0
        return vals, T.DOUBLE, c == 0
    if pname == "quantile":
        c = np.asarray(group_count, np.float64)
        if len(res) == 3:  # continuous: (floor val, ceil val, frac)
            lo, hi, frac = (np.asarray(a, np.float64) for a in res)
            with np.errstate(invalid="ignore"):  # dead groups hold -inf
                return lo + (hi - lo) * frac, T.DOUBLE, c == 0
        return np.asarray(res[0], np.float64), T.DOUBLE, c == 0
    if pname == "mode":
        mode_v, mcount, bad = res
        if bool(np.asarray(bad)):
            return None  # fractional / out-of-domain values → host
        c = np.asarray(mcount, np.float64)
        return (np.rint(np.asarray(mode_v, np.float64)).astype(np.int64),
                T.BIGINT, c == 0)
    if pname == "dcount":
        dcount, bad = res
        if bool(np.asarray(bad)):
            return None  # fractional / negative / out-of-domain values
        return np.asarray(dcount).astype(np.int64), T.BIGINT, None
    if pname in ("dsum", "davg"):
        dcount, dlo, dhi, bad = res
        if bool(np.asarray(bad)):
            return None
        total = (np.rint(np.asarray(dlo, np.float64)).astype(np.int64)
                 + (np.rint(np.asarray(dhi, np.float64)).astype(np.int64) << 7))
        if pname == "dsum":
            return total, T.BIGINT, None
        c = np.asarray(dcount, np.float64)
        return (total.astype(np.float64) / np.where(c == 0, 1.0, c),
                T.DOUBLE, c == 0)
    if pname in ("min", "max") and isinstance(res, tuple):
        # outer-join matched-validity min/max: (values, non-NULL count);
        # a LIVE group with zero valid rows renders NULL → host path
        v, cntv = res
        c = np.asarray(cntv, np.float64)
        return np.asarray(v).astype(np.float64), T.DOUBLE, c == 0
    if pname in ("sum", "avg", "mean") and isinstance(res, tuple) \
            and len(res) == 3:
        # outer-join matched-validity sum/avg: compensated pair + own
        # non-NULL count (avg divides by it, NOT by the group row count)
        s64 = np.asarray(res[0], np.float64) + np.asarray(res[1], np.float64)
        if s64.ndim == 2:  # mesh: per-source [ndev, G] aligned pair tables
            pair_sum = s64.sum(axis=0)
            s64 = np.tile(pair_sum, len(group_count) // pair_sum.shape[0])
        c = np.asarray(res[2], np.float64)
        bad = c == 0
        if pname == "sum":
            return s64, T.DOUBLE, bad
        return s64 / np.where(bad, 1.0, c), T.DOUBLE, bad
    if pname in ("sum", "avg", "mean") and isinstance(res, tuple):
        # compensated (sum, comp) f32 pair(s), folded here in f64 (exact).
        # Single-device: a [G] pair. Mesh: per-source [ndev, G] pair tables
        # aligned so group g sits in column g of every slice — fold them
        # all, then tile back onto the [ndev*G] group-slot layout (each
        # bucket column holds at most one accepted group; collisions
        # already fell back via the key guard).
        s64 = np.asarray(res[0], np.float64) + np.asarray(res[1], np.float64)
        if s64.ndim == 2:
            pair_sum = s64.sum(axis=0)
            v = np.tile(pair_sum, len(group_count) // pair_sum.shape[0])
        else:
            v = s64
        empty = np.asarray(group_count) == 0
        if pname == "sum":
            return v, T.DOUBLE, empty
        c = np.asarray(group_count, np.float64)
        return v / np.where(c == 0, 1.0, c), T.DOUBLE, empty
    # plain f32 aggregates (sum/avg/min/max); an EMPTY live group (global
    # aggregate, all-false WHERE) must render NULL, not 0.0/+-inf — the
    # badmask sends it to the host path (round-4 review fix)
    return (np.asarray(res).astype(np.float64), T.DOUBLE,
            np.asarray(group_count) == 0)


def _assemble_result(sel: A.Select, items_plan, agg_plans, having_plan,
                     results, group_count, key_mins, key_maxs, frac_flags,
                     has_keys: bool):
    """Host-side post-processing of the device group table (single-device or
    mesh-merged): live-group mask, key collision guards, HAVING, rendering.
    Returns a Table, or None when a guard trips (caller falls back to host)."""
    if has_keys:
        live = group_count > 0
    else:
        # the global group always exists (count 0 is a valid result row);
        # on the mesh table it lives at slot 0 of the owning device
        live = np.zeros(len(group_count), bool)
        live[0] = True
    for kmin_d, kmax_d, frac_d in zip(key_mins, key_maxs, frac_flags):
        if bool(np.asarray(frac_d)):
            return None  # fractional key values — int bucketing would merge
        kmin = np.asarray(kmin_d)[live]
        kmax = np.asarray(kmax_d)[live]
        if (kmin != kmax).any():
            return None  # modulo bucket held distinct keys — host path
    # finalize every aggregate once (select items + hidden HAVING outputs)
    finals = []
    for (pname, payload), res in zip(agg_plans, results):
        if pname == "key":
            finals.append(None)
            continue
        fin = _finalize_agg(pname, payload, res, group_count)
        if fin is None:
            return None
        vals, styp, badmask = fin
        if badmask is not None and bool((badmask & live).any()):
            return None  # NULL-producing group → host path renders it
        finals.append((vals, styp))
    hmask = None
    if sel.having is not None:
        agg_arrays = {}
        for hnode, pidx in having_plan:
            agg_arrays[id(hnode)] = finals[pidx][0][live]
        try:
            hmask = np.asarray(_eval_having(sel.having, agg_arrays), bool)
        except Exception:
            return None
        if hmask.ndim == 0:
            hmask = np.full(int(np.sum(live)), bool(hmask))
    out_cols: dict = {}
    for (kind, node), (pname, _), res, fin in zip(
            items_plan, agg_plans, results, finals):
        idx = len(out_cols)
        item = sel.items[idx]
        # match host-path naming: bare key columns keep their name so a
        # trailing ORDER BY <key> resolves against the fused result instead
        # of silently de-fusing to the host path
        name = item.alias or (
            item.expr.name if isinstance(item.expr, A.ColumnRef)
            else node.name if isinstance(node, A.FuncCall) else f"col{idx}")
        base, k = name, 1
        while name in out_cols:
            name = f"{base}_{k}"
            k += 1
        if pname == "key":
            vals = np.asarray(res)[live]
            if hmask is not None:
                vals = vals[hmask]
            is_int = np.all(vals == np.round(vals))
            out_cols[name] = Column(
                vals.astype(np.int64) if is_int else vals,
                T.BIGINT if is_int else T.DOUBLE)
            continue
        vals, styp = fin
        vals = vals[live]
        if hmask is not None:
            vals = vals[hmask]
        if isinstance(vals, np.ndarray) and vals.dtype == object:
            # arg_min/arg_max host-gathered values can be any type
            # (strings, NULLs) — route through from_values for validity
            out_cols[name] = Column.from_values(list(vals), styp)
        else:
            out_cols[name] = Column(vals, styp)
    return Table(out_cols)


def try_execute_on_device(conn, sel: A.Select, table: Table,
                          analyze_only: bool = False):
    """Compile + run the SELECT on device; returns a Table or None.

    With ``analyze_only`` returns True/None after eligibility checking +
    lowering, without touching the device (used by EXPLAIN).

    Records a per-phase wall-clock breakdown (plan / probe / upload /
    exec+readback) on ``conn._last_phases`` — surfaced through METRICS and
    EXPLAIN ANALYZE so the engine-side overhead between the raw kernel time
    and SQL end-to-end latency is attributable (VERDICT round-2 item 5)."""
    import time as _time

    _t0 = _time.perf_counter()
    _phases: dict = {}
    conn._last_phases = None
    if (
        sel.from_ is None
        or table.num_rows < MIN_DEVICE_ROWS
        or table.num_rows >= (1 << 24)  # f32 count exactness bound
        or sel.distinct
        or len(sel.group_by) > 4  # mixed-radix combined-key bound
    ):
        return None
    # HAVING: aggregates compute on device as hidden outputs; the predicate
    # itself evaluates host-side over the (tiny) per-group result arrays
    having_aggs: list = []
    if sel.having is not None:
        if not _having_supported(sel.having):
            return None
        _find_aggs(sel.having, having_aggs)

    agg_nodes: list = []
    for item in sel.items:
        _find_aggs(item.expr, agg_nodes)
    if not agg_nodes:
        return None
    # every select item must be exactly one aggregate call or a group key
    # (DISTINCT aggregates are planned below: count/sum/avg via the dense
    # presence matrix, min/max are distinct-insensitive)
    items_plan = []
    for item in sel.items:
        e = item.expr
        if isinstance(e, A.FuncCall) and e.name.lower() in _AGG_NAMES:
            items_plan.append(("agg", e))
        elif sel.group_by and e in sel.group_by:
            items_plan.append(("key", sel.group_by.index(e)))
        else:
            return None

    import jax
    import jax.numpy as jnp

    lowerer = _Lowerer(table)

    def _float_only(expr: A.Expr) -> bool:
        """sum/avg/min/max run in f32 on device — only allow when every
        referenced column is already a float type (integer sums need exact
        arithmetic; the host path keeps those)."""
        ok = True

        def walk(e):
            nonlocal ok
            if isinstance(e, A.ColumnRef):
                try:
                    key = lowerer._column(e.name, e.table)
                except _Unsupported:
                    ok = False
                    return
                t = table.columns[key].sql_type
                if not (t.is_float or t.name == "DECIMAL"):
                    ok = False
            if isinstance(e, A.FuncCall):
                if e.name.lower() == "infera_predict":
                    return  # prediction output is f32 by construction
                for a in e.args:
                    if isinstance(a, A.Expr):
                        walk(a)
                return
            for attr in ("operand", "left", "right", "low", "high"):
                child = getattr(e, attr, None)
                if isinstance(child, A.Expr):
                    walk(child)

        walk(expr)
        return ok

    def _f32_safe(expr: A.Expr) -> bool:
        """Like _float_only, but additionally admits integer columns whose
        probed value range fits f32 exactly (|v| <= 2^24) — var/stddev over
        small-int columns lose nothing to the f32 carrier."""
        ok = True

        def walk(e):
            nonlocal ok
            if isinstance(e, A.ColumnRef):
                try:
                    key = lowerer._column(e.name, e.table)
                except _Unsupported:
                    ok = False
                    return
                col = table.columns[key]
                t = col.sql_type
                if t.is_float or t.name == "DECIMAL":
                    return
                d = col.data
                if d.dtype.kind in "iu" and d.size:
                    rng = getattr(col, "_int_range", None)
                    if rng is None:
                        rng = (int(d.min()), int(d.max()))
                        col._int_range = rng
                    if rng[0] >= -(1 << 24) and rng[1] <= (1 << 24):
                        return
                ok = False
                return
            if isinstance(e, A.FuncCall):
                if e.name.lower() == "infera_predict":
                    return
                for a in e.args:
                    if isinstance(a, A.Expr):
                        walk(a)
                return
            for attr in ("operand", "left", "right", "low", "high"):
                child = getattr(e, attr, None)
                if isinstance(child, A.Expr):
                    walk(child)

        walk(expr)
        return ok

    from .int_agg import MAX_LIMB_ROWS, word_columns

    n = table.num_rows
    int_cols: set = set()

    def _plan_one_agg(node):
        """One aggregate call -> agg_plans entry, or None (host path).

        Entry shapes: (name, fn) float aggs; ("count_star", None);
        ("isum"|"iavg"|"imin"|"imax", col_key) exact int64 over a plain
        integer column (limb sums / lexicographic words, sql/int_agg.py);
        ("var", (fn, ddof, sqrt, shift)) variance family via shifted
        (sum, sum^2) partials; ("dcount"|"dsum"|"davg", fn) DISTINCT via a
        dense [G, V] presence matrix (V probed after analyze_only)."""
        name = node.name.lower()
        if node.is_star or not node.args:
            if name != "count" or node.distinct:
                return None
            return ("count_star", None)
        arg = node.args[0]
        if node.distinct:
            if name == "count":
                return ("dcount", lowerer.lower(arg))
            if name in ("sum", "avg", "mean"):
                return ("dsum" if name == "sum" else "davg",
                        lowerer.lower(arg))
            if name not in ("min", "max"):
                return None  # DISTINCT var/stddev stays on the host path
            # min/max are distinct-insensitive — plan as plain min/max
        if name == "mode":
            # counts-matrix mode over a probed small-int domain (tie-break =
            # earliest first occurrence, host-catalog semantics); domain
            # probed below with the DISTINCT machinery
            if node.distinct:
                return None
            return ("mode", lowerer.lower(arg))
        if name == "median":
            # sort-based per-group median (single-device path; the mesh
            # decomposition rejects it — medians don't commute with the
            # exchange — so meshed connections fall to this path's
            # single-device program via the mesh-None fallback)
            if not _f32_safe(arg):
                return None
            return ("median", lowerer.lower(arg))
        if name in _QUANTILE_FAMILY:
            # generalizes the median sort: per-group rank indices from a
            # STATIC quantile fraction (2nd arg must be a literal); bad
            # fractions fall to the host path, which raises the error
            if node.distinct or len(node.args) != 2:
                return None
            qlit = node.args[1]
            if not (isinstance(qlit, A.Literal)
                    and isinstance(qlit.value, (int, float))
                    and not isinstance(qlit.value, bool)):
                return None
            q = float(qlit.value)
            if not (0.0 <= q <= 1.0) or not _f32_safe(arg):
                return None
            return ("quantile",
                    (lowerer.lower(arg), q, _QUANTILE_FAMILY[name]))
        if name in _VAR_FAMILY:
            if not _f32_safe(arg):
                return None
            fn = lowerer.lower(arg)
            # shift by a sample mean for conditioning: var is shift-
            # invariant, and |x - mean| << |x| keeps s^2 - s*s/c from
            # cancelling in f32
            shift = 0.0
            if isinstance(arg, A.ColumnRef):
                key = lowerer._column(arg.name, arg.table)
                col = table.columns[key]
                shift = getattr(col, "_var_shift", None)
                if shift is None:
                    head = col.data[:4096]
                    shift = (float(head.astype(np.float64).mean())
                             if len(head) else 0.0)
                    col._var_shift = shift
            ddof, sq = _VAR_FAMILY[name]
            return ("var", (fn, ddof, sq, np.float32(shift)))
        if name in ("count_if", "countif"):
            # sum of the boolean mask — exact in f32 below 2^24 rows
            return ("cif", lowerer.lower(arg))
        if name in ("bool_and", "bool_or"):
            return ("band" if name == "bool_and" else "bor",
                    lowerer.lower(arg))
        if name == "product":
            # sign-count + compensated log2-sum decomposition; FLOAT
            # columns only (an integer product user expects bit-exact
            # 24.0, which the log path renders as 23.999998 — host path)
            if not _float_only(arg):
                return None
            return ("prod", lowerer.lower(arg))
        if name in ("arg_min", "arg_max", "min_by", "max_by"):
            # value of args[0] at the extreme of args[1]: the device finds
            # the winning ROW ID (f32-sortable value key + row-id
            # tiebreak), the host gathers the arg — so the returned column
            # may be ANY type incl. strings
            if len(node.args) != 2 or not isinstance(node.args[0],
                                                    A.ColumnRef):
                return None
            if not _f32_safe(node.args[1]):
                return None
            ref = node.args[0]
            acol = None
            for k, c in table.columns.items():
                if k.split(".")[-1].lower() == ref.name.lower():
                    acol = c
                    break
            if acol is None:
                return None
            is_min = name in ("arg_min", "min_by")
            return ("argmn" if is_min else "argmx",
                    (lowerer.lower(node.args[1]), acol))
        if name == "approx_count_distinct":
            # device HLL with the host's exact splitmix64 hash emulated in
            # 32-bit limbs — estimates agree bit-exactly with the host
            if not isinstance(arg, A.ColumnRef):
                return None
            key = lowerer._column(arg.name, arg.table)
            col = table.columns[key]
            if col.validity is not None:
                return None
            d = col.data
            if d.dtype.kind in "iu" and d.size:
                rng = getattr(col, "_int_range", None)
                if rng is None:
                    rng = (int(d.min()), int(d.max()))
                    col._int_range = rng
                if rng[0] < -(1 << 31) or rng[1] >= (1 << 31):
                    return None
            elif d.dtype.kind == "f":
                if d.dtype.itemsize > 4 and d.size:
                    # x64-disabled upload downcasts f64→f32 and the device
                    # hash would collide distinct doubles (round-4 audit:
                    # ~120x HLL undercount). Only take the device route
                    # when every value is f32-exact; cache like _int_range.
                    exact = getattr(col, "_f32_exact", None)
                    if exact is None:
                        exact = bool(
                            np.all(d.astype(np.float32).astype(np.float64)
                                   == d))
                        col._f32_exact = exact
                    if not exact:
                        return None
            else:
                return None
            return ("hll", (key, str(d.dtype)))
        if name in ("sum", "min", "max") and _contains_int_window(arg):
            return None  # host keeps the BIGINT typing of ranking windows
        # exact int64: sum/avg/min/max over a plain no-NULL integer column
        if name in ("sum", "avg", "mean", "min", "max") and isinstance(
                arg, A.ColumnRef):
            key = lowerer._column(arg.name, arg.table)
            col = table.columns[key]
            if col.validity is None and (
                    col.sql_type.is_integer or col.data.dtype.kind in "iu"):
                if name in ("sum", "avg", "mean") and n > MAX_LIMB_ROWS:
                    return None  # 8-bit-limb int32 exactness bound
                int_cols.add(key)
                return ({"sum": "isum", "avg": "iavg", "mean": "iavg",
                         "min": "imin", "max": "imax"}[name], key)
        if name != "count" and not _float_only(arg):
            return None
        return (name, lowerer.lower(arg))

    try:
        where_fn = lowerer.lower(sel.where) if sel.where is not None else None
        key_fns = [lowerer.lower(g) for g in sel.group_by]
        if key_fns and not _group_keys_int32_safe(lowerer, sel.group_by):
            return None
        agg_plans = []
        for kind, node in items_plan:
            if kind == "key":
                agg_plans.append(("key", node))  # node = group_by index
                continue
            plan = _plan_one_agg(node)
            if plan is None:
                return None
            agg_plans.append(plan)
        # hidden device outputs for HAVING aggregates
        having_plan = []
        for node in having_aggs:
            plan = _plan_one_agg(node)
            if plan is None:
                return None
            agg_plans.append(plan)
            having_plan.append((node, len(agg_plans) - 1))
    except _Unsupported:
        return None

    if analyze_only:
        return True
    _phases["plan_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    _t0 = _time.perf_counter()
    # --- device value probes (cached): one cheap jitted max per expression,
    # used for the adaptive group-key radices and DISTINCT value domains
    # (the column uploads below double as the execution uploads — cached on
    # the Column objects — so probe time includes first-touch upload)
    block = get_table_block(conn, table)
    probe_cols = {}
    for k, c in lowerer.used_columns.items():
        probe_cols[k] = device_column_array(c, key=k, block=block, n=n)
    kmax_cache = getattr(conn, "_device_plan_kmax_cache", None)
    if kmax_cache is None:
        kmax_cache = {}
        conn._device_plan_kmax_cache = kmax_cache
    kmax_fn = getattr(conn, "_device_plan_kmax", None)
    if kmax_fn is None:
        kmax_fn = jax.jit(
            lambda a: jnp.max(jnp.maximum(a.astype(jnp.int32), 0))
        )
        conn._device_plan_kmax = kmax_fn

    def _probe_max(tag, fn):
        """max(fn(cols), 0) on device, cached per (tag, column buffers)."""
        probe_key = (tag,
                     tuple(sorted((k, id(v)) for k, v in probe_cols.items())))
        got = kmax_cache.get(probe_key)
        if got is None:
            got = int(kmax_fn(jnp.asarray(fn(probe_cols))))
            if len(kmax_cache) >= 64:
                kmax_cache.pop(next(iter(kmax_cache)))
            kmax_cache[probe_key] = got
        return got

    n_groups = 1
    strides = []
    if key_fns:
        # Adaptive segment count: scatters cost per-row work per segment
        # table, so size it to the actual combined key domain (one cheap
        # device max per key, bucketed to a power of two and cached in the
        # plan key). Multi-key GROUP BY packs the keys mixed-radix
        # (radix_i = kmax_i + 1); domains beyond MAX_GROUPS wrap and rely
        # on the collision guard.
        try:
            radices = []
            for gi, kf in enumerate(key_fns):
                kmax = _probe_max(repr(sel.group_by[gi]), kf)
                radices.append(max(kmax, 0) + 1)
            domain = 1
            for r in radices:
                domain = min(domain * r, 1 << 40)
            # mixed-radix strides, last key contiguous
            strides = [1] * len(radices)
            for i in range(len(radices) - 2, -1, -1):
                strides[i] = strides[i + 1] * radices[i + 1]
            n_groups = 8
            while n_groups < domain and n_groups < MAX_GROUPS:
                n_groups <<= 1
        except Exception:
            strides = [1] * len(key_fns)
            for i in range(len(key_fns) - 2, -1, -1):
                strides[i] = strides[i + 1] * MAX_GROUPS
            n_groups = MAX_GROUPS

    # --- DISTINCT value domains: probe max(expr), pick V = next pow2; the
    # presence matrix is [n_groups, V] so cap the product; negative or
    # fractional values are caught in-program by the invalid flag (guard ->
    # host fallback), oversized domains are rejected here
    from .int_agg import MAX_DISTINCT_SUM_DOMAIN, MAX_PRESENCE_ELEMS

    dist_domains: dict = {}
    for ai, (pname, fn) in enumerate(agg_plans):
        if pname == "hll" and n_groups * 2048 > (1 << 22):
            return None  # register-table bound
        if pname not in ("dcount", "dsum", "davg", "mode"):
            continue
        try:
            vmax = _probe_max((f"dist{ai}", repr(sel)), fn)
        except Exception:
            return None
        v_dom = 8
        while v_dom <= vmax:
            v_dom <<= 1
        if pname in ("dsum", "davg") and v_dom > MAX_DISTINCT_SUM_DOMAIN:
            return None  # limb-matmul exactness bound — host path
        mats = 2 if pname == "mode" else 1  # mode carries counts + first
        if n_groups * v_dom * mats > MAX_PRESENCE_ELEMS:
            return None
        dist_domains[ai] = v_dom

    _phases["probe_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    _t0 = _time.perf_counter()

    plan_key = (
        repr(sel),
        tuple(sorted((k, c.data.dtype.str, len(c))
                     for k, c in lowerer.used_columns.items())),
        tuple(sorted((name, id(m)) for name, m in lowerer.models.items())),
        n,
        n_groups,
        tuple(sorted(dist_domains.items())),
    )

    # --- mesh-partitioned execution (INFERA_MESH / Connection.set_mesh) ---
    # Lower the same plan through shard_map over the dp mesh: row-sharded
    # columns, local partial aggregation, bucket-pack + all_to_all exchange
    # of the partial group tables, owner-side merge (sql/mesh_plan.py).
    from .mesh_plan import execute_fused_on_mesh, get_mesh

    conn._mesh_plan_used = False
    mesh = get_mesh(conn)
    if mesh is not None and lowerer.has_window:
        mesh = None  # a row-sharded window sort would split partitions
    if mesh is not None:
        mesh_sharded = dict(lowerer.used_columns)
        for k in int_cols:
            locol, hicol = word_columns(table.columns[k])
            mesh_sharded[k + "#lo"] = locol
            mesh_sharded[k + "#hi"] = hicol
        mesh_out = execute_fused_on_mesh(
            conn, mesh, n=n, plan_key=plan_key,
            sharded_columns=mesh_sharded, replicated_arrays={},
            prologue=None, where_fn=where_fn, key_fns=key_fns,
            strides=strides, n_groups=n_groups, agg_plans=agg_plans,
            dist_domains=dist_domains)
        _phases["mesh_exec_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
        conn._last_phases = _phases
        if mesh_out is not None:
            out_table = _assemble_result(sel, items_plan, agg_plans,
                                         having_plan, *mesh_out,
                                         has_keys=bool(key_fns))
            if out_table is not None:
                conn._mesh_plan_used = True
                return out_table
            return None  # a guard tripped — host path, not single-device
        # mesh execution unavailable/failed → single-device fused path

    # --- Pallas columnar kernel (device_plan_pallas): the flagship query
    # class (predict + filter + group aggregate) runs ~30x faster through
    # ops/pallas_sql.py than through the XLA program below (BENCH_r03:
    # 0.651 ms kernel vs 19.5 ms XLA @1M rows). Ineligible plans and any
    # kernel failure fall through to the XLA program unchanged.
    conn._pallas_plan_used = False
    if mesh is None:
        pallas_out = _try_pallas_fused(conn, sel, table, n, n_groups,
                                       strides, agg_plans, items_plan,
                                       having_aggs, plan_key,
                                       dist_domains=dist_domains)
        if pallas_out is not None:
            _phases["pallas_exec_ms"] = round(
                (_time.perf_counter() - _t0) * 1e3, 3)
            out_table = _assemble_result(sel, items_plan, agg_plans,
                                         having_plan, *pallas_out,
                                         has_keys=bool(key_fns))
            if out_table is not None:
                conn._pallas_plan_used = True
                conn._last_phases = _phases
                return out_table
            return None  # collision/frac guard — the XLA program buckets
            # identically and would trip the same guard → host path

    def program(cols):
        mask = None
        if where_fn is not None:
            mask = jnp.asarray(where_fn(cols), bool)
        raws = []
        if key_fns:
            for kf in key_fns:
                raws.append(jnp.asarray(kf(cols)))
            combined = jnp.zeros(n, jnp.int32)
            for r, stride in zip(raws, strides):
                # int32 wrap on oversized domains is caught by the guard
                combined = combined + jnp.asarray(r, jnp.int32) * np.int32(stride & 0x7FFFFFFF)
            keys = jnp.asarray(jnp.mod(combined, n_groups), jnp.int32)
        else:
            keys = jnp.zeros(n, jnp.int32)
        w = jnp.ones(n, jnp.float32) if mask is None else mask.astype(jnp.float32)
        # GEMM group-by (ops/gemm_groupby.py): for small group counts every
        # segment reduction below runs as one-hot matmul / masked chunk
        # reductions instead of scatters — the scatter tail was ~9 passes x
        # ~8 ms on the 1M-row fused query (the single biggest cost)
        from ..ops import gemm_groupby as GG

        use_gemm = GG.eligible(n, n_groups)

        def segsum(v):
            if use_gemm:
                return GG.segment_sum(jnp, jax, v, keys, n_groups)
            if isinstance(v, (list, tuple)):
                return [jax.ops.segment_sum(x, keys, num_segments=n_groups)
                        for x in v]
            return jax.ops.segment_sum(v, keys, num_segments=n_groups)

        w_sum_cache = []

        def w_sum():
            if not w_sum_cache:
                w_sum_cache.append(segsum(w))
            return w_sum_cache[0]

        # Batched GEMM pre-pass: ALL sum-shaped reductions (the w/count
        # row, every compensated-sum residual, every var pair) share ONE
        # one-hot chunk scan, and all plain min/max slots share one masked
        # reduction — the one-hot traffic (n·G f32 per pass) is the
        # fused-plan tail cost, so pass count is the lever (7 passes → 2
        # on the benchmark query shape).
        batch_specs: dict = {}
        mm_specs: dict = {}
        if use_gemm:
            from .mesh_plan import _compensated_shift

            batch_rows = [w]
            mm_vals = []
            for ai, (name_, fn_) in enumerate(agg_plans):
                if name_ in ("sum", "avg", "mean"):
                    vals_f = jnp.asarray(fn_(cols), jnp.float32)
                    shift = _compensated_shift(jnp, jax, vals_f, w, keys,
                                               n_groups)
                    batch_rows.append((vals_f - shift[keys]) * w)
                    batch_specs[ai] = ("sum", len(batch_rows) - 1, shift)
                elif name_ == "var":
                    vfn_, _dd, _sq, sh_ = fn_
                    v_ = jnp.asarray(vfn_(cols), jnp.float32) - sh_
                    batch_rows.append(v_ * w)
                    batch_rows.append(v_ * v_ * w)
                    batch_specs[ai] = ("var", len(batch_rows) - 2, None)
                elif name_ in ("min", "max"):
                    mm_vals.append(jnp.asarray(fn_(cols), jnp.float32))
                    mm_specs[ai] = len(mm_vals) - 1
            batch_res = GG.segment_sum(jnp, jax, batch_rows, keys,
                                       n_groups)
            w_sum_cache.append(batch_res[0])
            if mm_vals:
                mm_mns, mm_mxs = GG.segment_minmax(
                    jnp, jax, mm_vals, keys, n_groups,
                    [w > 0] * len(mm_vals))

        outs = []
        key_mins, key_maxs, frac_flags = [], [], []
        big = jnp.int32(2**31 - 1)
        for r in raws:
            # collision guard, per key: a modulo bucket holding two distinct
            # raw values is detected host-side (min != max) → host fallback.
            # Fractional keys (f32 value off its int32 cast) also fall back:
            # the int bucketing would merge 1.2 and 1.5.
            ri = jnp.asarray(r, jnp.int32)
            rf = jnp.asarray(r, jnp.float32)
            if use_gemm:
                kmn, kmx = GG.segment_minmax_int32(
                    jnp, jax, ri, keys, n_groups, w > 0)
                key_mins.append(kmn)
                key_maxs.append(kmx)
            else:
                key_mins.append(jax.ops.segment_min(
                    jnp.where(w > 0, ri, big), keys, num_segments=n_groups))
                key_maxs.append(jax.ops.segment_max(
                    jnp.where(w > 0, ri, -big - 1), keys,
                    num_segments=n_groups))
            frac_flags.append(jnp.any((w > 0) & (rf != ri.astype(jnp.float32))))
        from .int_agg import (device_lex_minmax, device_limb_sums,
                              device_presence, presence_reduce)

        mask_b = w > 0
        for ai, (name, fn) in enumerate(agg_plans):
            if name == "key":
                outs.append(("key", key_maxs[fn]))
                continue
            if name == "count_star":
                outs.append(("v", w_sum()))
                continue
            if name in ("isum", "iavg"):
                lo, hi = cols[fn + "#lo"], cols[fn + "#hi"]
                limbs, est = device_limb_sums(
                    jnp, jax, lo, hi, mask_b.astype(jnp.int32), keys,
                    n_groups, gg=GG if use_gemm else None)
                outs.append(("v", (limbs, est)))
                continue
            if name in ("imin", "imax"):
                lo, hi = cols[fn + "#lo"], cols[fn + "#hi"]
                sel_hi, sel_lo = device_lex_minmax(
                    jnp, jax, lo, hi, mask_b, keys, n_groups,
                    name == "imin", gg=GG if use_gemm else None)
                outs.append(("v", (sel_hi, sel_lo)))
                continue
            if name == "var":
                if ai in batch_specs:
                    _, ridx, _sh = batch_specs[ai]
                    outs.append(("v", (batch_res[ridx],
                                       batch_res[ridx + 1])))
                    continue
                vfn, _ddof, _sq, shift = fn
                v = jnp.asarray(vfn(cols), jnp.float32) - shift
                s, s2 = segsum([v * w, v * v * w])
                outs.append(("v", (s, s2)))
                continue
            if name == "median":
                # ONE device sort of (group, value), then per-group middle
                # gathers; DuckDB-style even-count averaging happens in the
                # finalize ((lo+hi)/2 — for odd counts lo == hi)
                vals = jnp.asarray(fn(cols), jnp.float32)
                sort_keys = jnp.where(mask_b, keys, jnp.int32(n_groups))
                order = jnp.lexsort((vals, sort_keys))
                svals = vals[order]
                cnt_i = jax.ops.segment_sum(mask_b.astype(jnp.int32), keys,
                                            num_segments=n_groups)
                start = jnp.cumsum(cnt_i) - cnt_i
                lo_idx = start + jnp.maximum((cnt_i - 1) // 2, 0)
                hi_idx = start + jnp.maximum(cnt_i // 2, 0)
                outs.append(("v", (svals[jnp.clip(lo_idx, 0, n - 1)],
                                   svals[jnp.clip(hi_idx, 0, n - 1)])))
                continue
            if name == "quantile":
                # same one-sort machinery as median, rank from the static
                # fraction; cont → (floor, ceil, frac) interpolation in
                # the finalize, disc → the ceil(q*n)-1 element exactly
                vfn, q, cont = fn
                vals = jnp.asarray(vfn(cols), jnp.float32)
                sort_keys = jnp.where(mask_b, keys, jnp.int32(n_groups))
                order = jnp.lexsort((vals, sort_keys))
                svals = vals[order]
                cnt_i = jax.ops.segment_sum(mask_b.astype(jnp.int32), keys,
                                            num_segments=n_groups)
                start = jnp.cumsum(cnt_i) - cnt_i
                if cont:
                    pos = q * (cnt_i.astype(jnp.float32) - 1.0)
                    lo_r = jnp.floor(pos).astype(jnp.int32)
                    hi_r = jnp.minimum(lo_r + 1, cnt_i - 1)
                    frac = pos - lo_r.astype(jnp.float32)
                    lo_i = jnp.clip(start + jnp.maximum(lo_r, 0), 0, n - 1)
                    hi_i = jnp.clip(start + jnp.maximum(hi_r, 0), 0, n - 1)
                    outs.append(("v", (svals[lo_i], svals[hi_i], frac)))
                else:
                    r = jnp.maximum(jnp.ceil(
                        q * cnt_i.astype(jnp.float32)).astype(jnp.int32)
                        - 1, 0)
                    idx = jnp.clip(start + r, 0, n - 1)
                    outs.append(("v", (svals[idx],)))
                continue
            if name == "cif":
                v = jnp.asarray(fn(cols), bool).astype(jnp.float32)
                outs.append(("v", segsum(v * w)))
                continue
            if name in ("band", "bor"):
                v = jnp.asarray(fn(cols), bool).astype(jnp.float32)
                if name == "band":
                    outs.append(("v", jax.ops.segment_min(
                        jnp.where(mask_b, v, 1.0), keys,
                        num_segments=n_groups)))
                else:
                    outs.append(("v", jax.ops.segment_max(
                        jnp.where(mask_b, v, 0.0), keys,
                        num_segments=n_groups)))
                continue
            if name == "prod":
                # sign count + zero count + compensated log2-sum (VERDICT
                # r3 item 5): the finalize recombines sign * 2^sum in f64
                vals = jnp.asarray(fn(cols), jnp.float32)
                negs = segsum((mask_b & (vals < 0)).astype(jnp.float32))
                zeros_ = segsum((mask_b & (vals == 0)).astype(jnp.float32))
                lv = jnp.where(vals != 0, jnp.log2(jnp.abs(
                    jnp.where(vals == 0, jnp.float32(1.0), vals))), 0.0)
                from .mesh_plan import _compensated_segment_sum

                ls, lc = _compensated_segment_sum(
                    jax, jnp, lv, w, keys, n_groups, w_sum(),
                    segsum=segsum if use_gemm else None)
                outs.append(("v", (negs, zeros_, ls, lc)))
                continue
            if name in ("argmn", "argmx"):
                # winner ROW ID: f32-sortable int32 value key, min/max per
                # group, then the smallest row id attaining it (host
                # first-occurrence tie-break); the host gathers the arg
                vfn, _acol = fn
                v = jnp.asarray(vfn(cols), jnp.float32)
                b = jax.lax.bitcast_convert_type(v, jnp.int32)
                skey = jnp.where(b >= 0, b,
                                 (~b) ^ jnp.int32(-2147483648))
                big_ = jnp.int32(2**31 - 1)
                if name == "argmn":
                    kext = jax.ops.segment_min(
                        jnp.where(mask_b, skey, big_), keys,
                        num_segments=n_groups)
                else:
                    kext = jax.ops.segment_max(
                        jnp.where(mask_b, skey, -big_ - 1), keys,
                        num_segments=n_groups)
                at = mask_b & (skey == kext[keys])
                rid = jax.ops.segment_min(
                    jnp.where(at, jnp.arange(n, dtype=jnp.int32), big_),
                    keys, num_segments=n_groups)
                outs.append(("v", (rid,)))
                continue
            if name == "hll":
                # HyperLogLog with the host's splitmix64 emulated in 32-bit
                # limbs: register max per (group, bucket), then the
                # register-value histogram — the host estimate is a pure
                # function of the histogram (ops/aggregate._hll_estimate)
                from ..ops.hashing import (splitmix64_device,
                                           value_bits64_device)

                ckey, dt = fn
                hi_, lo_ = value_bits64_device(jnp, jax, cols[ckey], dt)
                hh, ll = splitmix64_device(jnp, hi_, lo_)
                bucket = jax.lax.bitcast_convert_type(
                    ll & jnp.uint32(2047), jnp.int32)
                r_hi = hh >> jnp.uint32(11)
                r_lo = (ll >> jnp.uint32(11)) | (hh << jnp.uint32(21))
                clz_hi = jax.lax.clz(
                    jax.lax.bitcast_convert_type(r_hi, jnp.int32))
                clz_lo = jax.lax.clz(
                    jax.lax.bitcast_convert_type(r_lo, jnp.int32))
                clz64 = jnp.where(r_hi != 0, clz_hi,
                                  jnp.int32(32) + clz_lo)
                nonzero = (r_hi != 0) | (r_lo != 0)
                rho = jnp.where(nonzero, jnp.int32(64) - clz64, 0)
                rho = jnp.int32(54) - rho  # 54 - bitlen; zero rest -> 54
                segk = keys * jnp.int32(2048) + bucket
                regs = jnp.maximum(jax.ops.segment_max(
                    jnp.where(mask_b, rho, 0), segk,
                    num_segments=n_groups * 2048), 0)
                hk = ((jnp.arange(n_groups * 2048, dtype=jnp.int32)
                       // 2048) * jnp.int32(55) + regs)
                hist = jax.ops.segment_sum(
                    jnp.ones(n_groups * 2048, jnp.float32), hk,
                    num_segments=n_groups * 55)
                outs.append(("v", hist.reshape(n_groups, 55)))
                continue
            if name == "mode":
                from .int_agg import device_mode

                vals = jnp.asarray(fn(cols), jnp.float32)
                row_idx = jnp.arange(n, dtype=jnp.float32)
                mode_v, mcount, bad = device_mode(
                    jnp, jax, vals, mask_b, keys, n_groups,
                    dist_domains[ai], row_idx,
                    gg=GG if use_gemm else None)
                outs.append(("v", (mode_v, mcount, bad)))
                continue
            if name in ("dcount", "dsum", "davg"):
                vals = jnp.asarray(fn(cols), jnp.float32)
                pres, bad = device_presence(
                    jnp, vals, mask_b, keys, n_groups, dist_domains[ai],
                    gg=GG if use_gemm else None, jax=jax)
                dcount, dlo, dhi = presence_reduce(jnp, pres, dist_domains[ai])
                if name == "dcount":
                    outs.append(("v", (dcount, bad)))
                else:
                    outs.append(("v", (dcount, dlo, dhi, bad)))
                continue
            vals = jnp.asarray(fn(cols), jnp.float32)
            if name == "count":
                outs.append(("v", w_sum()))
            elif name in ("sum", "avg", "mean"):
                # compensated (sum, comp) pair + f64 host fold — matches the
                # reference host's DOUBLE accumulators (DuckDB sums FLOAT in
                # double) instead of drifting with plain f32 segment sums
                if ai in batch_specs:
                    from .mesh_plan import (_compensated_finish,
                                            _opaque_pin)

                    _, ridx, shift = batch_specs[ai]
                    pin = _opaque_pin(jnp, w_sum() >= 0.0)
                    outs.append(("v", _compensated_finish(
                        jnp, shift, batch_res[ridx], w_sum(), pin)))
                else:
                    from .mesh_plan import _compensated_segment_sum

                    s_pair = _compensated_segment_sum(
                        jax, jnp, vals, w, keys, n_groups, w_sum(),
                        segsum=segsum if use_gemm else None)
                    outs.append(("v", s_pair))
            elif name == "min":
                if ai in mm_specs:
                    outs.append(("v", mm_mns[mm_specs[ai]]))
                elif use_gemm:
                    (mn,), _ = GG.segment_minmax(
                        jnp, jax, [vals], keys, n_groups, [w > 0])
                    outs.append(("v", mn))
                else:
                    masked = jnp.where(w > 0, vals, jnp.inf)
                    outs.append(("v", jax.ops.segment_min(
                        masked, keys, num_segments=n_groups)))
            elif name == "max":
                if ai in mm_specs:
                    outs.append(("v", mm_mxs[mm_specs[ai]]))
                elif use_gemm:
                    _, (mx,) = GG.segment_minmax(
                        jnp, jax, [vals], keys, n_groups, [w > 0])
                    outs.append(("v", mx))
                else:
                    masked = jnp.where(w > 0, vals, -jnp.inf)
                    outs.append(("v", jax.ops.segment_max(
                        masked, keys, num_segments=n_groups)))
        group_count = w_sum()
        return [o for _, o in outs], group_count, key_mins, key_maxs, frac_flags

    # --- caching ---------------------------------------------------------
    # jit caches by function identity; `program` is a fresh closure per
    # call, so an explicit plan cache keyed by (AST, column layout, model
    # identities) avoids a retrace+compile per execution. Device arrays are
    # cached on the Column objects (immutable data → upload once).
    cache = getattr(conn, "_device_plan_cache", None)
    if cache is None:
        cache = {}
        conn._device_plan_cache = cache
    compiled = cache.get(plan_key)
    _phases["compiled"] = compiled is None  # trace+compile lands in exec
    if compiled is None:
        compiled = jax.jit(program)
        if len(cache) >= 16:
            cache.pop(next(iter(cache)))
        cache[plan_key] = compiled

    device_cols = dict(probe_cols)
    for k in int_cols:
        for suffix, wc in zip(("#lo", "#hi"), word_columns(table.columns[k])):
            dev = getattr(wc, "_device_array", None)
            if dev is None:
                dev = jnp.asarray(wc.data)
                wc._device_array = dev
            device_cols[k + suffix] = dev
    _phases["upload_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    _t0 = _time.perf_counter()
    try:
        out = compiled(device_cols)
        # ONE batched device→host transfer: per-array np.asarray costs a
        # round-trip each (~30ms over the tunneled platform — dominated the
        # 1M-row query before this). Structured aggregates (isum limbs, var
        # partials, distinct reductions) come back as tuples — keep them.
        results, group_count, key_mins, key_maxs, frac_flags = jax.device_get(out)
        group_count = np.asarray(group_count)
    except _Unsupported:
        return None
    except Exception:
        return None  # any trace/compile issue → host path
    _phases["exec_readback_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    conn._last_phases = _phases

    return _assemble_result(sel, items_plan, agg_plans, having_plan,
                            results, group_count, key_mins, key_maxs,
                            frac_flags, has_keys=bool(key_fns))
