"""Fused device execution of dimension-lookup joins (BASELINE config 3).

Query shape: a large fact table INNER-joined to a small dimension table on
a unique non-negative integer key, with aggregates (and optional GROUP BY)
over columns from either side — e.g. "multi-output predict joined back to
the source table" (BASELINE.md config 3). The whole query lowers to ONE XLA
program: the dim key column becomes a dense device lookup array
(key → dim row, −1 miss), each fact row gathers its dim row index, the
INNER-join filter is just `ridx >= 0`, referenced dim columns gather once
through `ridx`, and the aggregate tail is identical to
device_plan.try_execute_on_device. No host-side join materialization — the
joined relation never exists.

Anything outside the supported shape returns None and the host join path
runs instead (semantics never regress).
"""

from __future__ import annotations

import numpy as np

from ..columnar import Column, Table
from . import ast as A
from .device_plan import (
    _AGG_NAMES,
    MAX_GROUPS,
    MIN_DEVICE_ROWS,
    _assemble_result,
    _find_aggs,
    _group_keys_int32_safe,
    _Lowerer,
    _PallasLowerer,
    _Unsupported,
)

DIM_MAX_ROWS = 1 << 20
DIM_MAX_KEY = 1 << 22


class _TwoSidedColumns:
    """Fact/dim column resolution shared by the XLA and Pallas join
    lowerers: fact columns resolve through the base lowerer (next in the
    MRO), dim columns become "__dim__.<key>" entries the join prologue
    fills with `dim_col[ridx]` gathers."""

    def _init_two_sided(self, dim: Table, fact_names: set, dim_names: set):
        self.dim = dim
        self.fact_names = {s.lower() for s in fact_names if s}
        self.dim_names = {s.lower() for s in dim_names if s}
        self.dim_used: dict = {}

    def _dim_lookup(self, name: str):
        for k in self.dim.columns:
            if k.split(".")[-1].lower() == name.lower():
                return k
        return None

    def _fact_lookup(self, name: str):
        for k in self.table.columns:
            if k.split(".")[-1].lower() == name.lower():
                return k
        return None

    def _column(self, name: str, qualifier):
        q = qualifier.lower() if qualifier else None
        in_fact = self._fact_lookup(name) if (q is None or q in self.fact_names) else None
        in_dim = self._dim_lookup(name) if (q is None or q in self.dim_names) else None
        if in_fact is not None and in_dim is not None:
            raise _Unsupported(f"ambiguous column {name}")
        if in_fact is not None:
            return super()._column(name, None)
        if in_dim is None:
            raise _Unsupported(f"unknown column {name}")
        col = self.dim.columns[in_dim]
        if not col.sql_type.is_numeric or col.validity is not None:
            raise _Unsupported(f"column {name} not device-eligible")
        key = "__dim__." + in_dim
        self.dim_used[key] = col
        return key


class _JoinLowerer(_TwoSidedColumns, _Lowerer):
    """XLA join lowering with the outer-join NULL-validity lattice."""

    def __init__(self, fact: Table, fact_names: set, dim: Table, dim_names: set):
        _Lowerer.__init__(self, fact)
        self._init_two_sided(dim, fact_names, dim_names)

    def col_for_key(self, key: str) -> Column:
        if key in self.dim_used:
            return self.dim_used[key]
        return self.table.columns[key]

    # --- outer-join NULL tracking (static two-point lattice) -------------
    # Under a LEFT/RIGHT join, dim-side columns are NULL on unmatched
    # rows. Every device expression's validity is statically either "all"
    # (never NULL) or "matched" (NULL exactly where the row is unmatched)
    # — coalesce(dim_expr, all_expr) launders back to "all". Aggregates
    # mask their input rows by the expression's validity; anything the
    # lattice can't express falls back to the host join path.

    def validity(self, expr) -> str:
        if isinstance(expr, A.ColumnRef):
            key = self._column(expr.name, expr.table)
            return "matched" if key.startswith("__dim__.") else "all"
        if isinstance(expr, A.FuncCall):
            name = expr.name.lower()
            args = [a for a in expr.args if isinstance(a, A.Expr)]
            if name == "coalesce" and len(args) == 2:
                return self.validity(args[1])
            vs = [self.validity(a) for a in args]
            return "matched" if "matched" in vs else "all"
        out = "all"
        for attr in ("operand", "left", "right", "low", "high"):
            child = getattr(expr, attr, None)
            if isinstance(child, A.Expr) and self.validity(child) == "matched":
                out = "matched"
        return out

    def lower(self, expr):
        import jax.numpy as jnp

        if (isinstance(expr, A.FuncCall) and expr.name.lower() == "coalesce"
                and len(expr.args) == 2):
            a0, a1 = expr.args
            v0 = self.validity(a0)
            f0 = self.lower(a0)
            f1 = self.lower(a1)
            if v0 == "all":
                return f0  # never NULL → first argument wins everywhere
            # dim-valued first arg: unmatched rows take the fallback; the
            # program publishes the match mask as cols["__matched__"]
            return lambda cols: jnp.where(
                cols["__matched__"],
                jnp.asarray(f0(cols), jnp.float32),
                jnp.asarray(f1(cols), jnp.float32))
        return super().lower(expr)


class _PallasJoinLowerer(_TwoSidedColumns, _PallasLowerer):
    """Pallas join lowering: fact columns become in-kernel rows (with the
    in-kernel MXU predict), dim columns become "__dim__.<key>" rows the
    composed jit's gather prologue fills before the kernel runs."""

    def __init__(self, fact: Table, fact_names: set, dim: Table,
                 dim_names: set):
        _PallasLowerer.__init__(self, fact)
        self._init_two_sided(dim, fact_names, dim_names)


def _try_pallas_join(conn, sel, fact, fnames, dim, dnames, fkey_ref,
                     lookup, kmax_dim, n, n_groups, strides, agg_plans,
                     items_plan, plan_key, outer=False, agg_validity=None):
    """Fact→dim joins through the columnar Pallas kernel: the join gather
    runs as an XLA prologue in the SAME jit, and the aggregate tail is the
    kernel's lane accumulators. INNER folds matched into the WHERE mask;
    LEFT/RIGHT/FULL (round 5, VERDICT r4 item 3a) preserve unmatched rows
    and route every matched-validity aggregate through summands masked by
    the ``__matched__`` block row, with a shared matched-count slot
    carrying the per-group non-NULL count the finalize divides by.
    Returns the _assemble_result 5-tuple or None (XLA program fallback)."""
    from ..ops import pallas_sql as PS

    mode = PS.pallas_sql_mode()
    if mode == "0":
        return None
    import jax

    interpret = jax.default_backend() in ("cpu", "gpu")
    if interpret and mode != "1":
        return None
    if not (1 <= n_groups <= PS.PALLAS_MAX_GROUPS) or n < MIN_DEVICE_ROWS:
        return None
    ok_names = {"key", "count_star", "count", "count_matched", "sum",
                "avg", "mean", "min", "max"}
    if any(p[0] not in ok_names for p in agg_plans):
        return None
    validity = agg_validity or ["all"] * len(agg_plans)
    low = _PallasJoinLowerer(fact, fnames, dim, dnames)
    import jax.numpy as jnp

    def cols_bool(v):
        return jnp.asarray(v, bool)

    def matched_row(cols):
        return cols["__matched__"]

    try:
        fact_key = low._column(fkey_ref.name, fkey_ref.table)
        if fact_key.startswith("__dim__."):
            raise _Unsupported("join key resolved to the dim side")
        base_where = (low.lower(sel.where) if sel.where is not None
                      else None)
        key_fns = [low.lower(g) for g in sel.group_by]
        sum_fns: list = []
        min_fns: list = []
        max_fns: list = []
        slot_map: list = []
        wm_slot = [None]  # shared matched-count sum slot (lazy)

        def wm_idx():
            if wm_slot[0] is None:
                sum_fns.append(matched_row)
                wm_slot[0] = len(sum_fns) - 1
            return wm_slot[0]

        nodes = [node for _k, node in items_plan]
        for (pname, payload), node, val in zip(agg_plans, nodes, validity):
            if pname == "key":
                slot_map.append(("key", payload, None))
                continue
            if pname in ("count", "count_star"):
                slot_map.append(("count", None, None))
                continue
            if pname == "count_matched":
                slot_map.append(("count_matched", wm_idx(), None))
                continue
            arg_fn = low.lower(node.args[0])
            m = val == "matched"
            if pname in ("sum", "avg", "mean"):
                if m:
                    # select, not multiply: unmatched rows gather dim row
                    # 0 garbage and NaN*0 = NaN would poison the group
                    # (round-5 review fix)
                    sum_fns.append(lambda cols, f=arg_fn: jnp.where(
                        cols_bool(matched_row(cols)), f(cols),
                        jnp.float32(0.0)))
                    slot_map.append((pname, len(sum_fns) - 1, wm_idx()))
                else:
                    sum_fns.append(arg_fn)
                    slot_map.append((pname, len(sum_fns) - 1, None))
            elif pname == "min":
                if m:
                    # unmatched rows gather dim row 0 garbage: mask to the
                    # kernel's +BIG fill so they never win the reduction
                    min_fns.append(lambda cols, f=arg_fn: jnp.where(
                        cols_bool(matched_row(cols)), f(cols),
                        jnp.float32(PS._BIG)))
                    slot_map.append(("min", len(min_fns) - 1, wm_idx()))
                else:
                    min_fns.append(arg_fn)
                    slot_map.append(("min", len(min_fns) - 1, None))
            else:
                if m:
                    max_fns.append(lambda cols, f=arg_fn: jnp.where(
                        cols_bool(matched_row(cols)), f(cols),
                        jnp.float32(-PS._BIG)))
                    slot_map.append(("max", len(max_fns) - 1, wm_idx()))
                else:
                    max_fns.append(arg_fn)
                    slot_map.append(("max", len(max_fns) - 1, None))
    except _Unsupported:
        return None
    if sum(w.nbytes for w in low.weight_arrays) > PS.PALLAS_MAX_WEIGHT_BYTES:
        return None
    for c in list(low.used_columns.values()) + list(low.dim_used.values()):
        d = c.data
        if d.dtype.kind in "iu" and d.size:
            rng = getattr(c, "_int_range", None)
            if rng is None:
                rng = (int(d.min()), int(d.max()))
                c._int_range = rng
            if rng[0] < -(1 << 24) or rng[1] > (1 << 24):
                return None
    col_keys = (sorted(low.used_columns) + sorted(low.dim_used)
                + ["__matched__"])
    if len(col_keys) > PS.PALLAS_MAX_COLS:
        return None

    if outer:
        # LEFT/RIGHT/FULL preserve unmatched rows — only the user WHERE
        # masks; matched-validity slots masked their inputs above
        where_fn = (None if base_where is None
                    else lambda cols: cols_bool(base_where(cols)))
    else:
        def where_fn(cols, base=base_where):
            m = cols["__matched__"] > 0.0
            if base is not None:
                return m & cols_bool(base(cols))
            return m

    from .device_plan import get_table_block

    res = PS.execute_fused_join_plan(
        conn, plan_key=plan_key, col_keys=col_keys,
        fact_cols=low.used_columns, dim_cols=low.dim_used, lookup=lookup,
        fact_key_name=fact_key, kmax_dim=kmax_dim,
        weights=low.weight_arrays, where_fn=where_fn, key_fns=key_fns,
        strides=strides, n_groups=n_groups, sum_fns=sum_fns,
        min_fns=min_fns, max_fns=max_fns, n=n, interpret=interpret,
        fact_block=get_table_block(conn, fact))
    if res is None:
        return None

    def fold64(i):
        s, c = res["sums"][i]
        return np.asarray(s, np.float64) + np.asarray(c, np.float64)

    results: list = []
    for spec, si, wmi in slot_map:
        if spec == "key":
            results.append(np.asarray(res["kmaxs"][si]))
        elif spec == "count":
            results.append(res["count"])
        elif spec == "count_matched":
            results.append(fold64(si))
        elif spec in ("sum", "avg", "mean"):
            if wmi is None:
                results.append(res["sums"][si])
            else:
                s, c = res["sums"][si]
                results.append((s, c, fold64(wmi)))
        elif spec == "min":
            v = np.asarray(res["mins"][si])
            results.append(v if wmi is None else (v, fold64(wmi)))
        else:
            v = np.asarray(res["maxs"][si])
            results.append(v if wmi is None else (v, fold64(wmi)))
    return (results, res["count"], res["kmins"], res["kmaxs"],
            res["fracs"])


def try_execute_join_on_device(conn, sel: A.Select, analyze_only: bool = False):
    """Compile + run a fused join-aggregate SELECT; Table or None."""
    import time as _time

    _phases: dict = {}
    _t0 = _time.perf_counter()
    j = sel.from_
    if (
        not isinstance(j, A.Join)
        or j.kind not in ("INNER", "LEFT", "RIGHT", "FULL")
        or not isinstance(j.left, A.BaseTable)
        or not isinstance(j.right, A.BaseTable)
        or sel.having is not None
        or sel.distinct
        or len(sel.group_by) > 4
    ):
        return None
    outer = j.kind != "INNER"
    full = j.kind == "FULL"
    # FULL fuses as: device LEFT pass + host-side phantom combine (dim rows
    # with no fact match, every fact column NULL). WHERE and GROUP BY are
    # evaluated over the (≤|dim|-row) phantom side host-side with real 3VL
    # and NULL keys — see _combine_full_phantom (round-4: VERDICT r3 weak
    # #3 closed; previously any WHERE/GROUP BY sent FULL to the host join).
    cond = j.on
    if j.using and len(j.using) == 1 and cond is None:
        cond = A.Binary("=", A.ColumnRef(j.using[0], j.left.alias or j.left.name),
                        A.ColumnRef(j.using[0], j.right.alias or j.right.name))
    if not (
        isinstance(cond, A.Binary)
        and cond.op == "="
        and isinstance(cond.left, A.ColumnRef)
        and isinstance(cond.right, A.ColumnRef)
    ):
        return None
    lt = conn.catalog.tables.get(j.left.name.lower())
    rt = conn.catalog.tables.get(j.right.name.lower())
    if lt is None or rt is None:
        return None  # missing table → host path raises the catalog error

    def names_of(ref):
        return {ref.name, ref.alias} if ref.alias else {ref.name}

    def key_col_of(table, refs_names, keyref):
        if keyref.table and keyref.table.lower() not in {s.lower() for s in refs_names}:
            return None
        for k in table.columns:
            if k.split(".")[-1].lower() == keyref.name.lower():
                return table.columns[k]
        return None

    # orient: which side is the dimension (unique small int keys)? For an
    # outer join the preserved side MUST be the fact side (LEFT preserves
    # the left table, RIGHT the right) — the other orientation would flip
    # which rows survive.
    combos = [
        (lt, names_of(j.left), cond.left, rt, names_of(j.right), cond.right),
        (rt, names_of(j.right), cond.right, lt, names_of(j.left), cond.left),
    ]
    if j.kind == "LEFT":
        combos = combos[:1]
    elif j.kind == "RIGHT":
        combos = combos[1:]
    plan = None
    for fact, fnames, fkey_ref, dim, dnames, dkey_ref in combos:
        if not (MIN_DEVICE_ROWS <= fact.num_rows < (1 << 24)):
            continue
        if dim.num_rows > DIM_MAX_ROWS or dim.num_rows == 0:
            continue
        dk = key_col_of(dim, dnames, dkey_ref)
        fk = key_col_of(fact, fnames, fkey_ref)
        if dk is None or fk is None:
            continue
        if dk.validity is not None or fk.validity is not None:
            continue
        if dk.data.dtype.kind not in "iu" or fk.data.dtype.kind not in "iu":
            continue
        # Fact keys are lowered to int32 on device (x64 disabled); values
        # outside int32 would alias mod 2^32 and spuriously match dim keys.
        # Dim keys are range-checked below; guard the fact side here too.
        if fk.data.size and (
            int(fk.data.min()) < -(1 << 31) or int(fk.data.max()) >= (1 << 31)
        ):
            continue
        dvals = np.asarray(dk.data, np.int64)
        if len(dvals) and (dvals.min() < 0 or dvals.max() >= DIM_MAX_KEY):
            continue
        if len(np.unique(dvals)) != len(dvals):
            continue  # duplicate dim keys would need row expansion
        plan = (fact, fnames, fkey_ref, dim, dnames, dvals)
        break
    if plan is None:
        return None
    fact, fnames, fkey_ref, dim, dnames, dvals = plan

    agg_nodes: list = []
    for item in sel.items:
        _find_aggs(item.expr, agg_nodes)
    if not agg_nodes:
        return None
    items_plan = []
    for item in sel.items:
        e = item.expr
        if isinstance(e, A.FuncCall) and e.name.lower() in _AGG_NAMES:
            if e.distinct:
                return None  # DISTINCT aggregates stay on the host path
            items_plan.append(("agg", e))
        elif sel.group_by and e in sel.group_by:
            items_plan.append(("key", sel.group_by.index(e)))
        else:
            return None

    import jax
    import jax.numpy as jnp

    lowerer = _JoinLowerer(fact, fnames, dim, dnames)

    def _float_only(expr: A.Expr) -> bool:
        ok = True

        def walk(e):
            nonlocal ok
            if isinstance(e, A.ColumnRef):
                try:
                    key = lowerer._column(e.name, e.table)
                except _Unsupported:
                    ok = False
                    return
                t = lowerer.col_for_key(key).sql_type
                if not (t.is_float or t.name == "DECIMAL"):
                    ok = False
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

    try:
        fact_key = lowerer._column(fkey_ref.name, fkey_ref.table)
        if fact_key.startswith("__dim__."):
            raise _Unsupported("join key resolution crossed sides")
        if outer and sel.where is not None and \
                lowerer.validity(sel.where) == "matched":
            # three-valued logic over NULL-able predicates (e.g. dim_col
            # inside OR) is beyond the static lattice — host path
            return None
        where_fn = lowerer.lower(sel.where) if sel.where is not None else None
        key_fns = [lowerer.lower(g) for g in sel.group_by]
        if key_fns and not _group_keys_int32_safe(lowerer, sel.group_by):
            return None
        if outer and any(lowerer.validity(g) == "matched"
                         for g in sel.group_by):
            return None  # NULL group keys for unmatched rows → host
        agg_plans = []
        agg_validity = []  # parallel: "all" | "matched" input rows
        for kind, node in items_plan:
            if kind == "key":
                agg_plans.append(("key", node))
                agg_validity.append("all")
                continue
            name = node.name.lower()
            if name not in ("count", "sum", "avg", "mean", "min", "max"):
                return None  # var/stddev family: single-table plans only
            if full and name in ("avg", "mean"):
                return None  # finalized avgs don't combine with phantoms
            if node.is_star or not node.args:
                if name != "count":
                    return None
                agg_plans.append(("count_star", None))
                agg_validity.append("all")
            else:
                if name != "count" and not _float_only(node.args[0]):
                    return None
                v = lowerer.validity(node.args[0]) if outer else "all"
                if name == "count" and v == "matched":
                    # count(non-null expr): count only matched rows; the
                    # value itself is irrelevant
                    agg_plans.append(("count_matched", None))
                    agg_validity.append(v)
                    continue
                agg_plans.append((name, lowerer.lower(node.args[0])))
                agg_validity.append(v)
    except _Unsupported:
        return None

    if analyze_only:
        return True

    n = fact.num_rows
    kmax_dim = int(dvals.max()) if len(dvals) else 0
    lookup = np.full(kmax_dim + 1, -1, np.int32)
    lookup[dvals] = np.arange(len(dvals), dtype=np.int32)

    # group sizing: plain column refs probe host-side; anything else uses
    # the guarded MAX_GROUPS fallback
    n_groups = 1
    strides = [1] * len(key_fns)
    if key_fns:
        try:
            radices = []
            for g in sel.group_by:
                if not isinstance(g, A.ColumnRef):
                    raise ValueError
                key = lowerer._column(g.name, g.table)
                col = lowerer.col_for_key(key)
                kmax = int(np.max(np.maximum(
                    np.asarray(col.data, np.int64), 0))) if len(col.data) else 0
                radices.append(kmax + 1)
            domain = 1
            for r in radices:
                domain = min(domain * r, 1 << 40)
            for i in range(len(radices) - 2, -1, -1):
                strides[i] = strides[i + 1] * radices[i + 1]
            n_groups = 8
            while n_groups < domain and n_groups < MAX_GROUPS:
                n_groups <<= 1
        except Exception:
            for i in range(len(key_fns) - 2, -1, -1):
                strides[i] = strides[i + 1] * MAX_GROUPS
            n_groups = MAX_GROUPS

    dim_keys = sorted(lowerer.dim_used)

    plan_key = (
        "join", repr(sel),
        tuple(sorted((k, c.data.dtype.str, len(c))
                     for k, c in lowerer.used_columns.items())),
        tuple(sorted((k, c.data.dtype.str, len(c))
                     for k, c in lowerer.dim_used.items())),
        tuple(sorted((name, id(m)) for name, m in lowerer.models.items())),
        n, n_groups, kmax_dim,
    )

    # --- mesh-partitioned execution: fact rows dp-sharded, dimension table
    # replicated (broadcast join); the gather prologue runs per device and
    # the aggregate tail merges through the partial-bucket shuffle.
    from .mesh_plan import execute_fused_on_mesh, get_mesh

    conn._mesh_plan_used = False
    mesh = get_mesh(conn)
    if mesh is not None:
        def prologue(cols):
            fk = jnp.asarray(cols[fact_key], jnp.int32)
            in_range = (fk >= 0) & (fk <= kmax_dim)
            ridx_raw = cols["__lookup__"][jnp.clip(fk, 0, kmax_dim)]
            matched = in_range & (ridx_raw >= 0)
            cols["__matched__"] = matched  # read by coalesce lowerings and
            # the matched-validity aggregate slots (outer joins)
            ridx = jnp.where(matched, ridx_raw, 0)
            for dk in dim_keys:
                cols[dk] = jnp.take(cols["__dimraw__." + dk], ridx, axis=0)
            # INNER drops unmatched rows; LEFT/RIGHT/FULL preserve them
            # (matched-validity slots mask their inputs instead)
            return None if outer else matched

        repl = {"__lookup__": lookup}
        for k, c in lowerer.dim_used.items():
            repl["__dimraw__." + k] = np.asarray(c.data)
        mesh_out = execute_fused_on_mesh(
            conn, mesh, n=n, plan_key=plan_key,
            sharded_columns=lowerer.used_columns, replicated_arrays=repl,
            prologue=prologue, where_fn=where_fn, key_fns=key_fns,
            strides=strides, n_groups=n_groups, agg_plans=agg_plans,
            agg_validity=agg_validity)
        if mesh_out is not None:
            out_table = _assemble_result(sel, items_plan, agg_plans, [],
                                         *mesh_out, has_keys=bool(key_fns))
            if out_table is not None:
                conn._mesh_plan_used = True
                if full:
                    try:
                        return _combine_full_phantom(
                            conn, sel, out_table, items_plan, lowerer, fact,
                            fnames, fact_key, dim, dnames, dvals)
                    except Exception:
                        conn._mesh_plan_used = False
                        return None
                return out_table
            return None  # a guard tripped — host path, not single-device
        # mesh execution unavailable/failed → single-device fused program

    # --- Pallas columnar kernel for fact→dim joins (config 3): the join
    # gather runs as an XLA prologue in the SAME jit as the kernel, so the
    # whole join-aggregate is one dispatch with zero scatters. Round 5:
    # LEFT/RIGHT/FULL ride the kernel too (matched-validity summand
    # masking); ineligible shapes stay on the XLA program below.
    conn._pallas_plan_used = False
    if mesh is None:
        _phases["plan_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
        _tp = _time.perf_counter()
        pallas_out = _try_pallas_join(
            conn, sel, fact, fnames, dim, dnames, fkey_ref, lookup,
            kmax_dim, n, n_groups, strides, agg_plans, items_plan,
            plan_key, outer=outer, agg_validity=agg_validity)
        if pallas_out is not None:
            _phases["pallas_exec_ms"] = round(
                (_time.perf_counter() - _tp) * 1e3, 3)
            out_table = _assemble_result(sel, items_plan, agg_plans, [],
                                         *pallas_out,
                                         has_keys=bool(key_fns))
            if out_table is not None:
                conn._pallas_plan_used = True
                conn._last_phases = _phases
                if full:
                    try:
                        return _combine_full_phantom(
                            conn, sel, out_table, items_plan, lowerer,
                            fact, fnames, fact_key, dim, dnames, dvals)
                    except Exception:
                        conn._pallas_plan_used = False
                        return None
                return out_table
            return None  # collision/frac guard — identical bucketing on
            # the XLA program would trip the same guard → host path

    def program(cols):
        fk = jnp.asarray(cols[fact_key], jnp.int32)
        in_range = (fk >= 0) & (fk <= kmax_dim)
        ridx_raw = cols["__lookup__"][jnp.clip(fk, 0, kmax_dim)]
        matched = in_range & (ridx_raw >= 0)
        ridx = jnp.where(matched, ridx_raw, 0)
        for dk in dim_keys:
            cols[dk] = jnp.take(cols["__dimraw__." + dk], ridx, axis=0)
        cols["__matched__"] = matched  # read by coalesce lowerings
        # INNER drops unmatched rows; an outer join preserves them (their
        # dim gathers read row 0 garbage, but every matched-validity
        # aggregate masks those rows out below)
        mask = jnp.ones(n, bool) if outer else matched
        if where_fn is not None:
            mask = mask & jnp.asarray(where_fn(cols), bool)
        raws = []
        if key_fns:
            for kf in key_fns:
                raws.append(jnp.asarray(kf(cols)))
            combined = jnp.zeros(n, jnp.int32)
            for r, stride in zip(raws, strides):
                combined = combined + jnp.asarray(r, jnp.int32) * np.int32(stride & 0x7FFFFFFF)
            keys = jnp.asarray(jnp.mod(combined, n_groups), jnp.int32)
        else:
            keys = jnp.zeros(n, jnp.int32)
        w = mask.astype(jnp.float32)
        # GEMM group-by for the aggregate tail (see device_plan.py)
        from ..ops import gemm_groupby as GG

        use_gemm = GG.eligible(n, n_groups)

        def segsum(v):
            if use_gemm:
                return GG.segment_sum(jnp, jax, v, keys, n_groups)
            return jax.ops.segment_sum(v, keys, num_segments=n_groups)

        w_sum_cache = []

        def w_sum():
            if not w_sum_cache:
                w_sum_cache.append(segsum(w))
            return w_sum_cache[0]

        outs = []
        key_mins, key_maxs, frac_flags = [], [], []
        big = jnp.int32(2**31 - 1)
        for r in raws:
            ri = jnp.asarray(r, jnp.int32)
            rf = jnp.asarray(r, jnp.float32)
            if use_gemm:
                kmn, kmx = GG.segment_minmax_int32(
                    jnp, jax, ri, keys, n_groups, mask)
                key_mins.append(kmn)
                key_maxs.append(kmx)
            else:
                key_mins.append(jax.ops.segment_min(
                    jnp.where(mask, ri, big), keys, num_segments=n_groups))
                key_maxs.append(jax.ops.segment_max(
                    jnp.where(mask, ri, -big - 1), keys,
                    num_segments=n_groups))
            frac_flags.append(jnp.any(mask & (rf != ri.astype(jnp.float32))))
        # per-validity variants: matched-validity aggregates (dim-sourced
        # expressions under an outer join) see only matched live rows
        wm_cache = []

        def w_of(validity):
            if validity == "all":
                return w, mask
            if not wm_cache:
                m2 = mask & matched
                wm_cache.append([m2.astype(jnp.float32), m2, None])
            return wm_cache[0][0], wm_cache[0][1]

        def wm_sum():
            w_of("matched")
            if wm_cache[0][2] is None:
                wm_cache[0][2] = segsum(wm_cache[0][0])
            return wm_cache[0][2]

        # Batched GEMM pre-pass (see device_plan.py): all sum-shaped
        # reductions — including the matched-validity weight row — share
        # one one-hot scan; min/max slots share one masked reduction with
        # per-slot masks.
        batch_specs: dict = {}
        mm_specs: dict = {}
        if use_gemm:
            from .mesh_plan import _compensated_shift

            rows_b = [w]
            wm_row = None
            mm_vals = []
            mm_masks = []
            if any(v == "matched" for v in agg_validity):
                w_of("matched")
                wm_row = len(rows_b)
                rows_b.append(wm_cache[0][0])
            for ai, ((name_, fn_), validity_) in enumerate(
                    zip(agg_plans, agg_validity)):
                if name_ in ("sum", "avg", "mean"):
                    vals_f = jnp.asarray(fn_(cols), jnp.float32)
                    w_i, _m_i = w_of(validity_)
                    shift = _compensated_shift(jnp, jax, vals_f, w_i,
                                               keys, n_groups)
                    rows_b.append((vals_f - shift[keys]) * w_i)
                    batch_specs[ai] = (len(rows_b) - 1, shift)
                elif name_ in ("min", "max"):
                    _w_i, m_i = w_of(validity_)
                    mm_vals.append(jnp.asarray(fn_(cols), jnp.float32))
                    mm_masks.append(m_i)
                    mm_specs[ai] = len(mm_vals) - 1
            batch_res = GG.segment_sum(jnp, jax, rows_b, keys, n_groups)
            w_sum_cache.append(batch_res[0])
            if wm_row is not None:
                wm_cache[0][2] = batch_res[wm_row]
            if mm_vals:
                mm_mns, mm_mxs = GG.segment_minmax(
                    jnp, jax, mm_vals, keys, n_groups, mm_masks)

        for ai, ((name, fn), validity) in enumerate(
                zip(agg_plans, agg_validity)):
            if name == "key":
                outs.append(("key", key_maxs[fn]))
                continue
            if name in ("count_star", "count"):
                outs.append(("v", w_sum()))
                continue
            if name == "count_matched":
                outs.append(("v", wm_sum()))
                continue
            w_i, mask_i = w_of(validity)
            cnt_i = w_sum() if validity == "all" else wm_sum()
            if name in ("sum", "avg", "mean"):
                # compensated (sum, comp) pair + f64 host fold, matching
                # device_plan.py (DuckDB-host DOUBLE accumulator parity);
                # matched-validity slots carry their own non-NULL count
                # for the avg divisor / empty-group NULL detection
                if ai in batch_specs:
                    from .mesh_plan import (_compensated_finish,
                                            _opaque_pin)

                    ridx, shift = batch_specs[ai]
                    pin = _opaque_pin(jnp, cnt_i >= 0.0)
                    s_pair = _compensated_finish(
                        jnp, shift, batch_res[ridx], cnt_i, pin)
                else:
                    from .mesh_plan import _compensated_segment_sum

                    vals = jnp.asarray(fn(cols), jnp.float32)
                    s_pair = _compensated_segment_sum(
                        jax, jnp, vals, w_i, keys, n_groups, cnt_i,
                        segsum=segsum if use_gemm else None)
                if validity == "matched":
                    outs.append(("v", (*s_pair, cnt_i)))
                else:
                    outs.append(("v", s_pair))
            elif name in ("min", "max"):
                if ai in mm_specs:
                    v = (mm_mns[mm_specs[ai]] if name == "min"
                         else mm_mxs[mm_specs[ai]])
                elif use_gemm:
                    vals = jnp.asarray(fn(cols), jnp.float32)
                    (mn,), (mx,) = GG.segment_minmax(
                        jnp, jax, [vals], keys, n_groups, [mask_i])
                    v = mn if name == "min" else mx
                else:
                    vals = jnp.asarray(fn(cols), jnp.float32)
                    v = (jax.ops.segment_min(
                        jnp.where(mask_i, vals, jnp.inf), keys,
                        num_segments=n_groups) if name == "min"
                        else jax.ops.segment_max(
                        jnp.where(mask_i, vals, -jnp.inf), keys,
                        num_segments=n_groups))
                if validity == "matched":
                    outs.append(("v", (v, cnt_i)))
                else:
                    outs.append(("v", v))
        group_count = w_sum()
        return [o for _, o in outs], group_count, key_mins, key_maxs, frac_flags

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

    _phases["plan_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    _t0 = _time.perf_counter()
    from .device_plan import device_column_array, get_table_block

    fact_block = get_table_block(conn, fact)
    device_cols = {}
    for k, c in lowerer.used_columns.items():
        device_cols[k] = device_column_array(c, key=k, block=fact_block,
                                             n=n)
    for k, c in lowerer.dim_used.items():
        device_cols["__dimraw__." + k] = device_column_array(c)
    device_cols["__lookup__"] = jnp.asarray(lookup)
    _phases["upload_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    _t0 = _time.perf_counter()
    try:
        # ONE batched device→host transfer (see device_plan.py note)
        results, group_count, key_mins, key_maxs, frac_flags = jax.device_get(
            compiled(device_cols))
        # keep tuple structure (compensated sum pairs) for _finalize_agg
        results = [r if isinstance(r, tuple) else np.asarray(r)
                   for r in results]
        group_count = np.asarray(group_count)
    except Exception:
        return None  # any trace/compile issue → host path
    _phases["exec_readback_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    conn._last_phases = _phases

    out = _assemble_result(sel, items_plan, agg_plans, [],
                           results, group_count, key_mins, key_maxs,
                           frac_flags, has_keys=bool(key_fns))
    if out is None or not full:
        return out
    try:
        return _combine_full_phantom(conn, sel, out, items_plan, lowerer,
                                     fact, fnames, fact_key, dim, dnames,
                                     dvals)
    except Exception:
        return None  # phantom-side oddity → host path (semantics intact)


def _norm_key(v):
    """Canonical group-key value for device↔phantom row matching: device
    keys render as int64/float64, phantom keys come back as Python
    scalars — map both onto (None | int | float) with int-valued floats
    collapsed to int."""
    if v is None:
        return None
    f = float(v)
    return int(f) if f.is_integer() else f


def _combine_full_phantom(conn, sel, out, items_plan, lowerer, fact, fnames,
                          fact_key, dim, dnames, dvals):
    """FULL join = device LEFT pass + the phantom side: dim rows with no
    fact match contribute one row each with every fact column NULL. The
    phantom side is at most |dim| rows, so it evaluates host-side with the
    full 3VL evaluator: the WHERE predicate filters phantom rows (NULL
    fact columns eliminate most predicates, but e.g. coalesce keeps rows),
    GROUP BY keys are evaluated per phantom row (fact-sourced keys go
    NULL), and each phantom group merges into the device group table —
    matching key tuples combine (count/sum add, min/max meet; avg was
    excluded at plan time), new key tuples append as new result rows."""
    from ..columnar import Column, Table
    from .executor import Scope

    fk_host = np.asarray(lowerer.used_columns[fact_key].data, np.int64)
    unmatched = ~np.isin(dvals, fk_host)
    n_ph = int(unmatched.sum())
    if n_ph == 0:
        return out
    cols: dict = {}
    fact_bares = {k.split(".")[-1].lower() for k in fact.columns}
    for k, c in dim.columns.items():
        bare = k.split(".")[-1]
        pc = Column(np.asarray(c.data)[unmatched], c.sql_type,
                    None if c.validity is None else
                    np.asarray(c.validity)[unmatched])
        for alias in dnames:
            cols[f"{alias}.{bare}"] = pc
        if bare.lower() not in fact_bares:
            cols[bare] = pc
    dim_bares = {k.split(".")[-1].lower() for k in dim.columns}
    for k, c in fact.columns.items():
        bare = k.split(".")[-1]
        nc = Column(np.zeros(n_ph, c.data.dtype), c.sql_type,
                    np.zeros(n_ph, bool))
        for alias in fnames:
            cols[f"{alias}.{bare}"] = nc
        if bare.lower() not in dim_bares:
            cols[bare] = nc
    scope = Scope(Table(cols))
    if sel.where is not None:
        # host 3VL: only rows where the predicate is TRUE (not NULL) stay
        wc = conn._eval(sel.where, scope)
        keep = wc.valid_mask() & np.asarray(wc.data, bool)
        if not keep.all():
            n_ph = int(keep.sum())
            if n_ph == 0:
                return out
            cols = {k: c.filter(keep) for k, c in
                    scope.table.columns.items()}
            scope = Scope(Table(cols))

    # evaluate each aggregate's argument once over the whole phantom side
    arg_cols = []
    for kind, node in items_plan:
        if kind == "key" or node.is_star or not node.args:
            arg_cols.append(None)
        else:
            arg_cols.append(conn._eval(node.args[0], scope))

    def agg_over(rows_idx, node, pc, dev_v):
        """Combine one aggregate over the phantom rows rows_idx with the
        device value dev_v (None for a fresh group)."""
        agg = node.name.lower()
        if node.is_star or not node.args:
            return (dev_v or 0) + len(rows_idx)
        valid = pc.valid_mask()[rows_idx]
        vals = np.asarray(pc.data, np.float64)[rows_idx][valid]
        if agg == "count":
            return (dev_v or 0) + int(valid.sum())
        if len(vals) == 0:
            return dev_v
        if agg == "sum":
            return (0.0 if dev_v is None else dev_v) + float(vals.sum())
        if agg == "min":
            return float(vals.min()) if dev_v is None else min(
                dev_v, float(vals.min()))
        if agg == "max":
            return float(vals.max()) if dev_v is None else max(
                dev_v, float(vals.max()))
        raise ValueError(agg)

    out_names = list(out.columns)
    out_cols = list(out.columns.values())
    if not sel.group_by:
        all_rows = np.arange(n_ph)
        new_cols = {}
        for (kind, node), name_out, col, pc in zip(
                items_plan, out_names, out_cols, arg_cols):
            v = agg_over(all_rows, node, pc, col.value(0))
            new_cols[name_out] = Column.from_values([v], col.sql_type)
        return Table(new_cols)

    # --- grouped combine -------------------------------------------------
    key_cols = [conn._eval(g, scope) for g in sel.group_by]
    groups: dict = {}
    for i in range(n_ph):
        kt = tuple(_norm_key(kc.value(i)) for kc in key_cols)
        groups.setdefault(kt, []).append(i)
    # device rows keyed by their group-key tuple (items_plan "key" slots)
    key_slots = [si for si, (kind, _n) in enumerate(items_plan)
                 if kind == "key"]
    # the device pass only fuses when every group key appears among the
    # select items, so key_slots covers sel.group_by exactly; map each
    # key slot back to its group_by position for tuple ordering
    slot_order = sorted(key_slots, key=lambda si: items_plan[si][1])
    n_dev = out.num_rows
    dev_index = {}
    for r in range(n_dev):
        kt = tuple(_norm_key(out_cols[si].value(r)) for si in slot_order)
        dev_index[kt] = r
    values = [[c.value(r) for r in range(n_dev)] for c in out_cols]
    for kt, rows_idx in groups.items():
        rows_idx = np.asarray(rows_idx)
        r = dev_index.get(kt)
        if r is None:
            r = len(values[0]) if values else 0
            for si, (kind, _node) in enumerate(items_plan):
                values[si].append(
                    kt[slot_order.index(si)] if kind == "key" else None)
            dev_index[kt] = r
        for si, ((kind, node), pc) in enumerate(zip(items_plan, arg_cols)):
            if kind == "key":
                continue
            values[si][r] = agg_over(rows_idx, node, pc, values[si][r])
    new_cols = {}
    for si, (name_out, col) in enumerate(zip(out_names, out_cols)):
        styp = col.sql_type
        kind = items_plan[si][0]
        if kind == "key" and any(
                v is not None and not float(v).is_integer()
                for v in values[si]):
            from ..columnar import types as T
            styp = T.DOUBLE
        new_cols[name_out] = Column.from_values(values[si], styp)
    return Table(new_cols)
