"""Big×big shuffle hash join (BASELINE config 5's missing half).

Query shape: ``SELECT aggs FROM A JOIN B ON A.k = B.k [WHERE ...] [GROUP BY
A-side int keys]`` where BOTH sides are large fact tables with arbitrary
(duplicate, skewed) integer join keys — the shape ``device_join_plan``
declines (it requires a ≤2^20-row unique-key dimension side) and the host
join serves at seconds-per-million-rows. Reference scope: the north-star
workload in BASELINE.json config 5 ("distributed shuffle + skewed hash
join + batched inference"); the reference itself has no join engine at all
(DuckDB's does the joining there — SURVEY.md §2.4).

TPU-first design — no pair materialization, no linear-probing hash table:
the join-aggregate decomposes through PER-KEY partial aggregation,

    count(*)              = Σ_a |B_{k(a)}|
    sum of pure-A f(a)    = Σ_a f(a)·|B_{k(a)}|
    sum of pure-B g(b)    = Σ_a sumB_g[k(a)]
    min/max over pairs    = meet of the per-side per-key extremes

1. **B pre-pass** (once per plan, on device): apply the B-side WHERE
   conjuncts, ONE device sort by key, segmented reduce to the unique-key
   table (uk, cntB, per-slot sums/mins/maxs). Sort-based build because TPU
   scatter is weak (SURVEY.md §7.3); the reduce runs on sorted segment ids.
2. **A-side pass, streamed in fixed chunks** (bounded HBM, overlapped
   dispatch like streaming_plan): per chunk a ``searchsorted`` binary-
   search gather joins each A row to its key's B partials, then the
   standard fused aggregate tail (GEMM group-by) reduces to the [G] group
   table; the host folds chunk partials in f64.

**Skew.** Keys never expand into join pairs — a hot key costs
O(|A_k| + |B_k|), not O(|A_k|·|B_k|) — so the plan is linear in |A| + |B|
for ANY key distribution; the pre-aggregation IS the skew mitigation. On a
mesh, B partials are additionally pre-reduced per device BEFORE the
all_to_all (parallel/shuffle.py), so a hot key's B rows collapse to one
(key, partials) record per source device and the exchange volume is
per-device unique keys.

Anything outside the supported shape returns None; the host join keeps the
full semantics.
"""

from __future__ import annotations

import numpy as np

from ..columnar import Column, Table
from ..columnar import types as T
from . import ast as A
from .device_plan import (_AGG_NAMES, MAX_GROUPS, _find_column_refs,
                          _Lowerer, _Unsupported)

SHUFFLE_JOIN_MIN_ROWS = 1 << 15
A_CHUNK_ROWS = 1 << 20
INT32_MAX = np.int32((1 << 31) - 1)


def _split_conjuncts(expr):
    if isinstance(expr, A.Binary) and expr.op == "AND":
        return _split_conjuncts(expr.left) + _split_conjuncts(expr.right)
    return [expr]


def _product_factors(expr):
    if isinstance(expr, A.Binary) and expr.op == "*":
        return _product_factors(expr.left) + _product_factors(expr.right)
    return [expr]


def _product_chain(factors):
    out = factors[0]
    for f in factors[1:]:
        out = A.Binary("*", out, f)
    return out


def try_execute_shuffle_join(conn, sel: A.Select, analyze_only: bool = False):
    """Compile + run a big×big join-aggregate; Table or None."""
    import time as _time

    _phases: dict = {}
    _t0 = _time.perf_counter()
    j = sel.from_
    if (
        not isinstance(j, A.Join)
        or j.kind != "INNER"
        or not isinstance(j.left, A.BaseTable)
        or not isinstance(j.right, A.BaseTable)
        or sel.having is not None
        or sel.distinct
        or len(sel.group_by) > 4
    ):
        return None
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
        return None

    def names_of(ref):
        out = {ref.name.lower()}
        if ref.alias:
            out.add(ref.alias.lower())
        return out

    def col_of(table, refs_names, keyref):
        if keyref.table and keyref.table.lower() not in refs_names:
            return None
        for k in table.columns:
            if k.split(".")[-1].lower() == keyref.name.lower():
                return table.columns[k]
        return None

    lnames, rnames = names_of(j.left), names_of(j.right)

    agg_nodes: list = []
    for item in sel.items:
        from .device_plan import _find_aggs

        _find_aggs(item.expr, agg_nodes)
    if not agg_nodes:
        return None
    items_plan = []
    for item in sel.items:
        e = item.expr
        if isinstance(e, A.FuncCall) and e.name.lower() in _AGG_NAMES:
            if e.distinct:
                return None
            items_plan.append(("agg", e))
        elif sel.group_by and e in sel.group_by:
            items_plan.append(("key", sel.group_by.index(e)))
        else:
            return None

    # --- orient: the A (probe/stream) side hosts the GROUP BY keys --------
    combos = [
        (lt, lnames, cond.left, rt, rnames, cond.right),
        (rt, rnames, cond.right, lt, lnames, cond.left),
    ]
    plan = None
    for at, anames, akey_ref, bt, bnames, bkey_ref in combos:
        if at.num_rows < SHUFFLE_JOIN_MIN_ROWS or \
                bt.num_rows < SHUFFLE_JOIN_MIN_ROWS:
            continue
        if at.num_rows >= (1 << 24) and not sel.group_by:
            pass  # chunked: fine past 2^24 (host f64 combine)
        ak = col_of(at, anames, akey_ref)
        bk = col_of(bt, bnames, bkey_ref)
        if ak is None or bk is None:
            continue
        if ak.validity is not None or bk.validity is not None:
            continue
        if ak.data.dtype.kind not in "iu" or bk.data.dtype.kind not in "iu":
            continue

        def _rng(col):
            r = getattr(col, "_int_range", None)
            if r is None:
                d = col.data
                r = (int(d.min()), int(d.max())) if d.size else (0, 0)
                col._int_range = r
            return r

        alo, ahi = _rng(ak)
        blo, bhi = _rng(bk)
        # keys ride as int32; INT32_MAX is the sort filler
        if min(alo, blo) < -(1 << 31) or max(ahi, bhi) >= (1 << 31) - 1:
            continue

        def side_of_ref(ref):
            q = ref.table.lower() if ref.table else None
            in_a = ((q is None or q in anames)
                    and col_of(at, anames, ref) is not None)
            in_b = ((q is None or q in bnames)
                    and col_of(bt, bnames, ref) is not None)
            if in_a and in_b:
                raise _Unsupported(f"ambiguous column {ref.name}")
            if in_a:
                return "a"
            if in_b:
                return "b"
            raise _Unsupported(f"unknown column {ref.name}")

        def side_of_expr(expr):
            refs: list = []
            _find_column_refs(expr, refs)
            if isinstance(expr, A.FuncCall):
                for arg in expr.args:
                    if isinstance(arg, A.Expr):
                        _find_column_refs(arg, refs)
            sides = {side_of_ref(r) for r in refs}
            if len(sides) > 1:
                raise _Unsupported("expression spans both join sides")
            return sides.pop() if sides else "a"

        try:
            # group keys: plain A-side integer column refs (streaming rule)
            ok = True
            for g in sel.group_by:
                if not isinstance(g, A.ColumnRef) or side_of_expr(g) != "a":
                    ok = False
                    break
                gc = col_of(at, anames, g)
                if gc is None or gc.validity is not None or \
                        gc.data.dtype.kind not in "iu":
                    ok = False
                    break
            if not ok:
                continue
            # WHERE: each top-level conjunct resolves to exactly one side
            a_wheres, b_wheres = [], []
            if sel.where is not None:
                for cj in _split_conjuncts(sel.where):
                    (a_wheres if side_of_expr(cj) == "a"
                     else b_wheres).append(cj)
            # aggregates: classify argument side
            agg_specs = []  # parallel to items_plan: (pname, side, arg)
            for kind, node in items_plan:
                if kind == "key":
                    agg_specs.append(("key", None, node))
                    continue
                name = node.name.lower()
                if name not in ("count", "sum", "avg", "mean", "min", "max"):
                    raise _Unsupported(name)
                if node.is_star or not node.args:
                    if name != "count":
                        raise _Unsupported(name)
                    agg_specs.append(("count_star", None, None))
                    continue
                try:
                    side = side_of_expr(node.args[0])
                except _Unsupported:
                    # mixed-side PRODUCT sums decompose through the per-key
                    # B partials (VERDICT r4 item 6):
                    #   sum(f(a)*g(b)) = SUM_a f(a) * sumB_g[k(a)]
                    if name not in ("sum", "avg", "mean"):
                        raise
                    fs = _product_factors(node.args[0])
                    fsides = [side_of_expr(f) for f in fs]  # single-sided
                    a_fs = [f for f, s2 in zip(fs, fsides) if s2 == "a"]
                    b_fs = [f for f, s2 in zip(fs, fsides) if s2 != "a"]
                    if not a_fs or not b_fs:
                        raise
                    agg_specs.append((f"ab{name}", "ab",
                                      (_product_chain(a_fs),
                                       _product_chain(b_fs))))
                    continue
                if name == "count":
                    # count(expr) == count(*) ONLY when the argument can
                    # never be NULL — the lowering phase verifies that by
                    # lowering the arg (raises on nullable columns);
                    # round-4 review fix: the unchecked rewrite overcounted
                    # pairs whose aggregate argument was NULL
                    agg_specs.append(("count_arg", side, node.args[0]))
                    continue
                agg_specs.append((name, side, node.args[0]))
            plan = (at, anames, akey_ref, ak, bt, bnames, bk,
                    a_wheres, b_wheres, agg_specs)
            break
        except _Unsupported:
            continue
    if plan is None:
        return None
    (at, anames, akey_ref, ak, bt, bnames, bk,
     a_wheres, b_wheres, agg_specs) = plan

    import jax
    import jax.numpy as jnp

    a_low = _Lowerer(at)
    b_low = _Lowerer(bt)

    def _float_only(low, table, expr):
        ok = True

        def walk(e):
            nonlocal ok
            if isinstance(e, A.ColumnRef):
                try:
                    key = low._column(e.name, e.table)
                except _Unsupported:
                    ok = False
                    return
                t = table.columns[key].sql_type
                if not (t.is_float or t.name == "DECIMAL"):
                    ok = False
            if isinstance(e, A.FuncCall):
                if e.name.lower() == "infera_predict":
                    return
                for arg in e.args:
                    if isinstance(arg, A.Expr):
                        walk(arg)
                return
            for attr in ("operand", "left", "right", "low", "high"):
                child = getattr(e, attr, None)
                if isinstance(child, A.Expr):
                    walk(child)

        walk(expr)
        return ok

    try:
        a_where_fn = None
        if a_wheres:
            conj = a_wheres[0]
            for cj in a_wheres[1:]:
                conj = A.Binary("AND", conj, cj)
            a_where_fn = a_low.lower(conj)
        b_where_fn = None
        if b_wheres:
            conj = b_wheres[0]
            for cj in b_wheres[1:]:
                conj = A.Binary("AND", conj, cj)
            b_where_fn = b_low.lower(conj)
        key_keys = [a_low._column(g.name, g.table) for g in sel.group_by]
        key_fns = [a_low.lower(g) for g in sel.group_by]
        # slots: (pname, side, lowered fn | slot index bookkeeping)
        b_sum_fns: list = []
        b_min_fns: list = []
        b_max_fns: list = []
        b_csum_fns: list = []  # compensated per-key sums for ab products
        agg_plans = []  # (pname, payload) for the result assembly
        for pname, side, arg in agg_specs:
            if pname == "key":
                agg_plans.append(("key", arg))
                continue
            if pname == "count_star":
                agg_plans.append(("count_star", None))
                continue
            if pname == "count_arg":
                # lower the argument purely for its NULL guard (_column
                # raises _Unsupported on nullable columns) — then the
                # count is the pair count
                (a_low if side == "a" else b_low).lower(arg)
                agg_plans.append(("count_star", None))
                continue
            if pname in ("absum", "abavg", "abmean"):
                a_expr, b_expr = arg
                if not _float_only(a_low, at, a_expr) or \
                        not _float_only(b_low, bt, b_expr):
                    return None
                a_fn = a_low.lower(a_expr)
                b_csum_fns.append(b_low.lower(b_expr))
                agg_plans.append((pname, (a_fn, len(b_csum_fns) - 1)))
                continue
            low = a_low if side == "a" else b_low
            tbl = at if side == "a" else bt
            if not _float_only(low, tbl, arg):
                return None
            fn = low.lower(arg)
            if side == "a":
                agg_plans.append((f"a{pname}", fn))
            else:
                if pname in ("sum", "avg", "mean"):
                    b_sum_fns.append(fn)
                    agg_plans.append((f"b{pname}", len(b_sum_fns) - 1))
                elif pname == "min":
                    b_min_fns.append(fn)
                    agg_plans.append(("bmin", len(b_min_fns) - 1))
                else:
                    b_max_fns.append(fn)
                    agg_plans.append(("bmax", len(b_max_fns) - 1))
    except _Unsupported:
        return None

    if analyze_only:
        return True

    # --- group sizing (host probe, streaming discipline) ------------------
    n_groups = 1
    strides: list = []
    if key_fns:
        radices = []
        for k in key_keys:
            d = at.columns[k].data
            lo = int(d.min()) if d.size else 0
            hi = int(d.max()) if d.size else 0
            if lo < 0 or hi >= (1 << 31):
                return None
            radices.append(hi + 1)
        domain = 1
        for r in radices:
            domain = min(domain * r, 1 << 40)
        n_groups = 8
        while n_groups < domain and n_groups < MAX_GROUPS:
            n_groups <<= 1
        strides = [1] * len(radices)
        for i in range(len(radices) - 2, -1, -1):
            strides[i] = strides[i + 1] * radices[i + 1]

    _phases["plan_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    _t0 = _time.perf_counter()

    from .mesh_plan import get_mesh

    conn._mesh_plan_used = False
    mesh = get_mesh(conn)
    if mesh is not None:
        out = _execute_mesh(conn, mesh, sel, at, a_low, ak, bt, b_low, bk,
                            a_where_fn, b_where_fn, key_fns, strides,
                            n_groups, agg_plans, b_sum_fns, b_min_fns,
                            b_max_fns, items_plan, key_keys, _phases,
                            b_csum_fns=b_csum_fns)
        if out is not None:
            conn._mesh_plan_used = True
            conn._last_phases = _phases
            return out
        # mesh lowering failed → single-device path below

    nb = bt.num_rows
    na = at.num_rows

    # --- B pre-pass: sort + segmented per-key reduce ----------------------
    b_cols_used = sorted(b_low.used_columns)
    SB, MB, XB = len(b_sum_fns), len(b_min_fns), len(b_max_fns)
    CB = len(b_csum_fns)

    def b_prepass(kb, *arrs):
        cols = dict(zip(b_cols_used, arrs))
        vb = jnp.ones(nb, bool)
        if b_where_fn is not None:
            vb = vb & jnp.asarray(b_where_fn(cols), bool)
        ks = jnp.where(vb, jnp.asarray(kb, jnp.int32), INT32_MAX)
        order = jnp.argsort(ks)
        ks_s = ks[order]
        wb = vb[order].astype(jnp.float32)
        is_start = jnp.concatenate(
            [jnp.ones(1, bool), ks_s[1:] != ks_s[:-1]])
        uidx = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        n_seg = uidx[-1] + 1
        uk = jax.ops.segment_max(ks_s, uidx, num_segments=nb,
                                 indices_are_sorted=True)
        alive = jnp.arange(nb) < n_seg
        uk = jnp.where(alive, uk, INT32_MAX)
        # per-key row counts in int32: f32 rounds past 2^24 rows per key,
        # which would silently corrupt the "exact" limb pair counts built
        # from these weights downstream (round-4 review fix)
        cnt = jax.ops.segment_sum(wb.astype(jnp.int32), uidx,
                                  num_segments=nb, indices_are_sorted=True)
        outs = [uk, cnt]
        for fn in b_sum_fns:
            v = jnp.asarray(fn(cols), jnp.float32)[order]
            outs.append(jax.ops.segment_sum(v * wb, uidx, num_segments=nb,
                                            indices_are_sorted=True))
        for fn in b_min_fns:
            v = jnp.asarray(fn(cols), jnp.float32)[order]
            outs.append(jax.ops.segment_min(
                jnp.where(wb > 0, v, jnp.inf), uidx, num_segments=nb,
                indices_are_sorted=True))
        for fn in b_max_fns:
            v = jnp.asarray(fn(cols), jnp.float32)[order]
            outs.append(jax.ops.segment_max(
                jnp.where(wb > 0, v, -jnp.inf), uidx, num_segments=nb,
                indices_are_sorted=True))
        if b_csum_fns:
            # compensated per-key sums: a plain f32 sumB's rounding gets
            # MULTIPLIED by every joining A row in the ab product slots
            # (measured 2e-5 rel on the skewed test) — carry (s, c) pairs
            from .mesh_plan import _compensated_segment_sum

            cntf = jax.ops.segment_sum(wb, uidx, num_segments=nb,
                                       indices_are_sorted=True)
            for fn in b_csum_fns:
                v = jnp.asarray(fn(cols), jnp.float32)[order]
                s_, c_ = _compensated_segment_sum(
                    jax, jnp, v, wb, uidx, nb, cntf)
                outs.append(s_)
                outs.append(c_)
        return tuple(outs)

    cache = getattr(conn, "_device_plan_cache", None)
    if cache is None:
        cache = {}
        conn._device_plan_cache = cache
    bkey = ("sjoin_b", repr(sel), id(bt), nb, tuple(b_cols_used),
            tuple(sorted((nm, id(m)) for nm, m in b_low.models.items())))
    cached_b = cache.get(bkey)
    try:
        if cached_b is None:
            b_jit = jax.jit(b_prepass)
            b_arrs = [jnp.asarray(b_low.used_columns[k].data)
                      for k in b_cols_used]
            b_built = b_jit(jnp.asarray(np.asarray(bk.data, np.int64)
                                        .astype(np.int32)), *b_arrs)
            if len(cache) >= 16:
                cache.pop(next(iter(cache)))
            # the cache VALUE holds the source table (id-keyed entries
            # must pin their referent or a recycled id serves stale data)
            cache[bkey] = (bt, b_built)
        else:
            b_built = cached_b[1]
        b_tables = b_built
    except Exception:
        return None
    _phases["b_prepass_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    _t0 = _time.perf_counter()

    # --- A streaming pass -------------------------------------------------
    a_cols_used = sorted(a_low.used_columns)
    a_key_host = np.asarray(ak.data, np.int64).astype(np.int32)

    def a_step(valid, ka, uk, cnt, *rest):
        b_slots = rest[:SB + MB + XB + 2 * CB]
        cols = dict(zip(a_cols_used, rest[SB + MB + XB + 2 * CB:]))
        mask = valid
        if a_where_fn is not None:
            mask = mask & jnp.asarray(a_where_fn(cols), bool)
        ka = jnp.asarray(ka, jnp.int32)
        idx = jnp.searchsorted(uk, ka)
        idx = jnp.clip(idx, 0, nb - 1)
        matched = (uk[idx] == ka) & mask
        wi0 = jnp.where(matched, cnt[idx], 0)   # int32 pairs per A row
        w = wi0.astype(jnp.float32)
        if key_fns:
            combined = jnp.zeros(A_CHUNK_ROWS, jnp.int32)
            for kf, stride in zip(key_fns, strides):
                combined = combined + (jnp.asarray(kf(cols), jnp.int32)
                                       * np.int32(stride & 0x7FFFFFFF))
            keys = jnp.asarray(jnp.mod(combined, n_groups), jnp.int32)
        else:
            keys = jnp.zeros(A_CHUNK_ROWS, jnp.int32)
        from ..ops import gemm_groupby as GG

        use_gemm = GG.eligible(A_CHUNK_ROWS, n_groups)

        def segsum(v):
            if use_gemm:
                return GG.segment_sum(jnp, jax, v, keys, n_groups)
            if isinstance(v, (list, tuple)):
                return [jax.ops.segment_sum(x, keys, num_segments=n_groups)
                        for x in v]
            return jax.ops.segment_sum(v, keys, num_segments=n_groups)

        live = w > 0
        # pair counts ride as 8-bit limbs of the int32 per-row weight:
        # f32 accumulation is exact only to 2^24, but a chunk-group's pair
        # count is Σ cntB and can blow far past it; int32 limb sums stay
        # exact (chunk 2^20 x 255 < 2^31 — the int_agg discipline) and the
        # host folds limbs in int64
        wi = wi0
        climb_rows = [jnp.bitwise_and(jnp.right_shift(wi, 8 * jj), 255)
                      for jj in range(4)]

        def segmin(v, m):
            if use_gemm:
                (mn,), _ = GG.segment_minmax(jnp, jax, [v], keys,
                                             n_groups, [m])
                return mn
            return jax.ops.segment_min(jnp.where(m, v, jnp.inf), keys,
                                       num_segments=n_groups)

        def segmax(v, m):
            if use_gemm:
                _, (mx,) = GG.segment_minmax(jnp, jax, [v], keys,
                                             n_groups, [m])
                return mx
            return jax.ops.segment_max(jnp.where(m, v, -jnp.inf), keys,
                                       num_segments=n_groups)

        # batch every sum-shaped row through ONE shared reduction
        sum_rows = [w]
        sum_refs: dict = {}
        for ai, (pname, payload) in enumerate(agg_plans):
            if pname in ("asum", "aavg", "amean"):
                v = jnp.asarray(payload(cols), jnp.float32)
                sum_rows.append(v * w)
                sum_refs[ai] = len(sum_rows) - 1
            elif pname in ("bsum", "bavg", "bmean"):
                v = b_slots[payload]
                sum_rows.append(jnp.where(matched, v[idx], 0.0))
                sum_refs[ai] = len(sum_rows) - 1
        sums = segsum(sum_rows)
        gcount = sums[0]
        if use_gemm:
            climbs = GG.segment_sum_int_exact(jnp, jax, climb_rows, keys,
                                              n_groups)
        else:
            climbs = [jax.ops.segment_sum(r, keys, num_segments=n_groups)
                      for r in climb_rows]
        outs = []
        for ai, (pname, payload) in enumerate(agg_plans):
            if pname == "key":
                outs.append(None)
            elif pname == "count_star":
                outs.append(None)  # served by the exact limb counts
            elif pname in ("asum", "bsum"):
                outs.append(sums[sum_refs[ai]])
            elif pname in ("aavg", "amean", "bavg", "bmean"):
                outs.append(sums[sum_refs[ai]])  # divisor = limb count
            elif pname in ("absum", "abavg", "abmean"):
                # compensated (s, c) pair: the product row's accumulation
                # magnitude (A rows x per-key B sums) swamps a plain f32
                # sum; the Dekker two_prod keeps the per-row product exact
                # and the shifted Kahan pass keeps the grouped sum at
                # ~f64 fold accuracy (mesh comp_sum discipline)
                from .mesh_plan import (_compensated_finish,
                                        _compensated_shift, _kahan_chunked,
                                        _opaque_pin, _two_prod)

                a_fn, ci = payload
                base_c = SB + MB + XB
                av = jnp.asarray(a_fn(cols), jnp.float32)
                bv = jnp.where(matched,
                               b_slots[base_c + 2 * ci][idx], 0.0)
                bvc = jnp.where(matched,
                                b_slots[base_c + 2 * ci + 1][idx], 0.0)
                mrow = matched.astype(jnp.float32)
                mcnt = segsum(mrow)  # rows contributing, NOT pair count
                pin = _opaque_pin(jnp, sums[0][0] >= 0.0)
                prod, perr = _two_prod(jnp, av, bv, pin)
                # FINE-chunked Kahan (mesh comp_sum discipline): gathered
                # per-key B sums are bimodal and LARGE, so a single-pass
                # residual sum still wanders at hot-key magnitude
                # (measured 1.7e5 abs on the skewed test); the scan keeps
                # cross-chunk accumulation error-free
                shift = _compensated_shift(jnp, jax, prod, mrow, keys,
                                           n_groups)
                resid = (prod - shift[keys]) * mrow
                rs, rc = _kahan_chunked(jax, jnp, resid, keys, n_groups,
                                        pin, chunk=1024, max_chunks=1024)
                s_, c_ = _compensated_finish(jnp, shift, rs, mcnt, pin)
                # exact-product tails + the B-side compensation carried
                # through the gather (av*c is residual-scale in f32)
                c_ = c_ + rc + segsum((perr + av * bvc) * mrow)
                outs.append((s_, c_))
            elif pname == "amin":
                outs.append(segmin(jnp.asarray(payload(cols), jnp.float32),
                                   live))
            elif pname == "amax":
                outs.append(segmax(jnp.asarray(payload(cols), jnp.float32),
                                   live))
            elif pname == "bmin":
                v = b_slots[SB + payload]
                outs.append(segmin(jnp.where(matched, v[idx], jnp.inf),
                                   matched))
            else:  # bmax
                v = b_slots[SB + MB + payload]
                outs.append(segmax(jnp.where(matched, v[idx], -jnp.inf),
                                   matched))
        big = jnp.int32(2**31 - 1)
        key_mins, key_maxs = [], []
        for kf in key_fns:
            ri = jnp.asarray(kf(cols), jnp.int32)
            if use_gemm:
                kmn, kmx = GG.segment_minmax_int32(jnp, jax, ri, keys,
                                                   n_groups, live)
                key_mins.append(kmn)
                key_maxs.append(kmx)
            else:
                key_mins.append(jax.ops.segment_min(
                    jnp.where(live, ri, big), keys, num_segments=n_groups))
                key_maxs.append(jax.ops.segment_max(
                    jnp.where(live, ri, -big - 1), keys,
                    num_segments=n_groups))
        del gcount
        return outs, climbs, key_mins, key_maxs

    akey2 = ("sjoin_a", repr(sel), id(at), id(bt), na, nb, n_groups)
    a_jit = cache.get(akey2)
    if a_jit is None:
        a_jit = jax.jit(a_step)
        if len(cache) >= 16:
            cache.pop(next(iter(cache)))
        cache[akey2] = a_jit

    acc_outs = None
    acc_climbs = None
    acc_kmin = [np.full(n_groups, 2**31 - 1, np.int64) for _ in key_fns]
    acc_kmax = [np.full(n_groups, -(2**31), np.int64) for _ in key_fns]
    host_cols = {k: a_low.used_columns[k].data for k in a_cols_used}

    def fold(res):
        nonlocal acc_outs, acc_climbs
        outs, climbs, kmins, kmaxs = jax.device_get(res)
        conv = [None if o is None
                else (np.asarray(o[0], np.float64)
                      + np.asarray(o[1], np.float64))
                if isinstance(o, tuple) else np.asarray(o, np.float64)
                for o in outs]
        climbs = [np.asarray(c, np.int64) for c in climbs]
        if acc_outs is None:
            acc_outs = conv
            acc_climbs = climbs
        else:
            for i, (pname, _) in enumerate(agg_plans):
                if conv[i] is None:
                    continue
                if pname in ("amin", "bmin"):
                    acc_outs[i] = np.minimum(acc_outs[i], conv[i])
                elif pname in ("amax", "bmax"):
                    acc_outs[i] = np.maximum(acc_outs[i], conv[i])
                else:
                    acc_outs[i] = acc_outs[i] + conv[i]
            acc_climbs = [a + c for a, c in zip(acc_climbs, climbs)]
        for jj in range(len(key_fns)):
            acc_kmin[jj] = np.minimum(acc_kmin[jj],
                                      np.asarray(kmins[jj], np.int64))
            acc_kmax[jj] = np.maximum(acc_kmax[jj],
                                      np.asarray(kmaxs[jj], np.int64))

    try:
        in_flight = []
        for start in range(0, na, A_CHUNK_ROWS):
            stop = min(start + A_CHUNK_ROWS, na)
            valid = np.zeros(A_CHUNK_ROWS, bool)
            valid[: stop - start] = True
            kchunk = a_key_host[start:stop]
            if len(kchunk) < A_CHUNK_ROWS:
                kchunk = np.concatenate(
                    [kchunk, np.zeros(A_CHUNK_ROWS - len(kchunk), np.int32)])
            chunk_arrays = []
            for k in a_cols_used:
                part = np.asarray(host_cols[k][start:stop])
                if len(part) < A_CHUNK_ROWS:
                    part = np.concatenate(
                        [part, np.zeros((A_CHUNK_ROWS - len(part),)
                                        + part.shape[1:], part.dtype)])
                chunk_arrays.append(part)
            in_flight.append(a_jit(valid, kchunk, *b_tables, *chunk_arrays))
            if len(in_flight) >= 2:
                fold(in_flight.pop(0))
        for res in in_flight:
            fold(res)
    except Exception:
        return None
    _phases["a_stream_ms"] = round((_time.perf_counter() - _t0) * 1e3, 3)
    conn._last_phases = _phases

    count64 = sum(c << (8 * jj) for jj, c in enumerate(acc_climbs))
    return _assemble(sel, items_plan, agg_plans, acc_outs, count64,
                     acc_kmin, acc_kmax, key_fns)


def _assemble(sel, items_plan, agg_plans, acc_outs, count64, acc_kmin,
              acc_kmax, key_fns):
    """count64: exact int64 pair count per group (the avg divisor and the
    live-group mask)."""
    count64 = np.asarray(count64, np.int64)
    live = count64 > 0 if key_fns else np.array([True])
    if not key_fns:
        count64 = count64.reshape(1)
        acc_outs = [o if o is None else np.asarray(o).reshape(1)
                    for o in acc_outs]
    for jj in range(len(key_fns)):
        if (acc_kmin[jj][live] != acc_kmax[jj][live]).any():
            return None  # modulo bucket held distinct keys — host path
    out_cols: dict = {}
    for (kind, node), (pname, _), res in zip(items_plan, agg_plans,
                                             acc_outs):
        idx = len(out_cols)
        item = sel.items[idx]
        name = item.alias or (
            node.name if isinstance(node, A.FuncCall)
            else item.expr.name if isinstance(item.expr, A.ColumnRef)
            else f"col{idx}")
        base, k = name, 1
        while name in out_cols:
            name = f"{base}_{k}"
            k += 1
        if pname == "key":
            out_cols[name] = Column(acc_kmax[node][live].astype(np.int64),
                                    T.BIGINT)
            continue
        if pname == "count_star":
            out_cols[name] = Column(count64[live], T.BIGINT)
            continue
        # zero-pair groups render NULL (the global group is always live):
        # sums/avgs/mins would otherwise leak 0.0 / +-inf identities
        c64 = count64[live]
        if pname in ("aavg", "amean", "bavg", "bmean", "abavg", "abmean"):
            c = c64.astype(np.float64)
            vals = res[live] / np.where(c == 0, 1.0, c)
        else:
            vals = res[live].astype(np.float64)
        out_cols[name] = Column.from_values(
            [None if c64[i] == 0 else float(vals[i])
             for i in range(len(vals))], T.DOUBLE)
    return Table(out_cols)


def _execute_mesh(conn, mesh, sel, at, a_low, ak, bt, b_low, bk, a_where_fn,
                  b_where_fn, key_fns, strides, n_groups, agg_plans,
                  b_sum_fns, b_min_fns, b_max_fns, items_plan, key_keys,
                  _phases, b_csum_fns=()):
    """Mesh variant: hash-exchange both sides by join key over the dp axis
    (parallel/shuffle.py), per-device pre-aggregated join, psum/pmin/pmax
    merge of the [G] group partials. B is LOCALLY pre-reduced to (key,
    partials) records BEFORE the all_to_all, so a hot key's B rows collapse
    to ≤1 record per source device — the skew mitigation SURVEY §2.4 asks
    of the shuffle."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.shuffle import _pack_buckets
    from .mesh_plan import (_canonical_host, _compensated_finish,
                            _compensated_shift, _kahan_chunked, _opaque_pin,
                            _put_sharded, _two_prod)

    ndev = int(mesh.shape["dp"])
    na, nb = at.num_rows, bt.num_rows
    if na < ndev or nb < ndev:
        return None
    la = -(-na // ndev)
    lb = -(-nb // ndev)
    na_pad, nb_pad = la * ndev, lb * ndev
    SB, MB, XB = len(b_sum_fns), len(b_min_fns), len(b_max_fns)
    CB = len(b_csum_fns)
    G = int(n_groups)
    a_cols_used = sorted(a_low.used_columns)
    b_cols_used = sorted(b_low.used_columns)

    def local_fn(a_valid, b_valid, ka, kb, *arrs):
        acols = dict(zip(a_cols_used, arrs[:len(a_cols_used)]))
        bcols = dict(zip(b_cols_used, arrs[len(a_cols_used):]))

        # --- B: local filter + per-key pre-reduce (before the exchange) ---
        vb = b_valid
        if b_where_fn is not None:
            vb = vb & jnp.asarray(b_where_fn(bcols), bool)
        ks = jnp.where(vb, jnp.asarray(kb, jnp.int32), INT32_MAX)
        order = jnp.argsort(ks)
        ks_s = ks[order]
        wb = vb[order].astype(jnp.float32)
        is_start = jnp.concatenate([jnp.ones(1, bool),
                                    ks_s[1:] != ks_s[:-1]])
        uidx = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        n_seg = uidx[-1] + 1
        alive = jnp.arange(lb) < n_seg
        uk_l = jnp.where(alive, jax.ops.segment_max(
            ks_s, uidx, num_segments=lb, indices_are_sorted=True),
            INT32_MAX)
        payload = [uk_l,
                   jax.ops.segment_sum(wb.astype(jnp.int32), uidx,
                                       num_segments=lb,
                                       indices_are_sorted=True)]
        for fn in b_sum_fns:
            v = jnp.asarray(fn(bcols), jnp.float32)[order]
            payload.append(jax.ops.segment_sum(
                v * wb, uidx, num_segments=lb, indices_are_sorted=True))
        for fn in b_min_fns:
            v = jnp.asarray(fn(bcols), jnp.float32)[order]
            payload.append(jax.ops.segment_min(
                jnp.where(wb > 0, v, jnp.inf), uidx, num_segments=lb,
                indices_are_sorted=True))
        for fn in b_max_fns:
            v = jnp.asarray(fn(bcols), jnp.float32)[order]
            payload.append(jax.ops.segment_max(
                jnp.where(wb > 0, v, -jnp.inf), uidx, num_segments=lb,
                indices_are_sorted=True))
        if b_csum_fns:
            from .mesh_plan import _compensated_segment_sum

            cntf_l = jax.ops.segment_sum(wb, uidx, num_segments=lb,
                                         indices_are_sorted=True)
            for fn in b_csum_fns:
                v = jnp.asarray(fn(bcols), jnp.float32)[order]
                s_l, c_l = _compensated_segment_sum(
                    jax, jnp, v, wb, uidx, lb, cntf_l)
                payload.append(s_l)
                payload.append(c_l)
        b_live = alive & (payload[1] > 0) & (uk_l != INT32_MAX)
        owner = jnp.where(b_live, jnp.mod(uk_l, ndev), 0).astype(jnp.int32)
        packed, send_valid = _pack_buckets(
            owner, [jnp.where(b_live, uk_l, INT32_MAX)] + payload[1:],
            ndev, lb)
        rv = jax.lax.all_to_all(send_valid, "dp", split_axis=0,
                                concat_axis=0).reshape(ndev * lb)
        recv = []
        for buf in packed:
            r = jax.lax.all_to_all(buf, "dp", split_axis=0, concat_axis=0)
            recv.append(r.reshape(ndev * lb))
        # merge received per-source partials: second sort + reduce
        rk = jnp.where(rv, recv[0], INT32_MAX)
        order2 = jnp.argsort(rk)
        rk_s = rk[order2]
        ok2 = rv[order2] & (rk_s != INT32_MAX)
        is2 = jnp.concatenate([jnp.ones(1, bool), rk_s[1:] != rk_s[:-1]])
        uidx2 = jnp.cumsum(is2.astype(jnp.int32)) - 1
        nm = ndev * lb
        n_seg2 = uidx2[-1] + 1
        alive2 = jnp.arange(nm) < n_seg2
        uk = jnp.where(alive2, jax.ops.segment_max(
            rk_s, uidx2, num_segments=nm, indices_are_sorted=True),
            INT32_MAX)
        okf = ok2.astype(jnp.float32)
        # int32 counts end to end: exact for any per-key row count
        cnt = jax.ops.segment_sum(jnp.where(ok2, recv[1][order2], 0),
                                  uidx2, num_segments=nm,
                                  indices_are_sorted=True)
        b_slots = []
        for si in range(SB):
            b_slots.append(jax.ops.segment_sum(
                recv[2 + si][order2] * okf, uidx2, num_segments=nm,
                indices_are_sorted=True))
        for mi in range(MB):
            v = recv[2 + SB + mi][order2]
            b_slots.append(jax.ops.segment_min(
                jnp.where(ok2, v, jnp.inf), uidx2, num_segments=nm,
                indices_are_sorted=True))
        for xi in range(XB):
            v = recv[2 + SB + MB + xi][order2]
            b_slots.append(jax.ops.segment_max(
                jnp.where(ok2, v, -jnp.inf), uidx2, num_segments=nm,
                indices_are_sorted=True))
        for ci in range(2 * CB):
            # per-source (s, c) parts both sum-merge; the represented
            # per-key value stays s + c
            b_slots.append(jax.ops.segment_sum(
                recv[2 + SB + MB + XB + ci][order2] * okf, uidx2,
                num_segments=nm, indices_are_sorted=True))

        # --- A: exchange raw rows by key hash, then the join gather -------
        ka_i = jnp.asarray(ka, jnp.int32)
        mask_a = a_valid
        if a_where_fn is not None:
            mask_a = mask_a & jnp.asarray(a_where_fn(acols), bool)
        owner_a = jnp.mod(ka_i, ndev).astype(jnp.int32)
        a_payload = [jnp.where(mask_a, ka_i, INT32_MAX)]
        key_raws = [jnp.asarray(kf(acols), jnp.int32) for kf in key_fns]
        a_payload.extend(key_raws)
        a_vals = []
        for ai, (pname, payload_) in enumerate(agg_plans):
            if pname in ("asum", "aavg", "amean", "amin", "amax"):
                a_vals.append((ai, jnp.asarray(payload_(acols),
                                               jnp.float32)))
            elif pname in ("absum", "abavg", "abmean"):
                a_vals.append((ai, jnp.asarray(payload_[0](acols),
                                               jnp.float32)))
        a_payload.extend(v for _ai, v in a_vals)
        packed_a, send_valid_a = _pack_buckets(
            owner_a, a_payload, ndev, la)
        rva = jax.lax.all_to_all(send_valid_a, "dp", split_axis=0,
                                 concat_axis=0).reshape(ndev * la)
        recva = []
        for buf in packed_a:
            r = jax.lax.all_to_all(buf, "dp", split_axis=0, concat_axis=0)
            recva.append(r.reshape(ndev * la))
        rka = recva[0]
        maskr = rva & (rka != INT32_MAX)
        idx = jnp.clip(jnp.searchsorted(uk, rka), 0, nm - 1)
        matched = (uk[idx] == rka) & maskr
        wi0 = jnp.where(matched, cnt[idx], 0)  # int32 pairs per A row
        w = wi0.astype(jnp.float32)
        nkeys = len(key_fns)
        if key_fns:
            combined = jnp.zeros(ndev * la, jnp.int32)
            for ki in range(nkeys):
                combined = combined + recva[1 + ki] * np.int32(
                    strides[ki] & 0x7FFFFFFF)
            keys = jnp.asarray(jnp.mod(combined, G), jnp.int32)
        else:
            keys = jnp.zeros(ndev * la, jnp.int32)
        live = w > 0
        # exact pair counts: 8-bit limbs of the int32 weight, int32 segment
        # sums (exact while rows-per-device x 255 < 2^31), int32 psum over
        # the mesh — the f32 path rounds past 2^24 pairs (round-4 fix)
        wi = wi0
        climbs = [jax.lax.psum(jax.ops.segment_sum(
            jnp.bitwise_and(jnp.right_shift(wi, 8 * jj), 255), keys,
            num_segments=G), "dp") for jj in range(4)]

        aval_map = {ai: recva[1 + nkeys + pos]
                    for pos, (ai, _v) in enumerate(a_vals)}

        from ..ops import gemm_groupby as GG

        def comp_sum(vals_x, live_mask, weight=None):
            """Compensated per-device grouped sum of weight·vals_x over
            live rows; the (s, c) pairs all_gather to [ndev, G] and the
            host folds in f64 — a plain f32 psum rounds at the merged
            magnitude (the mesh_plan discipline). Pair weights multiply
            through a Dekker two_prod (they are exactly-representable int
            counts), so the per-row product is error-free and its tail sums
            into the compensation; the residual pass routes through the
            GEMM one-hot reduction (f32-HIGHEST matmul, pairwise-ish
            accumulation) — gathered B per-key sums are bimodal and LARGE,
            which defeats the chunked Kahan's plain within-chunk sums."""
            wrow = live_mask.astype(jnp.float32)
            cntr = jax.ops.segment_sum(wrow, keys, num_segments=G)
            pin = _opaque_pin(jnp, cntr[0] >= 0.0)
            gsum = lambda v: GG.segment_sum(jnp, jax, v, keys, G)  # noqa
            tail = None
            if weight is not None:
                vals_x, perr = _two_prod(jnp, vals_x, weight, pin)
                tail = gsum(perr * wrow)
            # shift-centre, then FINE-chunked Kahan (chunk 256): the
            # coarse default chunk leaves within-chunk plain sums whose
            # rounding at hot-key magnitudes exceeds the f64-fold budget
            shift = _compensated_shift(jnp, jax, vals_x, wrow, keys, G)
            resid = (vals_x - shift[keys]) * wrow
            rs, rc = _kahan_chunked(jax, jnp, resid, keys, G, pin,
                                    chunk=256, max_chunks=1024)
            s_, c_ = _compensated_finish(jnp, shift, rs, cntr, pin)
            c_ = c_ + rc
            if tail is not None:
                c_ = c_ + tail
            return (jax.lax.all_gather(s_, "dp", axis=0),
                    jax.lax.all_gather(c_, "dp", axis=0))

        outs = []
        for ai, (pname, payload_) in enumerate(agg_plans):
            if pname == "key":
                outs.append(None)
            elif pname == "count_star":
                outs.append(None)  # served by the exact limb counts
            elif pname == "asum":
                outs.append(comp_sum(aval_map[ai], live, weight=w))
            elif pname in ("aavg", "amean"):
                outs.append(comp_sum(aval_map[ai], live, weight=w))
            elif pname == "bsum":
                v = b_slots[payload_]
                outs.append(comp_sum(jnp.where(matched, v[idx], 0.0),
                                     matched))
            elif pname in ("bavg", "bmean"):
                v = b_slots[payload_]
                outs.append(comp_sum(jnp.where(matched, v[idx], 0.0),
                                     matched))
            elif pname in ("absum", "abavg", "abmean"):
                # sum over pairs f(a)g(b) = SUM_a f(a)*sumB_g[k(a)]; the
                # f32 product splits error-free through comp_sum's
                # two_prod weight path, and the B-side compensation rides
                # a second comp_sum (the tuples concatenate; the host
                # folds all four gathered parts in f64)
                base_c = SB + MB + XB
                vs = b_slots[base_c + 2 * payload_[1]]
                vc = b_slots[base_c + 2 * payload_[1] + 1]
                p1 = comp_sum(aval_map[ai], matched,
                              weight=jnp.where(matched, vs[idx], 0.0))
                p2 = comp_sum(aval_map[ai], matched,
                              weight=jnp.where(matched, vc[idx], 0.0))
                outs.append(p1 + p2)
            elif pname == "amin":
                outs.append(jax.lax.pmin(jax.ops.segment_min(
                    jnp.where(live, aval_map[ai], jnp.inf), keys,
                    num_segments=G), "dp"))
            elif pname == "amax":
                outs.append(jax.lax.pmax(jax.ops.segment_max(
                    jnp.where(live, aval_map[ai], -jnp.inf), keys,
                    num_segments=G), "dp"))
            elif pname == "bmin":
                v = b_slots[SB + payload_]
                outs.append(jax.lax.pmin(jax.ops.segment_min(
                    jnp.where(matched, v[idx], jnp.inf), keys,
                    num_segments=G), "dp"))
            else:  # bmax
                v = b_slots[SB + MB + payload_]
                outs.append(jax.lax.pmax(jax.ops.segment_max(
                    jnp.where(matched, v[idx], -jnp.inf), keys,
                    num_segments=G), "dp"))
        big = jnp.int32(2**31 - 1)
        kmins, kmaxs = [], []
        for ki in range(nkeys):
            ri = recva[1 + ki]
            kmins.append(jax.lax.pmin(jax.ops.segment_min(
                jnp.where(live, ri, big), keys, num_segments=G), "dp"))
            kmaxs.append(jax.lax.pmax(jax.ops.segment_max(
                jnp.where(live, ri, -big - 1), keys, num_segments=G),
                "dp"))
        return outs, climbs, kmins, kmaxs

    plan_key = ("sjoin_mesh", repr(sel), id(at), id(bt), na, nb, G,
                id(mesh))
    cache = getattr(conn, "_device_plan_cache", None)
    if cache is None:
        cache = {}
        conn._device_plan_cache = cache
    compiled = cache.get(plan_key)
    if compiled is None:
        in_specs = tuple(P("dp") for _ in range(
            4 + len(a_cols_used) + len(b_cols_used)))
        compiled = jax.jit(shard_map(local_fn, mesh=mesh,
                                     in_specs=in_specs, out_specs=P(),
                                     check_vma=False))
        if len(cache) >= 16:
            cache.pop(next(iter(cache)))
        cache[plan_key] = compiled

    shard = NamedSharding(mesh, P("dp"))

    def up(arr, n, n_pad):
        d = _canonical_host(np.asarray(arr))
        if n_pad > n:
            d = np.concatenate([d, np.zeros(n_pad - n, d.dtype)])
        return _put_sharded(d, shard)

    try:
        a_valid = _put_sharded(np.arange(na_pad) < na, shard)
        b_valid = _put_sharded(np.arange(nb_pad) < nb, shard)
        ka = up(np.asarray(ak.data, np.int64).astype(np.int32), na, na_pad)
        kb = up(np.asarray(bk.data, np.int64).astype(np.int32), nb, nb_pad)
        arrs = [up(a_low.used_columns[k].data, na, na_pad)
                for k in a_cols_used]
        arrs += [up(b_low.used_columns[k].data, nb, nb_pad)
                 for k in b_cols_used]
        outs, climbs, kmins, kmaxs = jax.device_get(
            compiled(a_valid, b_valid, ka, kb, *arrs))
    except Exception as e:
        from ..log import debug

        debug(f"shuffle_join mesh lowering fell back: {e!r}")
        return None

    conv = []
    for o in outs:
        if o is None:
            conv.append(None)
        elif isinstance(o, tuple):  # compensated per-device part tuples
            conv.append(sum(np.asarray(t, np.float64)
                            for t in o).sum(axis=0))
        else:
            conv.append(np.asarray(o, np.float64))
    count64 = sum(np.asarray(c, np.int64) << (8 * jj)
                  for jj, c in enumerate(climbs))
    acc_kmin = [np.asarray(k, np.int64) for k in kmins]
    acc_kmax = [np.asarray(k, np.int64) for k in kmaxs]
    return _assemble(sel, items_plan, agg_plans, conv, count64,
                     acc_kmin, acc_kmax, key_fns)
