"""Streaming fused aggregation: out-of-core tables through a fixed HBM
footprint.

device_plan.py fuses a whole aggregate query into one XLA program but
uploads every referenced column to HBM and is capped at 2^24 rows (f32
count exactness). This module lifts both limits for the same query shapes:
the scan iterates fixed-size row chunks (memmap-friendly — each chunk is
the only resident slice), a single jitted step computes per-chunk partial
segment aggregates on device, and the host folds partials in f64 (exact
counts/sums far past 2^24). JAX's async dispatch overlaps chunk k+1's
host→device copy with chunk k's compute (ops/streaming.py design).

Eligibility mirrors device_plan (single base table, numeric exprs,
count/sum/avg/min/max, optional integer GROUP BY keys — streaming probes
key maxima host-side, so keys must be plain column references).

Integer aggregates are EXACT (round-2): sum/avg over a plain int column
ride to device as (lo32, hi32) two's-complement words, 8-bit limbs
segment-sum in int32 (2^20 rows x 255 < 2^28 — no rounding), and the host
folds limbs into int64 with a mod-2^64 reconstruction; min/max reduce
lexicographically on (hi, lo-as-unsigned). An f32 magnitude estimate guards
genuine int64 overflow (same SqlError as the host path).
"""

from __future__ import annotations

import numpy as np

from ..columnar import Column, Table
from ..columnar import types as T
from . import ast as A
from .device_plan import _AGG_NAMES, MAX_GROUPS, _find_aggs, _Lowerer, _Unsupported

# stream only when the table is big enough that whole-column upload hurts
STREAM_MIN_ROWS = 1 << 22
CHUNK_ROWS = 1 << 20


def try_execute_streaming(conn, sel: A.Select, table: Table,
                          analyze_only: bool = False):
    """Chunked fused aggregation; returns a Table or None (host fallback)."""
    if (
        sel.from_ is None
        or table.num_rows < STREAM_MIN_ROWS
        or sel.having is not None
        or sel.distinct
        or len(sel.group_by) > 4
    ):
        return None

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
    # group keys must be plain integer column refs (host-side probe + exact
    # combine); anything else stays on the non-streaming paths
    for g in sel.group_by:
        if not isinstance(g, A.ColumnRef):
            return None

    import jax
    import jax.numpy as jnp

    lowerer = _Lowerer(table)

    def _float_only(expr: A.Expr) -> bool:
        """sum/avg/min/max accumulate in f32 per chunk — only float-typed
        columns keep exactness guarantees; integer aggregates stay on the
        host path (mirrors device_plan's gate)."""
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

    int_cols: set = set()
    try:
        where_fn = lowerer.lower(sel.where) if sel.where is not None else None
        key_fns = [lowerer.lower(g) for g in sel.group_by]
        key_keys = [lowerer._column(g.name, g.table) for g in sel.group_by]
        agg_plans = []
        for kind, node in items_plan:
            if kind == "key":
                agg_plans.append(("key", node))
                continue
            name = node.name.lower()
            if name not in ("count", "sum", "avg", "mean", "min", "max"):
                return None  # var/stddev family: non-streaming plans only
            if node.is_star or not node.args:
                if name != "count":
                    return None
                agg_plans.append(("count_star", None))
                continue
            # exact int64 path: sum/avg/min/max over a plain integer column
            # ride to device as (lo32, hi32) word pairs — sums via 8-bit-limb
            # int32 segment sums (exact), min/max via lexicographic (hi, lo)
            arg = node.args[0]
            int_key = None
            if name in ("sum", "avg", "mean", "min", "max") and isinstance(
                    arg, A.ColumnRef):
                key = lowerer._column(arg.name, arg.table)
                col = table.columns[key]
                if col.validity is None and (
                        col.sql_type.is_integer or col.data.dtype.kind in "iu"):
                    int_key = key
            if int_key is not None:
                int_cols.add(int_key)
                iname = {"sum": "isum", "avg": "iavg", "mean": "iavg",
                         "min": "imin", "max": "imax"}[name]
                agg_plans.append((iname, int_key))
            else:
                if name != "count" and not _float_only(node.args[0]):
                    return None
                agg_plans.append((name, lowerer.lower(node.args[0])))
    except _Unsupported:
        return None
    for k in key_keys:
        c = table.columns[k]
        if not (c.sql_type.is_integer or c.data.dtype.kind in "iu"):
            return None

    if analyze_only:
        return True

    n = table.num_rows
    # host-side key probe (memmap streams from disk; np handles it)
    radices, mins = [], []
    for k in key_keys:
        data = table.columns[k].data
        lo = int(data.min()) if n else 0
        hi = int(data.max()) if n else 0
        if lo < 0 or hi >= (1 << 31):
            return None
        radices.append(hi + 1)
        mins.append(lo)
    domain = 1
    for r in radices:
        domain = min(domain * r, 1 << 40)
    n_groups = 1
    if key_fns:
        n_groups = 8
        while n_groups < domain and n_groups < MAX_GROUPS:
            n_groups <<= 1
    strides = [1] * len(radices)
    for i in range(len(radices) - 2, -1, -1):
        strides[i] = strides[i + 1] * radices[i + 1]

    col_names = sorted(lowerer.used_columns)
    int_col_names = sorted(int_cols)
    INT32_MIN = np.int32(-(1 << 31))
    INT32_MAX = np.int32((1 << 31) - 1)

    def step(valid, *arrays):
        cols = dict(zip(col_names, arrays[: len(col_names)]))
        int_pairs = {}
        for i, k in enumerate(int_col_names):
            base = len(col_names) + 2 * i
            int_pairs[k] = (arrays[base], arrays[base + 1])
        mask = valid
        if where_fn is not None:
            mask = mask & jnp.asarray(where_fn(cols), bool)
        if key_fns:
            combined = jnp.zeros(CHUNK_ROWS, jnp.int32)
            for kf, stride in zip(key_fns, strides):
                combined = combined + (
                    jnp.asarray(kf(cols), jnp.int32) * np.int32(stride & 0x7FFFFFFF))
            keys = jnp.asarray(jnp.mod(combined, n_groups), jnp.int32)
        else:
            keys = jnp.zeros(CHUNK_ROWS, jnp.int32)
        w = mask.astype(jnp.float32)
        # GEMM group-by for the chunk's aggregate tail (see device_plan)
        from ..ops import gemm_groupby as GG

        use_gemm = GG.eligible(CHUNK_ROWS, n_groups)

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
        key_mins, key_maxs = [], []
        big = jnp.int32(2**31 - 1)
        for kf in key_fns:
            ri = jnp.asarray(kf(cols), jnp.int32)
            if use_gemm:
                kmn, kmx = GG.segment_minmax_int32(
                    jnp, jax, ri, keys, n_groups, mask)
                key_mins.append(kmn)
                key_maxs.append(kmx)
                continue
            key_mins.append(jax.ops.segment_min(
                jnp.where(mask, ri, big), keys, num_segments=n_groups))
            key_maxs.append(jax.ops.segment_max(
                jnp.where(mask, ri, -big - 1), keys, num_segments=n_groups))
        for name, fn in agg_plans:
            if name == "key":
                outs.append(None)
                continue
            if name in ("count_star", "count"):
                outs.append(w_sum())
                continue
            if name in ("isum", "iavg"):
                # exact int64 SUM: 8-bit limb sums (int_agg semantics);
                # under GEMM the 8 limb rows share one one-hot chunk scan
                from .int_agg import device_limb_sums

                lo, hi = int_pairs[fn]
                limbs, est = device_limb_sums(
                    jnp, jax, lo, hi, mask.astype(jnp.int32), keys,
                    n_groups, gg=GG if use_gemm else None)
                # historical layout: [8, G] limb stack
                outs.append((jnp.transpose(limbs), est))
                continue
            if name in ("imin", "imax"):
                # lexicographic (hi, lo-as-unsigned): exact int64 extrema
                # without 64-bit arithmetic
                from .int_agg import device_lex_minmax

                lo, hi = int_pairs[fn]
                sel_hi, sel_lo = device_lex_minmax(
                    jnp, jax, lo, hi, mask, keys, n_groups,
                    name == "imin", gg=GG if use_gemm else None)
                outs.append((sel_hi, sel_lo))
                continue
            vals = jnp.asarray(fn(cols), jnp.float32)
            if name == "sum":
                outs.append(segsum(vals * w))
            elif name in ("avg", "mean"):
                outs.append((segsum(vals * w), w_sum()))
            elif name == "min":
                if use_gemm:
                    (mn,), _ = GG.segment_minmax(
                        jnp, jax, [vals], keys, n_groups, [mask])
                    outs.append(mn)
                else:
                    outs.append(jax.ops.segment_min(
                        jnp.where(mask, vals, jnp.inf), keys,
                        num_segments=n_groups))
            elif name == "max":
                if use_gemm:
                    _, (mx,) = GG.segment_minmax(
                        jnp, jax, [vals], keys, n_groups, [mask])
                    outs.append(mx)
                else:
                    outs.append(jax.ops.segment_max(
                        jnp.where(mask, vals, -jnp.inf), keys,
                        num_segments=n_groups))
        group_count = w_sum()
        return outs, group_count, key_mins, key_maxs

    # --- mesh-partitioned streaming (round-3: streaming ∘ mesh) ----------
    # Each dp device scans its row-range of every chunk (global chunk =
    # CHUNK_ROWS × ndev, fixed per-device HBM footprint), computes the same
    # per-chunk partial group table, and the partials merge ACROSS DEVICES
    # inside the program with one psum/pmin/pmax tree over ICI — exact for
    # every aggregate kind (int64 limb partials widen to 16-bit halves
    # first). Outputs come back replicated, so the f64 host fold below is
    # byte-identical to the single-device path, and the whole thing works
    # across jax.distributed processes (mesh_plan._put_sharded uploads).
    from .mesh_plan import _put_sharded, get_mesh

    conn._mesh_plan_used = False
    mesh = get_mesh(conn)
    ndev = int(mesh.shape["dp"]) if mesh is not None else 1
    if ndev > 1:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        INT32_MIN_ = np.int32(-(1 << 31))
        INT32_MAX_ = np.int32((1 << 31) - 1)
        local_step = step  # the per-CHUNK_ROWS body becomes the per-device fn

        def mesh_step(valid, *arrays):
            outs, gcount, kmins, kmaxs = local_step(valid, *arrays)
            psum = lambda a: jax.lax.psum(a, "dp")  # noqa: E731
            pmin = lambda a: jax.lax.pmin(a, "dp")  # noqa: E731
            pmax = lambda a: jax.lax.pmax(a, "dp")  # noqa: E731
            m_outs = []
            for (name, _), o in zip(agg_plans, outs):
                if o is None:
                    m_outs.append(None)
                elif name in ("count", "count_star", "sum"):
                    m_outs.append(psum(o))
                elif name in ("avg", "mean"):
                    m_outs.append((psum(o[0]), psum(o[1])))
                elif name in ("isum", "iavg"):
                    limbs, est = o  # [8, G] int32, each < 2^28
                    lo16 = jnp.bitwise_and(limbs, 0xFFFF)
                    hi16 = jnp.right_shift(limbs, 16)
                    m_outs.append((psum(lo16), psum(hi16), psum(est)))
                elif name in ("imin", "imax"):
                    hi_, lo_ = o
                    red = pmin if name == "imin" else pmax
                    fill = INT32_MAX_ if name == "imin" else INT32_MIN_
                    m_hi = red(hi_)
                    m_lo = red(jnp.where(hi_ == m_hi, lo_, fill))
                    m_outs.append((m_hi, m_lo))
                elif name == "min":
                    m_outs.append(pmin(o))
                else:  # max
                    m_outs.append(pmax(o))
            gcount = psum(gcount)
            kmins = [pmin(k) for k in kmins]
            kmaxs = [pmax(k) for k in kmaxs]
            return m_outs, gcount, kmins, kmaxs

        step = shard_map(mesh_step, mesh=mesh,
                         in_specs=P("dp"), out_specs=P(), check_vma=False)
        chunk_sharding = NamedSharding(mesh, P("dp"))
        conn._mesh_plan_used = True

    rows_per_step = CHUNK_ROWS * ndev

    plan_key = ("stream", repr(sel), tuple(col_names), n_groups,
                tuple(sorted((nm, id(m)) for nm, m in lowerer.models.items())),
                ("mesh", id(mesh)) if ndev > 1 else ())
    cache = getattr(conn, "_device_plan_cache", None)
    if cache is None:
        cache = {}
        conn._device_plan_cache = cache
    step_jit = cache.get(plan_key)
    if step_jit is None:
        step_jit = jax.jit(step)
        if len(cache) >= 16:
            cache.pop(next(iter(cache)))
        cache[plan_key] = step_jit

    # fold partials in f64 on the host — exact counts/sums past 2^24 rows
    acc_outs = None
    acc_count = None
    acc_kmin = [np.full(n_groups, 2**31 - 1, np.int64) for _ in key_fns]
    acc_kmax = [np.full(n_groups, -(2**31), np.int64) for _ in key_fns]
    host_cols = {k: lowerer.used_columns[k].data for k in col_names}
    int_host = {k: table.columns[k].data for k in int_col_names}

    def fold(res):
        nonlocal acc_outs, acc_count
        # ONE batched device→host transfer per chunk (see device_plan.py)
        outs, gcount, kmins, kmaxs = jax.device_get(res)
        conv = []
        for (name, _), o in zip(agg_plans, outs):
            if o is None:
                conv.append(None)
            elif name in ("isum", "iavg"):
                if len(o) == 3:  # mesh: 16-bit-widened limb halves
                    o = (np.asarray(o[0], np.int64)
                         + (np.asarray(o[1], np.int64) << 16), o[2])
                conv.append((np.asarray(o[0], np.int64),
                             np.asarray(o[1], np.float64)))
            elif name in ("imin", "imax"):
                conv.append((np.asarray(o[0], np.int32),
                             np.asarray(o[1], np.int32)))
            elif isinstance(o, tuple):
                conv.append((np.asarray(o[0], np.float64),
                             np.asarray(o[1], np.float64)))
            else:
                conv.append(np.asarray(o, np.float64))
        outs = conv
        gcount = np.asarray(gcount, np.float64)
        if acc_outs is None:
            acc_outs = outs
            acc_count = gcount
        else:
            for i, (name, _) in enumerate(agg_plans):
                if outs[i] is None:
                    continue
                if name in ("avg", "mean", "isum", "iavg"):
                    acc_outs[i] = (acc_outs[i][0] + outs[i][0],
                                   acc_outs[i][1] + outs[i][1])
                elif name == "imin":
                    ah, al = acc_outs[i]
                    nh, nl = outs[i]
                    better = (nh < ah) | ((nh == ah) & (nl < al))
                    acc_outs[i] = (np.where(better, nh, ah),
                                   np.where(better, nl, al))
                elif name == "imax":
                    ah, al = acc_outs[i]
                    nh, nl = outs[i]
                    better = (nh > ah) | ((nh == ah) & (nl > al))
                    acc_outs[i] = (np.where(better, nh, ah),
                                   np.where(better, nl, al))
                elif name == "min":
                    acc_outs[i] = np.minimum(acc_outs[i], outs[i])
                elif name == "max":
                    acc_outs[i] = np.maximum(acc_outs[i], outs[i])
                else:
                    acc_outs[i] = acc_outs[i] + outs[i]
            acc_count = acc_count + gcount
        for j in range(len(key_fns)):
            acc_kmin[j] = np.minimum(acc_kmin[j], np.asarray(kmins[j], np.int64))
            acc_kmax[j] = np.maximum(acc_kmax[j], np.asarray(kmaxs[j], np.int64))

    try:
        in_flight = []
        for start in range(0, n, rows_per_step):
            stop = min(start + rows_per_step, n)
            valid = np.zeros(rows_per_step, bool)
            valid[: stop - start] = True
            chunk_arrays = []
            for k in col_names:
                part = np.asarray(host_cols[k][start:stop])
                if len(part) < rows_per_step:
                    part = np.concatenate([
                        part,
                        np.zeros((rows_per_step - len(part),) + part.shape[1:],
                                 part.dtype)])
                chunk_arrays.append(part)
            for k in int_col_names:
                v = np.asarray(int_host[k][start:stop]).astype(np.int64)
                if len(v) < rows_per_step:
                    v = np.concatenate([v, np.zeros(rows_per_step - len(v),
                                                    np.int64)])
                # two's-complement word split: device works in int32 only
                chunk_arrays.append(
                    (v & np.int64(0xFFFFFFFF)).astype(np.uint32).view(np.int32))
                chunk_arrays.append((v >> 32).astype(np.int32))
            if ndev > 1:
                # row-shard the global chunk over dp (process-local shards
                # in the multi-process case); per-device HBM footprint stays
                # CHUNK_ROWS regardless of table size
                valid = _put_sharded(valid, chunk_sharding)
                chunk_arrays = [_put_sharded(a, chunk_sharding)
                                for a in chunk_arrays]
            in_flight.append(step_jit(valid, *chunk_arrays))
            if len(in_flight) >= 2:  # keep one chunk in flight (overlap)
                fold(in_flight.pop(0))
        for res in in_flight:
            fold(res)
    except Exception:
        return None  # any trace/compile issue → host path

    live = acc_count > 0 if key_fns else np.array([True])
    for j in range(len(key_fns)):
        if (acc_kmin[j][live] != acc_kmax[j][live]).any():
            return None  # modulo bucket held distinct keys — host path

    out_cols: dict = {}
    for (kind, node), (pname, _), res in zip(items_plan, agg_plans, acc_outs):
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
        if pname in ("count", "count_star"):
            out_cols[name] = Column(res[live].astype(np.int64), T.BIGINT)
        elif pname in ("isum", "iavg"):
            limbs, est = res
            u = np.zeros(limbs.shape[1], np.uint64)
            for j in range(8):
                u = u + (limbs[j].astype(np.uint64) << np.uint64(8 * j))
            signed = u.astype(np.int64)  # mod-2^64 fold → two's complement
            if pname == "isum":
                if (est[live] >= 2.0**62).any():
                    from ..errors import SqlError

                    raise SqlError("Out of Range Error: overflow in SUM(BIGINT)")
                out_cols[name] = Column(signed[live], T.BIGINT)
            else:
                if (est[live] >= 2.0**62).any():
                    return None  # exact sum impossible → host path
                c = acc_count
                vals = (signed[live].astype(np.float64)
                        / np.where(c[live] == 0, 1.0, c[live]))
                out_cols[name] = Column(vals, T.DOUBLE)
        elif pname in ("imin", "imax"):
            hi_, lob = res
            lo_u = ((lob.astype(np.int64) ^ -(np.int64(1) << 31))
                    & np.int64(0xFFFFFFFF))
            vals = (hi_.astype(np.int64) << 32) + lo_u
            out_cols[name] = Column(vals[live], T.BIGINT)
        elif pname in ("avg", "mean"):
            s, c = res
            vals = s[live] / np.where(c[live] == 0, 1.0, c[live])
            out_cols[name] = Column(vals, T.DOUBLE)
        else:
            out_cols[name] = Column(res[live].astype(np.float64), T.DOUBLE)
    return Table(out_cols)
