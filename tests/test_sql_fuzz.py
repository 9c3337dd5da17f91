"""Parser/executor robustness: malformed SQL must raise SqlError (or parse
cleanly), never crash with arbitrary exceptions."""

import numpy as np
import pytest

from infera_tpu.errors import SqlError
from infera_tpu.sql import Connection


BAD_INPUTS = [
    "", ";;;", "select", "select from", "select * from",
    "select 1 +", "select (1", "select [1,", "select 'abc",
    "create table", "create table t (", "insert into", "drop",
    "select * from nonexistent_table_xyz",
    "select unknown_func(1)",
    "select unknown_column",
    "select 1 union select 1, 2",
    "select count(*) over from t",
    "select a.b.c.d", "select ~1", "select 1 ::",
    "explain", "select }{",
    "select * from t1 join",
    "select case when 1 then 2",
]


@pytest.mark.parametrize("sql", BAD_INPUTS)
def test_bad_sql_raises_sqlerror_only(sql):
    conn = Connection()
    try:
        conn.execute(sql)
    except SqlError:
        pass  # expected failure mode
    # a clean parse+execute is also acceptable for near-valid inputs


def test_random_token_soup_never_crashes():
    rng = np.random.default_rng(0)
    tokens = ["select", "from", "where", "group", "by", "order", "1", "'x'",
              "(", ")", ",", "+", "*", "=", "t", "f1", "::", "float",
              "count", "[", "]", "and", "null", "case", "union", "join",
              "over", "partition", ";", ".", "--", "0x", "1.5e", '"q"']
    conn = Connection()
    conn.execute("create table t as select 1.0::float as f1")
    for _ in range(300):
        n = rng.integers(1, 12)
        sql = " ".join(rng.choice(tokens, n))
        try:
            conn.execute(sql)
        except SqlError:
            pass
        except RecursionError:
            pytest.fail(f"recursion blowup on: {sql}")


def test_deeply_nested_expression():
    conn = Connection()
    sql = "select " + "(" * 50 + "1" + ")" * 50
    assert conn.execute(sql).rows == [(1,)]


def test_update_and_delete():
    from infera_tpu.sql import Connection

    conn = Connection()
    conn.execute("create table t as select x as id, (x * 2)::float as v "
                 "from range(10) r(x)")
    # UPDATE with WHERE, expression referencing old values
    rows = conn.execute("update t set v = v + 100 where id % 2 = 0").rows
    assert rows == [(5,)]
    got = conn.execute("select id, v from t order by id limit 4").rows
    assert got == [(0, 100.0), (1, 2.0), (2, 104.0), (3, 6.0)]
    # multi-assignment
    conn.execute("update t set v = 0, id = id + 100 where id >= 8")
    assert conn.execute("select count(*) from t where id >= 100").rows == [(2,)]
    # DELETE with WHERE
    rows = conn.execute("delete from t where v = 0").rows
    assert rows == [(2,)]
    assert conn.execute("select count(*) from t").rows == [(8,)]
    # unconditional DELETE empties the table, keeps the schema
    conn.execute("delete from t")
    assert conn.execute("select count(*) from t").rows == [(0,)]
    conn.execute("insert into t values (1, 5.0)")
    assert conn.execute("select * from t").rows == [(1, 5.0)]


def test_update_int_assignment_casts_to_column_type():
    from infera_tpu.sql import Connection

    conn = Connection()
    conn.execute("create table t as select x as id from range(3) r(x)")
    conn.execute("update t set id = id / 2")  # float div → cast back to BIGINT
    assert conn.execute("select id from t order by id").rows == [(0,), (0,), (1,)]


def test_update_missing_column_errors():
    import pytest

    from infera_tpu.errors import SqlError
    from infera_tpu.sql import Connection

    conn = Connection()
    conn.execute("create table t as select 1 as a")
    with pytest.raises(SqlError, match='Referenced column "zz" not found'):
        conn.execute("update t set zz = 1")


def test_statistical_aggregates():
    from infera_tpu.sql import Connection

    conn = Connection()
    conn.execute("create table s as select x % 4 as g, (x % 10)::float as v, "
                 "x % 2 = 0 as b from range(1000) r(x)")
    rows = conn.execute(
        "select g, median(v), var_samp(v), var_pop(v), stddev_pop(v), "
        "mode(v), bool_and(b), bool_or(b) from s group by g order by g").rows
    x = np.arange(1000)
    for kg, med, vs, vp, sp, mo, ba, bo in rows:
        m = x % 4 == kg
        v = (x[m] % 10).astype(np.float64)
        assert med == pytest.approx(float(np.median(v)))
        assert vs == pytest.approx(float(np.var(v, ddof=1)), rel=1e-9)
        assert vp == pytest.approx(float(np.var(v)), rel=1e-9)
        assert sp == pytest.approx(float(np.std(v)), rel=1e-9)
        # mode: ties broken by first occurrence
        vals, counts = np.unique(v, return_counts=True)
        assert counts[vals == mo][0] == counts.max()
        evens = (x[m] % 2 == 0)
        assert ba == bool(evens.all())
        assert bo == bool(evens.any())


def test_median_even_count_and_nulls():
    from infera_tpu.sql import Connection

    conn = Connection()
    conn.execute("create table m as select * from (values (1.0), (3.0), "
                 "(2.0), (10.0)) v(x)")
    assert conn.execute("select median(x) from m").rows == [(2.5,)]
    conn.execute("create table m2 as select * from (values (1.0), (NULL), "
                 "(5.0)) v(x)")
    assert conn.execute("select median(x) from m2").rows == [(3.0,)]


def test_count_distinct():
    """Regression: DISTINCT inside aggregates used to parse but be silently
    ignored. Now honored on the host path and rejected by fused plans."""
    from infera_tpu.sql import Connection

    conn = Connection()
    conn.execute("create table t as select x % 3 as g, x % 5 as v, "
                 "(x % 4)::float as f from range(30000) r(x)")
    rows = conn.execute(
        "select g, count(distinct v), count(v), sum(distinct f) "
        "from t group by g order by g").rows
    for kg, cd, c, sd in rows:
        assert cd == 5
        assert c == 10000
        assert sd == pytest.approx(0.0 + 1.0 + 2.0 + 3.0)
    # global form + avg(distinct)
    rows = conn.execute(
        "select count(distinct v), avg(distinct f) from t").rows
    assert rows == [(5, pytest.approx(1.5))]
    # strings
    conn.execute("create table s as select 'u' || (x % 7) as u from range(100) r(x)")
    assert conn.execute("select count(distinct u) from s").rows == [(7,)]


def test_bigint_sum_exact_past_2_53():
    """Regression: integer SUM accumulated in f64, silently losing exactness
    for totals beyond 2^53."""
    from infera_tpu.sql import Connection

    conn = Connection()
    big = (1 << 53) + 1  # not representable in f64
    conn.execute(f"create table t as select {big}::bigint as v, x % 2 as g "
                 f"from range(4) r(x)")
    rows = conn.execute("select g, sum(v) from t group by g order by g").rows
    assert rows == [(0, 2 * big), (1, 2 * big)]
    assert conn.execute("select sum(v) from t").rows == [(4 * big,)]
    # genuine int64 overflow raises instead of wrapping
    conn.execute("create table o as select 9000000000000000000::bigint as v "
                 "from range(3) r(x)")
    with pytest.raises(SqlError, match="overflow in SUM"):
        conn.execute("select sum(v) from o")


def test_with_ctes():
    from infera_tpu.sql import Connection

    conn = Connection()
    conn.execute("create table t as select x as v from range(20) r(x)")
    rows = conn.execute(
        "with big as (select v from t where v >= 10), "
        "agg (m, c) as (select max(v), count(*) from big) "
        "select m, c from agg").rows
    assert rows == [(19, 10)]
    # CTE chaining: second references first
    rows = conn.execute(
        "with a as (select v * 2 as w from t), "
        "b as (select w from a where w % 4 = 0) "
        "select count(*), sum(w) from b").rows
    x = [v * 2 for v in range(20)]
    wanted = [w for w in x if w % 4 == 0]
    assert rows == [(len(wanted), sum(wanted))]
    # CTE shadows a real table only inside the statement
    rows = conn.execute("with t as (select 1 as v) select count(*) from t").rows
    assert rows == [(1,)]
    assert conn.execute("select count(*) from t").rows == [(20,)]
    # CTE inside joins
    rows = conn.execute(
        "with dim as (select x as k, x * 10 as w from range(5) r(x)) "
        "select sum(w) from t join dim on t.v = dim.k").rows
    assert rows == [(100,)]


def test_approx_count_distinct():
    from infera_tpu.sql import Connection

    conn = Connection()
    n = 200000
    conn.execute(f"create table a as select x % 4 as g, x % 10000 as v, "
                 f"'s' || (x % 500) as s from range({n}) r(x)")
    rows = conn.execute(
        "select g, approx_count_distinct(v), count(distinct v) "
        "from a group by g order by g").rows
    for kg, approx, exact in rows:
        assert abs(approx - exact) <= 0.05 * exact, (kg, approx, exact)
    # strings + global form + small-range exactness
    rows = conn.execute(
        "select approx_count_distinct(s), approx_count_distinct(g) from a").rows
    assert abs(rows[0][0] - 500) <= 25
    assert rows[0][1] == 4  # small-range linear counting is near-exact


def test_prepared_statement_parameters(model_dir, clean_registry):
    import infera_tpu as it

    conn = Connection()
    conn.execute("create table t as select x as v, (x % 5)::float as f "
                 "from range(100) r(x)")
    rows = conn.execute("select count(*) from t where v < ? and f = ?",
                        parameters=[50, 2.0]).rows
    x = np.arange(100)
    want = int(((x < 50) & (x % 5 == 2)).sum())
    assert rows == [(want,)]
    # strings + model names through parameters
    it.load_model("linear", f"{model_dir}/linear.onnx")
    rows = conn.execute("select infera_predict(?, 1.0, 2.0, 3.0)",
                        parameters=["linear"]).rows
    assert rows[0][0] == pytest.approx(1.75, abs=1e-6)
    # unbound parameter errors clearly
    with pytest.raises(SqlError, match="parameter 1 was not bound"):
        conn.execute("select ? + 1")
    # NULL binding propagates
    assert conn.execute("select ?::integer is null",
                        parameters=[None]).rows == [(True,)]


def test_differential_device_vs_host_fuzz(monkeypatch):
    """Differential fuzz (round 4): random eligible aggregate queries must
    agree across the host path, the XLA device plan, and the forced pallas
    plan — the three tiers answer the same SQL."""
    import os

    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    rng = np.random.default_rng(42)
    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(
        f"create table ft as select x % 6 as g, x % 11 as iv, "
        f"(x % 97)::float / 7.0 as f, ((x * 13) % 53)::float / 5.0 as v "
        f"from range({n}) r(x)")
    host = Connection()
    host.catalog = conn.catalog

    agg_pool = [
        "count(*)", "sum(f)", "avg(v)", "min(f)", "max(v)", "stddev(f)",
        "median(v)", "quantile_cont(f, 0.25)", "count_if(f > 5.0)",
        "bool_and(f >= 0.0)", "bool_or(v > 10.0)",
        "product(1.0 + f / 5000.0)", "arg_min(iv, f)", "arg_max(iv, v)",
        "approx_count_distinct(iv)", "sum(iv)", "count(distinct iv)",
    ]
    wheres = ["", " where f > 3.0", " where v < 9.0 and f > 1.0",
              " where f + v > 6.0"]

    import infera_tpu.sql.device_plan as dp

    orig = dp.try_execute_on_device
    for trial in range(20):
        k = int(rng.integers(1, 4))
        aggs = list(rng.choice(agg_pool, size=k, replace=False))
        grouped = bool(rng.integers(0, 2))
        sel = ", ".join((["g"] if grouped else []) + aggs)
        q = (f"select {sel} from ft{rng.choice(wheres)}"
             + (" group by g order by g" if grouped else ""))
        outs = {}
        for mode in ("auto", "1", "host"):
            if mode == "host":
                monkeypatch.setattr(dp, "try_execute_on_device",
                                    lambda *a, **kw: None)
            else:
                monkeypatch.setattr(dp, "try_execute_on_device", orig)
                os.environ["INFERA_PALLAS_SQL"] = \
                    "1" if mode == "1" else "0"
            try:
                outs[mode] = (host if mode == "host" else conn).execute(q).rows
            finally:
                os.environ.pop("INFERA_PALLAS_SQL", None)
        base = outs["host"]
        for mode in ("auto", "1"):
            got = outs[mode]
            assert len(got) == len(base), q
            for a, b in zip(got, base):
                for x, y, label in zip(a, b, (["g"] if grouped else []) + aggs):
                    tol = 1e-3 if label.startswith("product") else 1e-5
                    if isinstance(y, float):
                        assert x == pytest.approx(y, rel=tol, abs=1e-6), \
                            (q, mode, label, x, y)
                    else:
                        assert x == y, (q, mode, label, x, y)


def test_vectorized_set_ops_match_loop_semantics():
    """Round 5 (VERDICT r4 item 4): EXCEPT/INTERSECT/DISTINCT above the
    row-code threshold must agree with the small-input tuple loop — first
    occurrence order, NULLs equal, numerics by value."""
    conn = Connection()
    n = 4096  # above _ROWCODE_MIN_ROWS
    conn.execute(f"create table sa as select x % 700 as a, "
                 f"case when x % 13 = 0 then NULL else (x % 5)::float end "
                 f"as b from range({n}) r(x)")
    conn.execute(f"create table sb as select x % 450 as a, "
                 f"case when x % 13 = 0 then NULL else (x % 5)::float end "
                 f"as b from range({n // 2}) r(x)")
    for kind in ("except", "intersect"):
        big = conn.execute(
            f"select a, b from sa {kind} select a, b from sb").rows
        # loop-path oracle: shrink below the threshold with the same rows
        want = []
        seen = set()
        lrows = conn.execute("select a, b from sa").rows
        rset = set(conn.execute("select a, b from sb").rows)
        for r in lrows:
            inr = r in rset
            if ((kind == "except" and not inr)
                    or (kind == "intersect" and inr)) and r not in seen:
                seen.add(r)
                want.append(r)
        assert big == want, kind
    got = conn.execute("select distinct a, b from sa").rows
    seen = set()
    want = []
    for r in conn.execute("select a, b from sa").rows:
        if r not in seen:
            seen.add(r)
            want.append(r)
    assert got == want


def test_order_by_limit_truncated_gather():
    """ORDER BY ... LIMIT gathers only offset+limit rows; results match
    the full sort prefix incl. ties (stable sort) and NULL ordering."""
    conn = Connection()
    n = 1 << 16  # above the device sort threshold
    conn.execute(f"create table tk as select (x * 2654435761) % 1000 as k, "
                 f"x as rid, case when x % 997 = 0 then NULL else "
                 f"(x % 317)::float end as v from range({n}) r(x)")
    full = conn.execute("select k, rid from tk order by k, rid").rows
    top = conn.execute("select k, rid from tk order by k, rid limit 25").rows
    assert top == full[:25]
    off = conn.execute("select k, rid from tk order by k, rid "
                       "limit 10 offset 40").rows
    assert off == full[40:50]
    # DESC + NULLS (default: NULLS FIRST for DESC)
    fulld = conn.execute("select v, rid from tk order by v desc, rid").rows
    topd = conn.execute("select v, rid from tk order by v desc, rid "
                        "limit 30").rows
    assert topd == fulld[:30]


def test_join_on_clause_side_order_irrelevant():
    """Round-5 fix: ON a.k = b.k must bind identically to ON b.k = a.k even
    when the bare key name exists on both tables (the bare-name fallback
    used to misassign sides for the qualified refs)."""
    conn = Connection()
    conn.execute("create table ja as select x % 10 as k, x as v "
                 "from range(50) r(x)")
    conn.execute("create table jb as select x as k, x * 2 as w "
                 "from range(8) r(x)")
    for kind in ("join", "left join", "right join", "full join"):
        a = conn.execute(f"select count(*), sum(w) from ja {kind} jb "
                         f"on ja.k = jb.k").rows
        b = conn.execute(f"select count(*), sum(w) from ja {kind} jb "
                         f"on jb.k = ja.k").rows
        assert a == b, (kind, a, b)


def test_differential_predict_tiers_fuzz(monkeypatch, tmp_path,
                                         clean_registry):
    """Differential fuzz over MODEL-bearing aggregates (round 5): random
    queries mixing GBT-forest and MLP predictions agree across host, XLA
    device plan, and the forced pallas plan — the in-kernel GEMM forest
    answers exactly like the ONNX executor."""
    import os

    import infera_tpu as it
    from infera_tpu.onnx.builder import gbt_regressor_model, mlp_model
    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    rng = np.random.default_rng(19)
    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(
        f"create table pt as select x % 5 as g, (x % 89)::float / 8.0 as a, "
        f"((x * 7) % 67)::float / 6.0 as b, ((x * 3) % 43)::float / 4.0 as c "
        f"from range({n}) r(x)")
    p1 = tmp_path / "fg.onnx"
    p1.write_bytes(gbt_regressor_model(
        n_features=3, n_trees=9, depth=4, seed=23).serialize())
    it.load_model("fg", str(p1))
    p2 = tmp_path / "fm.onnx"
    p2.write_bytes(mlp_model(in_dim=3, hidden=(16,), out_dim=1).serialize())
    it.load_model("fm", str(p2))
    host = Connection()
    host.catalog = conn.catalog

    preds = ["infera_predict('fg', a, b, c)", "infera_predict('fm', a, b, c)"]
    agg_pool = [f"{f}({p})" for f in ("sum", "avg", "min", "max")
                for p in preds] + ["count(*)"]
    wheres = ["", " where a > 2.0",
              f" where {preds[0]} > 0.0", f" where {preds[1]} < 50.0"]

    import infera_tpu.sql.device_plan as dp

    orig = dp.try_execute_on_device
    for trial in range(10):
        k = int(rng.integers(1, 4))
        aggs = list(rng.choice(agg_pool, size=k, replace=False))
        grouped = bool(rng.integers(0, 2))
        sel = ", ".join((["g"] if grouped else []) + aggs)
        q = (f"select {sel} from pt{rng.choice(wheres)}"
             + (" group by g order by g" if grouped else ""))
        outs = {}
        for mode in ("auto", "1", "host"):
            if mode == "host":
                monkeypatch.setattr(dp, "try_execute_on_device",
                                    lambda *a, **kw: None)
            else:
                monkeypatch.setattr(dp, "try_execute_on_device", orig)
                os.environ["INFERA_PALLAS_SQL"] = \
                    "1" if mode == "1" else "0"
            try:
                outs[mode] = (host if mode == "host" else conn).execute(q).rows
            finally:
                os.environ.pop("INFERA_PALLAS_SQL", None)
        base = outs["host"]
        for mode in ("auto", "1"):
            got = outs[mode]
            assert len(got) == len(base), q
            for a, b in zip(got, base):
                for x, y in zip(a, b):
                    if isinstance(y, float):
                        assert x == pytest.approx(y, rel=1e-5, abs=1e-6), \
                            (q, mode, x, y)
                    else:
                        assert x == y, (q, mode, x, y)


def test_differential_join_tiers_fuzz(monkeypatch):
    """Differential fuzz over the JOIN tiers: random fact→dim INNER and
    LEFT join aggregates agree across the host join, the XLA join plan,
    and the pallas join plan (round 5 added outer joins to the kernel)."""
    import os

    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    rng = np.random.default_rng(7)
    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(f"create table jf as select x % 120 as k, x % 6 as g, "
                 f"(x % 41)::float / 4.0 as v from range({n}) r(x)")
    conn.execute("create table jd as select x as k, (x * 3)::float as w, "
                 "x % 4 as cat from range(100) r(x)")
    host = Connection()
    host.catalog = conn.catalog
    agg_pool = ["count(*)", "sum(v)", "sum(w)", "sum(v * w)", "avg(w)",
                "min(v)", "max(w)"]
    # LEFT joins: dim-side group keys would be NULL on unmatched rows
    # (host-only), so outer trials group by the FACT side
    left_aggs = ["count(*)", "count(w)", "sum(v)", "sum(w)", "avg(w)",
                 "min(w)", "max(w)"]
    wheres = ["", " where v > 2.0", " where v + 1.0 < 9.0"]

    import infera_tpu.sql.device_join_plan as djp

    orig = djp.try_execute_join_on_device
    for trial in range(20):
        outer = trial >= 12
        pool = left_aggs if outer else agg_pool
        k = int(rng.integers(1, 4))
        aggs = list(rng.choice(pool, size=k, replace=False))
        grouped = bool(rng.integers(0, 2))
        gkey = "g" if outer else "cat"
        sel = ", ".join(([gkey] if grouped else []) + aggs)
        kind = "left join" if outer else "join"
        q = (f"select {sel} from jf {kind} jd on jf.k = jd.k"
             f"{rng.choice(wheres)}"
             + (f" group by {gkey} order by {gkey}" if grouped else ""))
        outs = {}
        for mode in ("auto", "1", "host"):
            if mode == "host":
                monkeypatch.setattr(djp, "try_execute_join_on_device",
                                    lambda *a, **kw: None)
            else:
                monkeypatch.setattr(djp, "try_execute_join_on_device", orig)
                os.environ["INFERA_PALLAS_SQL"] = \
                    "1" if mode == "1" else "0"
            try:
                outs[mode] = (host if mode == "host" else conn).execute(q).rows
            finally:
                os.environ.pop("INFERA_PALLAS_SQL", None)
        base = outs["host"]
        for mode in ("auto", "1"):
            got = outs[mode]
            assert len(got) == len(base), q
            for a, b in zip(got, base):
                for x, y in zip(a, b):
                    if isinstance(y, float):
                        assert x == pytest.approx(y, rel=1e-5, abs=1e-6), \
                            (q, mode, x, y)
                    else:
                        assert x == y, (q, mode, x, y)


def test_set_ops_nan_semantics_match_loop():
    """Round-5 review fix: NaN != NaN in the tuple-loop set-op path, so
    the vectorized row codes give every NaN row a unique code — DISTINCT
    over NaNs must not collapse above the vectorization threshold."""
    conn = Connection()
    conn.execute("create table nb as select sqrt(-1.0) as v "
                 "from range(4096) r(x)")
    big = conn.execute("select count(*) from (select distinct v from nb) "
                       "t").rows[0][0]
    conn.execute("create table ns as select sqrt(-1.0) as v "
                 "from range(100) r(x)")
    small = conn.execute("select count(*) from (select distinct v from ns)"
                         " t").rows[0][0]
    assert big == 4096 and small == 100  # every NaN distinct, both paths
