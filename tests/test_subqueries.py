"""IN (SELECT ...) / EXISTS subqueries with lazy decorrelation
(executor._run_subquery): the uncorrelated fast path executes once;
correlated queries re-run per outer row through a correlation frame."""

import numpy as np
import pytest

from infera_tpu.errors import SqlError
from infera_tpu.sql import Connection


@pytest.fixture()
def conn():
    c = Connection()
    c.execute("create table t as select x as v, x % 3 as g from range(10) r(x)")
    c.execute("create table u as select x * 2 as w from range(4) r(x)")
    return c


def test_in_subquery(conn):
    rows = conn.execute("select v from t where v in (select w from u)").rows
    assert [r[0] for r in rows] == [0, 2, 4, 6]
    rows = conn.execute(
        "select v from t where v not in (select w from u) and v < 5").rows
    assert [r[0] for r in rows] == [1, 3]


def test_in_subquery_null_semantics():
    c = Connection()
    c.execute("create table a (v INTEGER)")
    c.execute("insert into a values (1), (2), (NULL)")
    c.execute("create table b (w INTEGER)")
    c.execute("insert into b values (1), (NULL)")
    # v IN (1, NULL): 1→true, 2→NULL (no match + NULL present), NULL→NULL
    rows = c.execute("select v, v in (select w from b) m from a").rows
    got = {r[0]: r[1] for r in rows}
    assert got[1] is True and got[2] is None and got[None] is None
    # NOT IN keeps NULL as NULL: only definite non-members survive — none
    rows = c.execute(
        "select v from a where v not in (select w from b)").rows
    assert rows == []


def test_exists_correlated(conn):
    rows = conn.execute(
        "select v from t where exists (select 1 from u where u.w = t.v)"
    ).rows
    assert [r[0] for r in rows] == [0, 2, 4, 6]
    rows = conn.execute(
        "select v from t where not exists "
        "(select 1 from u where u.w = t.v) and v < 5").rows
    assert [r[0] for r in rows] == [1, 3]


def test_exists_uncorrelated_and_empty(conn):
    (row,) = conn.execute(
        "select count(*) from t where exists (select 1 from u)").rows
    assert row[0] == 10
    (row,) = conn.execute(
        "select count(*) from t where exists "
        "(select 1 from u where w > 100)").rows
    assert row[0] == 0


def test_correlated_scalar_subquery(conn):
    rows = conn.execute(
        "select v, (select max(w) from u where u.w <= t.v) m "
        "from t where v < 4 order by v").rows
    assert rows == [(0, 0), (1, 0), (2, 2), (3, 2)]


def test_correlated_in_subquery(conn):
    # membership set depends on the outer row's g
    rows = conn.execute(
        "select v from t where v in (select w from u where u.w < t.g * 3) "
        "order by v").rows
    # g = v % 3; set = even numbers < 3g: v=2 (g=2, set {0,2,4<6}), ...
    x = np.arange(10)
    want = [int(v) for v in x
            if v in {w for w in (0, 2, 4, 6) if w < (v % 3) * 3}]
    assert [r[0] for r in rows] == want


def test_unknown_column_still_errors(conn):
    with pytest.raises(SqlError, match="Referenced column"):
        conn.execute("select v from t where v in (select nope from u)")


def test_correlated_case_memoization_uses_all_refs():
    # ADVICE r3 (low): the memo key must cover the UNION of outer columns
    # read across rows — a CASE subquery whose row-0 execution reads (a,b)
    # must not cache-hit on (a,b) for a row whose result depends on c.
    c = Connection()
    c.execute("create table o (a INTEGER, b INTEGER, c INTEGER)")
    # row0: a>0 -> reads b (=10); row1: same (a,b) but c differs AND a<=0
    # -> reads c; row2: duplicate of row0's (a,b) with c different -> must
    # still produce 10 (depends only on a,b down that branch)
    c.execute("insert into o values (1, 10, 99), (0, 10, 7), (1, 10, 55)")
    rows = c.execute(
        "select (select case when o.a > 0 then o.b else o.c end) from o").rows
    assert [r[0] for r in rows] == [10, 7, 10]


def test_correlated_ref_never_binds_inner_on_device_plan():
    """Round-5 fix: the device plan's bare-name column fallback captured
    OTHER tables' qualified refs — `o.k` inside a correlated subquery
    bound to the inner `i.k`, turning the correlation into a tautology
    and the subquery into its GLOBAL aggregate (silently wrong counts on
    any device-eligible inner table)."""
    import numpy as np

    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    c = Connection()
    n = MIN_DEVICE_ROWS * 4
    c.execute(f"create table oc as select x % 300 as k, "
              f"((x % 300) * 100 + (x % 50) - 25)::float as v "
              f"from range({n}) r(x)")
    c.execute(f"create table ic as select x % 300 as k, "
              f"((x % 300) * 100)::float + (x % 9) as w from range({n}) r(x)")
    rows = c.execute(
        "select count(*) from oc where v > "
        "(select avg(w) from ic i where i.k = oc.k)").rows
    x = np.arange(n)
    k = x % 300
    v = (k * 100 + (x % 50) - 25).astype(np.float64)
    w = (k * 100).astype(np.float64) + (x % 9)
    avg = np.zeros(300)
    np.add.at(avg, k, w)
    avg /= np.bincount(k, minlength=300)
    assert rows[0][0] == int((v > avg[k]).sum())


def test_grouped_decorrelation_matches_nested_loop(monkeypatch):
    """Round 5: equality-correlated aggregate subqueries execute ONCE as
    a grouped select; results (incl. empty groups → aggregate-over-empty
    and NULL keys → no match) must equal the nested-loop semantics."""
    import infera_tpu.sql.executor as E

    c = Connection()
    c.execute("create table o2 as select x % 40 as k, x as r, "
              "(x % 13)::float as v from range(400) r(x)")
    # inner covers only HALF the outer keys; some NULL keys too
    c.execute("create table i2 as select case when x % 3 = 0 then NULL "
              "else x % 20 end as k, (x % 7)::float as w "
              "from range(300) r(x)")
    qs = [
        "select o2.r, (select sum(w) from i2 where i2.k = o2.k) s "
        "from o2 order by o2.r limit 80",
        "select o2.r, (select count(*) from i2 where i2.k = o2.k) c "
        "from o2 order by o2.r limit 80",
        "select count(*) from o2 where exists "
        "(select max(w) from i2 where i2.k = o2.k and i2.w > 5.0)",
        "select o2.r, (select avg(w) from i2 where i2.k = o2.k "
        "and i2.w < 4.0) a from o2 order by o2.r limit 60",
    ]
    got = [c.execute(q).rows for q in qs]
    with monkeypatch.context() as m:
        m.setattr(E.Connection, "_try_decorrelate_grouped",
                  lambda self, q, s, col: None)
        want = [c.execute(q).rows for q in qs]
    assert got == want
