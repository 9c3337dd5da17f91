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
