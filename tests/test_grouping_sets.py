"""ROLLUP / CUBE / GROUPING SETS (executor._execute_grouping_sets):
expanded as UNION ALL of per-set grouped selects with typed NULL keys."""

import numpy as np
import pytest

from infera_tpu.sql import Connection


@pytest.fixture()
def conn():
    c = Connection()
    c.execute("create table s as select x % 2 as a, x % 3 as b, x as v "
              "from range(12) r(x)")
    return c


def test_rollup(conn):
    rows = conn.execute(
        "select a, b, sum(v) s from s group by rollup(a, b) "
        "order by a, b").rows
    x = np.arange(12)
    want = []
    for a in (0, 1):
        for b in (0, 1, 2):
            want.append((a, b, int(x[(x % 2 == a) & (x % 3 == b)].sum())))
        want.append((a, None, int(x[x % 2 == a].sum())))
    want.append((None, None, int(x.sum())))
    # NULLs sort last on this engine's ORDER BY; compare as sets + types
    assert sorted(rows, key=str) == sorted(want, key=str)
    # integer keys survive as ints (typed NULL columns, no DOUBLE demotion)
    assert all(isinstance(r[0], (int, type(None))) for r in rows)


def test_cube_set_count(conn):
    rows = conn.execute(
        "select a, b, count(*) c from s group by cube(a, b)").rows
    # 6 (a,b) + 2 (a) + 3 (b) + 1 () = 12 result rows
    assert len(rows) == 12
    assert (None, None, 12) in rows


def test_grouping_sets_explicit(conn):
    rows = conn.execute(
        "select a, b, sum(v) from s group by grouping sets ((a), (b), ())"
    ).rows
    assert len(rows) == 2 + 3 + 1
    assert (None, None, 66) in rows
    assert (0, None, 30) in rows and (None, 2, 26) in rows


def test_rollup_keys_only_and_having(conn):
    rows = conn.execute("select a from s group by rollup(a)").rows
    assert sorted(rows, key=str) == sorted([(0,), (1,), (None,)], key=str)
    rows = conn.execute(
        "select a, b, sum(v) from s group by rollup(a, b) "
        "having sum(v) > 20").rows
    assert all(r[2] > 20 for r in rows)
    assert (None, None, 66) in rows


def test_rollup_with_where_and_limit(conn):
    rows = conn.execute(
        "select a, sum(v) from s where v >= 6 group by rollup(a) "
        "order by a limit 2").rows
    assert len(rows) == 2
    x = np.arange(12)
    assert rows[0] == (0, int(x[(x >= 6) & (x % 2 == 0)].sum()))
