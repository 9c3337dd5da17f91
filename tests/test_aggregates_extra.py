"""Multi-argument and extended aggregates (ops/aggregate.py round-3 set):
quantile_cont/disc, arg_min/arg_max, string_agg, product, count_if, last.
These run on the host group path (the fused device plans reject unknown
aggregate names and fall back cleanly)."""

import numpy as np
import pytest

from infera_tpu.errors import SqlError
from infera_tpu.sql import Connection


@pytest.fixture()
def conn():
    c = Connection()
    c.execute(
        "create table t as select x % 3 as g, x as v, (x*7) % 11 as w, "
        "'r' || (x%5)::varchar as s from range(30) r(x)")
    return c


def test_quantile_cont_matches_numpy(conn):
    rows = conn.execute(
        "select g, quantile_cont(v, 0.5) q, quantile_cont(v, 0.9) q9 "
        "from t group by g order by g").rows
    x = np.arange(30)
    for g, q, q9 in rows:
        vals = x[x % 3 == g]
        assert q == pytest.approx(np.quantile(vals, 0.5))
        assert q9 == pytest.approx(np.quantile(vals, 0.9))


def test_quantile_disc_is_exact_element(conn):
    rows = conn.execute(
        "select g, quantile_disc(v, 0.25) from t group by g order by g").rows
    x = np.arange(30)
    for g, q in rows:
        vals = np.sort(x[x % 3 == g])
        idx = max(int(np.ceil(0.25 * len(vals))) - 1, 0)
        assert q == vals[idx]
        assert q in vals  # discrete: an actual element


def test_quantile_fraction_validation(conn):
    with pytest.raises(SqlError, match="between 0 and 1"):
        conn.execute("select quantile_cont(v, 1.5) from t")
    with pytest.raises(SqlError, match="DISTINCT"):
        conn.execute("select quantile_cont(distinct v, 0.5) from t")
    with pytest.raises(SqlError, match="exactly 2"):
        conn.execute("select quantile_cont(v) from t")


def test_arg_min_max_and_ties(conn):
    rows = conn.execute(
        "select g, arg_min(s, w), arg_max(s, w), min_by(v, w), max_by(v, w) "
        "from t group by g order by g").rows
    x = np.arange(30)
    w = (x * 7) % 11
    s = np.array([f"r{i % 5}" for i in x])
    for g, amin, amax, vmin, vmax in rows:
        m = x % 3 == g
        # first occurrence wins ties
        i_min = np.flatnonzero(m)[np.argmin(w[m])]
        i_max = np.flatnonzero(m)[np.argmax(w[m])]
        assert amin == s[i_min] and amax == s[i_max]
        assert vmin == x[i_min] and vmax == x[i_max]


def test_string_agg_order_and_nulls():
    conn = Connection()
    conn.execute("create table t (g INTEGER, s VARCHAR)")
    conn.execute("insert into t values (1, 'a'), (1, NULL), (1, 'b'), "
                 "(2, NULL)")
    rows = conn.execute(
        "select g, string_agg(s, '|') from t group by g order by g").rows
    assert rows[0] == (1, "a|b")
    assert rows[1][1] is None  # all-NULL group -> NULL


def test_product_count_if_last(conn):
    rows = conn.execute(
        "select g, product((v % 3 + 1)::double) p, count_if(v % 2 = 0) c, "
        "last(v) l from t group by g order by g").rows
    x = np.arange(30)
    for g, p, c, last in rows:
        vals = x[x % 3 == g]
        assert p == pytest.approx(np.prod(vals % 3 + 1).astype(float))
        assert c == int((vals % 2 == 0).sum())
        assert last == vals[-1]


def test_global_quantile_and_having(conn):
    (row,) = conn.execute("select quantile_cont(v, 0.9) from t").rows
    assert row[0] == pytest.approx(np.quantile(np.arange(30), 0.9))
    rows = conn.execute(
        "select g from t group by g having quantile_cont(v, 0.5) > 14 "
        "order by g").rows
    assert [r[0] for r in rows] == [1, 2]


def test_multi_agg_on_device_path(conn):
    # literal-fraction quantiles now FUSE into the device plan (the
    # median sort machinery); values must match numpy
    c = Connection()
    c.execute("create table big as select x % 4 as g, "
              "(x % 97)::float as f from range(70000) r(x)")
    rows = c.execute(
        "select g, quantile_cont(f, 0.5), sum(f) from big "
        "group by g order by g").rows
    assert len(rows) == 4
    assert c._exec_path == "device_plan"
    x = np.arange(70000)
    for g, q, s in rows:
        vals = (x[x % 4 == g] % 97).astype(np.float64)
        assert q == pytest.approx(np.quantile(vals, 0.5), abs=1e-5)
        assert s == pytest.approx(vals.sum(), rel=1e-9)


def test_multi_aggs_on_empty_table():
    # ADVICE r3 (low): quantile/string_agg over ZERO rows return NULL, not
    # a 'must be a non-NULL constant' binder error (the constant column
    # evaluates to length 0 on an empty table)
    c = Connection()
    c.execute("create table e (v INTEGER, s VARCHAR)")
    assert c.execute("select quantile_cont(v, 0.5) from e").rows == [(None,)]
    assert c.execute("select quantile_disc(v, 0.9) from e").rows == [(None,)]
    assert c.execute("select string_agg(s, ',') from e").rows == [(None,)]
    assert c.execute("select arg_min(v, v) from e").rows == [(None,)]
