"""Device relational operators: group-by path equivalence and SQL-level
dispatch above the size thresholds."""

import numpy as np
import pytest

from infera_tpu.columnar import Column
from infera_tpu.columnar import types as T
from infera_tpu.ops.device_groupby import group_ids_device
from infera_tpu.sql import Connection


def test_group_ids_device_matches_host_semantics():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 37, 5000).astype(np.int64)
    col = Column(keys, T.BIGINT)
    groups, firsts = group_ids_device([col], len(keys))
    # every row in a group shares the key; firsts index that key
    assert len(firsts) == len(np.unique(keys))
    for g in range(len(firsts)):
        rows = np.flatnonzero(groups == g)
        assert len(rows) > 0
        assert (keys[rows] == keys[firsts[g]]).all()


def test_sql_groupby_large_numeric_device_path():
    conn = Connection()
    n = 1 << 16  # above DEVICE_GROUPBY_THRESHOLD
    conn.execute(
        f"create table big as select x % 13 as g, x as v from range({n}) r(x)"
    )
    rows = conn.execute(
        "select g, count(*) c, sum(v) s from big group by g order by g"
    ).rows
    assert len(rows) == 13
    xs = np.arange(n, dtype=np.int64)
    for g, c, s in rows:
        mask = xs % 13 == g
        assert c == int(mask.sum())
        assert s == int(xs[mask].sum())


def test_sql_join_large_numeric_device_path():
    conn = Connection()
    n = 1 << 15  # above the device-join threshold on both sides
    conn.execute(f"create table l as select x as k, x * 2 as a from range({n}) r(x)")
    conn.execute(f"create table r2 as select x as k, x * 3 as b from range({n}) r(x)")
    res = conn.execute(
        "select count(*) n, sum(l.a + r2.b) s from l join r2 on l.k = r2.k"
    ).rows
    xs = np.arange(n, dtype=np.int64)
    assert res[0][0] == n
    assert res[0][1] == int((xs * 5).sum())
