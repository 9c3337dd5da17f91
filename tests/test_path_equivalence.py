"""Property tests: the device relational paths must agree with the host
paths on randomized inputs (the device dispatch is an optimization, never a
semantic change)."""

import numpy as np
import pytest

from infera_tpu.columnar import Column
from infera_tpu.columnar import types as T
from infera_tpu.ops.aggregate import group_ids_host
from infera_tpu.ops.device_groupby import group_ids_device
from infera_tpu.ops.device_join import inner_join_indices_device


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n,domain", [(100, 5), (1000, 100), (3000, 2)])
def test_groupby_paths_agree(seed, n, domain):
    rng = np.random.default_rng(seed)
    keys = rng.integers(-domain, domain, n).astype(np.int64)
    col = Column(keys, T.BIGINT)
    hg, hf = group_ids_host([col], n)
    dg, df = group_ids_device([col], n)
    # same partition of rows into groups (ids may be numbered differently)
    assert len(hf) == len(df)
    h_sets = {}
    d_sets = {}
    for i in range(n):
        h_sets.setdefault(hg[i], set()).add(i)
        d_sets.setdefault(dg[i], set()).add(i)
    assert sorted(map(frozenset, h_sets.values())) == sorted(map(frozenset, d_sets.values()))


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("nl,nr,domain", [(50, 70, 10), (500, 100, 600), (64, 64, 1)])
def test_join_paths_agree(seed, nl, nr, domain):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, domain, nl).astype(np.int64)
    rk = rng.integers(0, domain, nr).astype(np.int64)
    li, ri = inner_join_indices_device(lk, rk)
    got = sorted(zip(li.tolist(), ri.tolist()))
    want = sorted(
        (i, j) for i in range(nl) for j in range(nr) if lk[i] == rk[j]
    )
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_sort_paths_agree(seed):
    from infera_tpu.ops.sort import argsort_device

    rng = np.random.default_rng(seed)
    n = 500
    k1 = rng.integers(0, 50, n).astype(np.int64)
    k2 = rng.standard_normal(n).astype(np.float32)
    dev = argsort_device([k1, k2], [True, False], [False, False], [None, None])
    # stable reference via lexsort (last key primary)
    host = np.lexsort((-k2, k1))
    np.testing.assert_array_equal(
        np.stack([k1[dev], k2[dev]]), np.stack([k1[host], k2[host]])
    )


def test_group_keys_beyond_int32_do_not_merge():
    """Regression: int64 key encodings used to truncate to their low 32 bits
    on device transfer (x64 disabled), merging keys like the f64 bit
    patterns of 1.45 and 1.95."""
    from infera_tpu.columnar import Column
    from infera_tpu.columnar import types as T
    from infera_tpu.ops.device_groupby import group_ids_device

    vals = np.tile(np.array([1.45, 1.95, 0.2, 0.7], np.float64), 4096)
    col = Column(vals, T.DOUBLE)
    dense, firsts = group_ids_device([col], len(vals))
    assert len(firsts) == 4
    # rows with equal values share an id; distinct values never do
    for v in (1.45, 1.95, 0.2, 0.7):
        ids = set(dense[vals == v].tolist())
        assert len(ids) == 1
    assert len({dense[vals == v][0] for v in (1.45, 1.95, 0.2, 0.7)}) == 4


def test_join_keys_beyond_int32_do_not_collide():
    from infera_tpu.columnar import Column
    from infera_tpu.columnar import types as T
    from infera_tpu.ops.device_join import device_inner_join_indices

    # two BIGINT keys sharing low 32 bits
    base = np.int64(5) << 33
    lk = np.array([base + 7, 7, base + 7, 123], np.int64)
    rk = np.array([7, base + 7], np.int64)
    li, ri = device_inner_join_indices(
        [Column(lk, T.BIGINT)], [Column(rk, T.BIGINT)])
    pairs = sorted(zip(li.tolist(), ri.tolist()))
    assert pairs == [(0, 1), (1, 0), (2, 1)]


def test_device_order_by_wide_ints_exact():
    """Regression: device ORDER BY squeezed keys to f32 (exact only to
    2^24); wide ints now sort via 2^24-radix digit levels."""
    from infera_tpu.ops.sort import argsort_device

    rng = np.random.default_rng(0)
    keys = rng.integers(-2**52, 2**52, size=40000).astype(np.int64)
    keys[:100] = np.arange(100) + (1 << 40)  # adjacent wide values
    order = argsort_device([keys], [True], [False], [None])
    np.testing.assert_array_equal(keys[order], np.sort(keys, kind="stable"))


def test_device_order_by_f64_close_values():
    from infera_tpu.ops.sort import argsort_device

    keys = np.array([1.0 + 1e-9, 1.0, 1.0 + 2e-9, 0.5] * 10000, np.float64)
    order = argsort_device([keys], [True], [False], [None])
    np.testing.assert_array_equal(keys[order], np.sort(keys, kind="stable"))


def test_varchar_groupby_device_matches_host():
    """VARCHAR group keys now take the device path via shared dictionary
    codes; results must match the host dict path exactly."""
    import jax

    from infera_tpu.sql import Connection

    n = 40000
    conn = Connection()
    conn.execute(
        f"create table sg as select case when x % 3 = 0 then 'alpha' "
        f"when x % 3 = 1 then 'beta' else 'gamma' end as s, x % 4 as k, "
        f"(x % 10)::float as f from range({n}) r(x)")
    rows = conn.execute(
        "select s, k, count(*), sum(f) from sg group by s, k "
        "order by s, k").rows
    x = np.arange(n)
    sval = np.where(x % 3 == 0, "alpha", np.where(x % 3 == 1, "beta", "gamma"))
    k = x % 4
    f = (x % 10).astype(np.float64)
    assert len(rows) == 12
    for s, kk, c, sm in rows:
        m = (sval == s) & (k == kk)
        assert c == int(m.sum())
        assert sm == pytest.approx(float(f[m].sum()), rel=1e-9)
    del jax


def test_varchar_join_device_matches_host():
    from infera_tpu.sql import Connection

    n = 40000
    conn = Connection()
    conn.execute(
        f"create table jl as select case when x % 2 = 0 then 'even' else 'odd' "
        f"end as s, x as v from range({n}) r(x)")
    conn.execute(
        "create table jr as select 'even' as s, 100 as w "
        "union all select 'odd', 200 union all select 'none', 300")
    # expand jr to cross the device-join row threshold on the build side?
    # (threshold applies to min side — small dim table keeps the host path,
    # so ALSO join two large tables on the string key)
    rows = conn.execute(
        "select s, count(*), sum(w) from (select jl.s as s, w from jl "
        "join jr on jl.s = jr.s) t group by s order by s").rows
    assert rows == [("even", n // 2, 100 * (n // 2)),
                    ("odd", n // 2, 200 * (n // 2))]
    # large×large string join: high-cardinality keys so the result stays ~n
    conn.execute(
        f"create table jl2 as select 'k' || (x % 1000) as s, x as v "
        f"from range({n}) r(x)")
    conn.execute(
        f"create table jr2 as select 'k' || (x % 1000) as s, x as w "
        f"from range({n}) r(x) where x % 40 = 0")
    big = conn.execute(
        "select count(*), sum(v % 7) from (select jl2.v as v from jl2 "
        "join jr2 on jl2.s = jr2.s) t").rows
    # each jr2 key 'k<i%1000>' appears n/40/1000 = n/40000 times; matches per
    # jl2 row with key i: (n/40000 if i%40==0-compatible ...) — instead check
    # against a direct numpy model
    x = np.arange(n)
    lkeys = x % 1000
    rsel = x[x % 40 == 0]
    rkeys = rsel % 1000
    import collections
    rcount = collections.Counter(rkeys.tolist())
    total = sum(rcount[int(k)] for k in lkeys)
    wsum = sum((int(v) % 7) * rcount[int(k)] for v, k in zip(x, lkeys))
    assert big == [(total, wsum)]


def _host_rows(conn_src, q, monkeypatch):
    """Re-run q with every fused plan disabled — the semantic oracle."""
    from infera_tpu.sql import Connection, device_join_plan, device_plan

    host = Connection()
    host.catalog = conn_src.catalog
    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(device_plan, "try_execute_on_device",
                   lambda *a, **k: None)
        mp.setattr(device_join_plan, "try_execute_join_on_device",
                   lambda *a, **k: None)
        return host.execute(q).rows
    finally:
        mp.undo()


def _agree(a, b, tol=1e-5):
    assert len(a) == len(b), (len(a), len(b))
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb)
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                assert va == pytest.approx(vb, rel=tol, abs=tol), (ra, rb)
            else:
                assert va == vb, (ra, rb)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fused_sql_random_aggregates_agree(seed):
    """Randomized fused-eligible SELECTs: device plan vs host oracle."""
    from infera_tpu.sql import Connection

    rng = np.random.default_rng(seed)
    n = 1 << 15
    conn = Connection()
    conn.execute(
        f"create table rt as select x % {int(rng.integers(2, 9))} as g, "
        f"(x % {int(rng.integers(10, 200))})::float / 7.0 as f1, "
        f"((x * 13 + 5) % {int(rng.integers(20, 99))})::float as f2 "
        f"from range({n}) r(x)")
    aggs = ["count(*)", "sum(f1)", "avg(f2)", "min(f1)", "max(f2)",
            "stddev(f1)", "quantile_cont(f1, 0.25)",
            "quantile_disc(f2, 0.75)", "median(f1)"]
    picks = list(rng.choice(aggs, size=4, replace=False))
    where = rng.choice(["", "where f1 > 3.0", "where f2 < 50.0"])
    q = (f"select g, {', '.join(picks)} from rt {where} "
         f"group by g order by g")
    got = conn.execute(q).rows
    assert conn._exec_path == "device_plan", (conn._exec_path, q)
    mp = pytest.MonkeyPatch()
    want = _host_rows(conn, q, mp)
    _agree(got, want, tol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("kind", ["inner", "left"])
def test_fused_sql_random_joins_agree(seed, kind):
    from infera_tpu.sql import Connection

    rng = np.random.default_rng(seed + 10)
    n = 1 << 15
    dim_n = int(rng.integers(20, 400))
    span = int(dim_n * float(rng.uniform(1.0, 2.0)))  # some unmatched keys
    conn = Connection()
    conn.execute(f"create table jf as select x % {span} as k, "
                 f"(x % 30)::float as v, x % 5 as g from range({n}) r(x)")
    conn.execute(f"create table jd as select x as k, (x * 3)::float as w "
                 f"from range({dim_n}) r(x)")
    q = (f"select g, count(*) c, count(w) cw, sum(v) sv, sum(w) sw, "
         f"min(w) mn, max(w) mx, sum(coalesce(w, -2.0)) sc "
         f"from jf {kind} join jd on jf.k = jd.k group by g order by g")
    got = conn.execute(q).rows
    assert conn._exec_path == "device_join_plan", (conn._exec_path, q)
    mp = pytest.MonkeyPatch()
    want = _host_rows(conn, q, mp)
    _agree(got, want, tol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_sql_random_aggregates_agree_on_mesh(seed):
    """Same randomized queries through the 8-device mesh path."""
    from infera_tpu.sql import Connection

    rng = np.random.default_rng(seed + 50)
    n = 1 << 15
    conn = Connection()
    conn.set_mesh(8)
    conn.execute(
        f"create table rt as select x % {int(rng.integers(2, 9))} as g, "
        f"(x % {int(rng.integers(10, 200))})::float / 7.0 as f1, "
        f"((x * 13 + 5) % {int(rng.integers(20, 99))})::float as f2, "
        f"x * 1000003 as big from range({n}) r(x)")
    q = ("select g, count(*) c, sum(f1) s1, avg(f2) a2, min(f1) mn, "
         "max(f2) mx, stddev(f1) sd, sum(big) sb from rt "
         "where f1 > 2.0 group by g order by g")
    got = conn.execute(q).rows
    assert conn._exec_path == "device_plan_mesh", conn._exec_path
    mp = pytest.MonkeyPatch()
    want = _host_rows(conn, q, mp)
    _agree(got, want, tol=1e-4)
    # int64 SUM is exact on the mesh (limb sums), not approximate
    for ga, gb in zip(got, want):
        assert ga[7] == gb[7]
