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


@pytest.mark.parametrize("kind", ["left", "right", "full"])
def test_sql_outer_join_device_path(kind):
    """Outer joins above the device threshold run the device sort-join and
    match exact host semantics (unmatched rows NULL-padded).

    Reference analog: DuckDB host hash join serves every join kind natively
    (SURVEY §7.2 M4); here LEFT/RIGHT/FULL ride the same device sort-join as
    INNER with -1 markers lowered to NULLs."""
    conn = Connection()
    n = 1 << 15
    # left keys: 0..n-1; right keys: only even values, duplicated ×2 for
    # many-to-many coverage, plus a tail outside the left range
    conn.execute(f"create table l as select x as k, x as a from range({n}) r(x)")
    conn.execute(
        f"create table r2 as select x - x % 2 as k, x as b "
        f"from range({n}) r(x)"
    )
    res = conn.execute(
        f"select count(*) n, count(b) nb, count(a) na "
        f"from l {kind} join r2 on l.k = r2.k"
    ).rows
    # LEFT keeps the generic device sort-join (r2 has duplicate keys, so
    # the fused dim-lookup plan is ineligible); RIGHT/FULL orient with l
    # as the unique-key dimension and now take the fused outer plan
    # knob-aware: under INFERA_PALLAS_SQL=1 the round-5 outer-join kernel
    # serves RIGHT/FULL (the path gains the _pallas suffix)
    assert (conn._exec_path == "device_join" if kind == "left"
            else conn._exec_path.startswith("device_join_plan"))
    if kind == "left":
        # n/2 even keys × 2 dups + n/2 unmatched odd keys
        assert tuple(res[0]) == (n + n // 2, n, n + n // 2)
    elif kind == "right":
        # every right row (even key) matches exactly one left row
        assert tuple(res[0]) == (n, n, n)
    else:  # full
        assert tuple(res[0]) == (n + n // 2, n, n + n // 2)


def test_sql_outer_join_device_matches_host():
    """Bit-exact host/device equivalence on random keys with NULL padding,
    aggregates computed over both sides."""
    rng = np.random.default_rng(7)
    n = 1 << 15
    lk = rng.integers(0, n, n)
    rk = rng.integers(n // 2, n + n // 2, n)

    def run(threshold_bypass):
        conn = Connection()
        import pandas as pd

        conn.register_table("l", pd.DataFrame({"k": lk, "a": np.arange(n)}))
        conn.register_table("r2", pd.DataFrame({"k": rk, "b": np.arange(n) * 3}))
        if threshold_bypass:
            import infera_tpu.ops.join as J

            orig = J._hash_join
            # force host path by monkeypatching the device dispatch away
            def host_only(left, right, lkeys, rkeys, kind, residual,
                          eval_fn, scope_cls, on_device_path=None):
                import infera_tpu.ops.device_join as DJ
                saved = DJ.device_join_indices
                def boom(*a, **k):
                    raise RuntimeError("forced host")
                DJ.device_join_indices = boom
                try:
                    return orig(left, right, lkeys, rkeys, kind, residual,
                                eval_fn, scope_cls, None)
                finally:
                    DJ.device_join_indices = saved
            J._hash_join = host_only
            try:
                out = conn.execute(
                    "select count(*) c, sum(a) sa, sum(b) sb, count(b) cb "
                    "from l full join r2 on l.k = r2.k"
                ).rows
            finally:
                J._hash_join = orig
            return out
        out = conn.execute(
            "select count(*) c, sum(a) sa, sum(b) sb, count(b) cb "
            "from l full join r2 on l.k = r2.k"
        ).rows
        assert conn._exec_path == "device_join"
        return out

    assert run(False) == run(True)


def test_streaming_query_matches_batch():
    import jax
    import jax.numpy as jnp

    from infera_tpu.ops.streaming import chunked, stream_query

    rng = np.random.default_rng(0)
    n, chunk = 10_000, 1024
    x = rng.standard_normal((n, 8)).astype(np.float32)
    mask = np.ones(n, np.float32)
    w = jnp.asarray(rng.standard_normal((8, 1)), jnp.float32)

    @jax.jit
    def step(xc, mc):
        y = jnp.dot(xc, w)[:, 0] * mc
        return jnp.sum(y), jnp.sum(mc)

    def combine(acc, p):
        return (acc[0] + p[0], acc[1] + p[1])

    total, count = stream_query(
        chunked((x, mask), chunk), step, combine, (jnp.float32(0), jnp.float32(0))
    )
    expected = (x @ np.asarray(w))[:, 0].sum()
    assert float(count) == n
    np.testing.assert_allclose(float(total), expected, rtol=1e-4)


def test_sql_orderby_large_device_sort():
    conn = Connection()
    n = 1 << 16
    conn.execute(
        f"create table s as select (x * 2654435761) % 1000003 as k, x as v "
        f"from range({n}) r(x)"
    )
    rows = conn.execute("select k from s order by k desc limit 5").rows
    ks = (np.arange(n, dtype=np.int64) * 2654435761) % 1000003
    want = sorted(ks.tolist(), reverse=True)[:5]
    assert [r[0] for r in rows] == want
