"""Window frames and ranking extensions (ops/window.py round-3 rewrite):
standard default frames (running aggregates with peers), ROWS/RANGE
bounds, percent_rank/cume_dist, first/last/nth_value."""

import numpy as np
import pytest

from infera_tpu.errors import SqlError
from infera_tpu.sql import Connection


@pytest.fixture()
def conn():
    c = Connection()
    c.execute("create table w as select x as v, x % 3 as g from range(9) r(x)")
    return c


def test_running_sum_default_frame(conn):
    rows = conn.execute(
        "select v, sum(v) over (order by v) s from w order by v").rows
    assert [r[1] for r in rows] == list(np.cumsum(np.arange(9)))


def test_running_sum_includes_peers(conn):
    # RANGE default: rows with equal ORDER BY keys share the frame end
    rows = conn.execute(
        "select v, sum(v) over (order by g) s from w order by g, v").rows
    assert [r[1] for r in rows] == [9, 9, 9, 21, 21, 21, 36, 36, 36]


def test_rows_frame_sliding(conn):
    rows = conn.execute(
        "select v, sum(v) over (order by v rows between 1 preceding and "
        "1 following) from w order by v").rows
    want = [sum(j for j in range(9) if abs(j - i) <= 1) for i in range(9)]
    assert [r[1] for r in rows] == want
    # single-bound shorthand: ROWS 2 PRECEDING == BETWEEN 2 PRE AND CURRENT
    rows = conn.execute(
        "select v, count(*) over (order by v rows 2 preceding) from w "
        "order by v").rows
    assert [r[1] for r in rows] == [1, 2, 3, 3, 3, 3, 3, 3, 3]


def test_range_numeric_offset(conn):
    rows = conn.execute(
        "select v, sum(v) over (order by v range between 2 preceding and "
        "current row) from w order by v").rows
    want = [sum(j for j in range(9) if i - 2 <= j <= i) for i in range(9)]
    assert [r[1] for r in rows] == want
    with pytest.raises(SqlError, match="RANGE offsets"):
        conn.execute("select sum(v) over (order by g, v range between 1 "
                     "preceding and current row) from w")
    # DESC numeric offsets (round-4): 'preceding' walks toward LARGER keys
    rows = conn.execute(
        "select v, sum(v) over (order by v desc range between "
        "1 preceding and current row) from w order by v").rows
    want = [sum(j for j in range(9) if i <= j <= i + 1) for i in range(9)]
    assert [r[1] for r in rows] == want


def test_percent_rank_cume_dist(conn):
    rows = conn.execute(
        "select v, percent_rank() over (order by g) pr, "
        "cume_dist() over (order by g) cd from w order by v").rows
    by_v = {r[0]: (r[1], r[2]) for r in rows}
    assert by_v[0] == (0.0, pytest.approx(1 / 3))
    assert by_v[1] == (pytest.approx(3 / 8), pytest.approx(2 / 3))
    assert by_v[2] == (pytest.approx(6 / 8), pytest.approx(1.0))


def test_first_last_nth_value(conn):
    rows = conn.execute(
        "select v, first_value(v) over (partition by g order by v) f, "
        "last_value(v) over (partition by g order by v) l, "
        "nth_value(v, 2) over (partition by g order by v rows between "
        "unbounded preceding and unbounded following) n2 "
        "from w order by v").rows
    for v, f, last, n2 in rows:
        g = v % 3
        assert f == g                 # partition min
        assert last == v              # running frame ends at current row
        assert n2 == g + 3            # 2nd of [g, g+3, g+6]


def test_min_max_window_frames(conn):
    rows = conn.execute(
        "select v, max(v) over (order by v rows between 1 preceding and "
        "current row) from w order by v").rows
    assert [r[1] for r in rows] == list(range(9))
    rows = conn.execute(
        "select v, min(v) over (order by v desc) from w order by v").rows
    assert [r[1] for r in rows] == list(range(9))  # running min, desc order


def test_range_offset_bounds_exclude_current_peers(conn):
    # ADVICE r3 (medium): the searchsorted side must follow the bound
    # POSITION (start->left, end->right-1), not the bound kind.
    # '2 PRECEDING AND 1 PRECEDING': first row has an empty frame -> NULL
    rows = conn.execute(
        "select v, sum(v) over (order by v range between 2 preceding and "
        "1 preceding) from w order by v").rows
    want = [None] + [sum(j for j in range(9) if i - 2 <= j <= i - 1)
                     for i in range(1, 9)]
    assert [r[1] for r in rows] == want
    # '1 FOLLOWING AND 2 FOLLOWING': last row has an empty frame -> NULL,
    # never its own value
    rows = conn.execute(
        "select v, sum(v) over (order by v range between 1 following and "
        "2 following) from w order by v").rows
    want = [sum(j for j in range(9) if i + 1 <= j <= i + 2) or None
            for i in range(9)]
    want[-1] = None
    assert [r[1] for r in rows] == want


def test_range_preceding_end_keeps_peer_rows(conn):
    # duplicate ORDER BY keys: 'UNBOUNDED PRECEDING AND 1 PRECEDING' must
    # include ALL rows of the preceding peer group (DuckDB gives 2.0 for
    # the g=1 rows over keys [0,0,0]: count=3... using g keys 0,0,0,1,1,1)
    rows = conn.execute(
        "select v, count(v) over (order by g range between unbounded "
        "preceding and 1 preceding) from w order by g, v").rows
    # g=0 rows: empty frame -> 0; g=1 rows: all three g=0 rows; g=2: six
    assert [r[1] for r in rows] == [0, 0, 0, 3, 3, 3, 6, 6, 6]


def test_window_sum_int_stays_bigint(conn):
    # ADVICE r3 (low): SUM(int) OVER (...) must stay integer-typed
    rows = conn.execute(
        "select sum(v) over (order by v rows between 1 preceding and "
        "current row) from w order by v").rows
    assert all(isinstance(r[0], int) and not isinstance(r[0], bool)
               for r in rows)


def test_multi_key_order_by_peers(conn):
    # multi-key ORDER BY: peers require equality on ALL keys (round-4
    # vectorized rewrite)
    rows = conn.execute(
        "select v, sum(v) over (order by g, v % 2) s from w "
        "order by g, v % 2, v").rows
    # keys (g, v%2): peer groups within g split by parity
    got = {r[0]: r[1] for r in rows}
    by_key = {}
    for v in range(9):
        by_key.setdefault((v % 3, v % 2), []).append(v)
    keys_sorted = sorted(by_key)
    run = 0
    for k in keys_sorted:
        run += sum(by_key[k])
        for v in by_key[k]:
            assert got[v] == run


def test_desc_order_and_null_handling():
    c = Connection()
    c.execute("create table d (v INTEGER)")
    c.execute("insert into d values (3), (1), (NULL), (2)")
    rows = c.execute(
        "select v, rank() over (order by v desc) r from d").rows
    got = {r[0]: r[1] for r in rows}
    assert got[3] == 1 and got[2] == 2 and got[1] == 3 and got[None] == 4


def test_sliding_min_max_sparse_table(conn):
    rows = conn.execute(
        "select v, min(v) over (order by v rows between 3 preceding and "
        "1 preceding) mn, max(v) over (order by v rows between 1 following "
        "and 2 following) mx from w order by v").rows
    for v, mn, mx in rows:
        lo = [j for j in range(9) if v - 3 <= j <= v - 1]
        hi = [j for j in range(9) if v + 1 <= j <= v + 2]
        assert mn == (min(lo) if lo else None)
        assert mx == (max(hi) if hi else None)


def test_suffix_frame_with_partitions(conn):
    # ADVICE r4 (high): the reversed segmented scan must receive partition
    # starts in REVERSED coordinates; with >1 partition the old code
    # crossed partition boundaries (e.g. partition min 7.0 instead of 1.0).
    rows = conn.execute(
        "select g, v, min(v) over (partition by g order by v rows between "
        "current row and unbounded following) mn, "
        "max(v) over (partition by g order by v rows between "
        "current row and unbounded following) mx from w order by g, v").rows
    for g, v, mn, mx in rows:
        members = [j for j in range(9) if j % 3 == g and j >= v]
        assert mn == min(members), (g, v, mn)
        assert mx == max(members), (g, v, mx)
    # explicit whole-partition frame
    rows = conn.execute(
        "select g, min(v) over (partition by g order by v rows between "
        "unbounded preceding and unbounded following) mn from w "
        "order by g").rows
    for g, mn in rows:
        assert mn == min(j for j in range(9) if j % 3 == g)


def test_device_window_int_sum_overflow_falls_back(monkeypatch):
    """ADVICE r4 (medium): integer running SUM whose magnitude can pass
    2^24 must not ride the f32 device cumsum — exact BIGINT required."""
    from infera_tpu.ops import window as W

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1 << 10)
    monkeypatch.setenv("INFERA_WINDOW_DEVICE", "1")
    c = Connection()
    n = 1 << 12
    big = 1 << 20  # n * big >> 2^24
    c.execute(f"create table ov as select x as k, {big} + x as v "
              f"from range({n}) r(x)")
    rows = c.execute("select sum(v) over (order by k) s from ov "
                     "order by k").rows
    run = 0
    for i, (s,) in enumerate(rows):
        run += big + i
        assert s == run, (i, s, run)


def test_windowed_subquery_fuses_on_device(monkeypatch):
    """Round 5 (VERDICT r4 item 7): aggregate-over-window subqueries
    flatten into the fused device plan — the window computes on device
    (one sort + segmented double-single scans) and only the group table
    returns. Results match the host path's f64 windows."""
    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    c = Connection()
    n = MIN_DEVICE_ROWS * 2
    c.execute(f"create table wt as select x % 8 as p, x % 5 as g, "
              f"(x * 2654435761) % 9973 as k, "
              f"((x * 13) % 97)::float - 48.0 as v from range({n}) r(x)")
    qs = [
        ("select g, avg(w) a, max(w) m from (select g, sum(v) over "
         "(partition by p order by k) as w from wt) sub "
         "group by g order by g"),
        ("select g, avg(r) s from (select g, rank() over (partition by p "
         "order by k) as r from wt) sub group by g order by g"),
        ("select count(*), avg(w) from (select min(v) over (partition by "
         "p order by k) as w, v from wt) sub where w < -20.0"),
        ("select g, avg(w) from (select g, avg(v) over (partition by p "
         "order by k rows between unbounded preceding and current row) "
         "as w from wt) sub group by g order by g"),
        ("select g, sum(w) from (select g, max(v) over (partition by p) "
         "as w from wt) sub group by g order by g"),
    ]
    import infera_tpu.sql.device_plan as dp

    host = Connection()
    host.catalog = c.catalog
    for q in qs:
        rows = c.execute(q).rows
        assert c._exec_path == "device_plan", q
        with monkeypatch.context() as m:
            m.setattr(dp, "try_execute_on_device", lambda *a, **k: None)
            hrows = host.execute(q).rows
        assert host._exec_path == "host"
        assert len(rows) == len(hrows), q
        for a, b in zip(rows, hrows):
            for x, y in zip(a, b):
                if isinstance(y, float):
                    assert x == pytest.approx(y, rel=1e-6, abs=1e-6), (q, x, y)
                else:
                    assert x == y, (q, x, y)


def test_windowed_subquery_ineligible_stays_host(monkeypatch):
    """Unsupported frames / bare windowed outputs keep the host path with
    identical answers."""
    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    c = Connection()
    n = MIN_DEVICE_ROWS * 2
    c.execute(f"create table wh as select x % 4 as p, x as k, "
              f"(x % 50)::float as v from range({n}) r(x)")
    # sliding frame: the WINDOW computes on the host path (not fusable),
    # and since round 5 the outer aggregate may still fuse over the
    # materialized subquery — results must match the all-host answer
    r = c.execute("select avg(w) from (select sum(v) over (partition by p "
                  "order by k rows between 2 preceding and current row) "
                  "as w from wh) sub").rows
    import infera_tpu.sql.device_plan as dp
    host = Connection()
    host.catalog = c.catalog
    with monkeypatch.context() as m:
        m.setattr(dp, "try_execute_on_device", lambda *a, **k: None)
        h = host.execute(
            "select avg(w) from (select sum(v) over (partition by p "
            "order by k rows between 2 preceding and current row) "
            "as w from wh) sub").rows
    assert r[0][0] == pytest.approx(h[0][0], rel=1e-9)
    # bare window output column (no aggregate consumer) → host
    c.execute("select w from (select sum(v) over (order by k) as w "
              "from wh) sub limit 5")
    assert c._exec_path == "host"
    # SUM over a ranking window must keep the host's BIGINT typing: the
    # window-FUSION path rejects it, and since round 5 the aggregate runs
    # over the MATERIALIZED subquery via the exact int64 byte-limb slots
    # (still BIGINT, still exact)
    rows = c.execute("select sum(r) from (select rank() over (order by k) "
                     "as r from wh) sub").rows
    n2 = c.catalog.get("wh").num_rows
    assert rows[0][0] == n2 * (n2 + 1) // 2
    assert isinstance(rows[0][0], int)


def test_device_window_route_matches_host(monkeypatch):
    """INFERA_WINDOW_DEVICE=1 routes ranking/running aggregates through
    the accelerator; results must match the host-vectorized path."""
    from infera_tpu.ops import window as W

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1 << 10)
    c = Connection()
    n = 1 << 12
    c.execute(f"create table dt as select x % 16 as p, "
              f"(x * 2654435761) % 9973 as k, (x % 97)::float as v "
              f"from range({n}) r(x)")
    qs = [
        "select sum(v) over (partition by p order by k) s from dt",
        "select rank() over (partition by p order by k) r from dt",
        "select row_number() over (order by k) r from dt",
    ]
    for q in qs:
        monkeypatch.setenv("INFERA_WINDOW_DEVICE", "1")
        dev = c.execute(q).rows
        monkeypatch.setenv("INFERA_WINDOW_DEVICE", "0")
        host = c.execute(q).rows
        for a, b in zip(dev, host):
            assert a[0] == pytest.approx(b[0], rel=1e-5)


def test_device_window_count_is_row_count(monkeypatch):
    """Review r4: the device route's count(v) must count rows, never sum
    the value column."""
    from infera_tpu.ops import window as W

    monkeypatch.setattr(W, "DEVICE_WINDOW_MIN_ROWS", 1 << 10)
    c = Connection()
    c.execute(f"create table dc as select x % 8 as p, x as k, "
              f"(x % 97)::float as v from range({1 << 12}) r(x)")
    q = "select count(v) over (partition by p order by k) c from dc"
    monkeypatch.setenv("INFERA_WINDOW_DEVICE", "1")
    dev = c.execute(q).rows
    monkeypatch.setenv("INFERA_WINDOW_DEVICE", "0")
    host = c.execute(q).rows
    assert [r[0] for r in dev] == [r[0] for r in host]


def test_windowed_subquery_flattening_preserves_binder_errors():
    """Round-5 review fix: a qualified ref that is invalid through the
    subquery boundary must raise the Binder Error on the fused path too
    (flattening previously re-bound it against the base table)."""
    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    c = Connection()
    n = MIN_DEVICE_ROWS * 2
    c.execute(f"create table wq as select x % 4 as p, x as k, "
              f"(x % 9)::float as v from range({n}) r(x)")
    with pytest.raises(SqlError, match="Referenced column"):
        c.execute("select avg(wq.v) from (select sum(v) over "
                  "(partition by p order by k) as w from wq) sub")
