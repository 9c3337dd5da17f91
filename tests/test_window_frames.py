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
    with pytest.raises(SqlError, match="ascending"):
        conn.execute("select sum(v) over (order by v desc range between "
                     "1 preceding and current row) from w")


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
