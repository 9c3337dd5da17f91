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
