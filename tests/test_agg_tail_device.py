"""Round-4 aggregate-tail device/mesh decompositions (VERDICT r3 item 5):
count_if, bool_and/bool_or, product, arg_min/arg_max, and a HOST-EXACT
device HyperLogLog (splitmix64 emulated in 32-bit limbs) — each verified
against the host path on the single-device plan AND the 8-device mesh."""

import numpy as np
import pytest

from infera_tpu.sql import Connection
from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

N = MIN_DEVICE_ROWS * 2


def _mk(conn):
    conn.execute(
        f"create table t as select x % 5 as g, "
        f"(x % 40)::float / 4.0 - 3.0 as v, (x % 7) as iv, "
        f"((x * 13) % 101)::float as hv from range({N}) r(x)")


def _host_rows(conn, q, monkeypatch):
    host = Connection()
    host.catalog = conn.catalog
    import infera_tpu.sql.device_plan as dp

    with monkeypatch.context() as m:
        m.setattr(dp, "try_execute_on_device", lambda *a, **k: None)
        rows = host.execute(q).rows
    assert host._exec_path == "host"
    return rows


def _check(conn, q, monkeypatch, expect_path, rel=1e-6):
    rows = conn.execute(q).rows
    # knob-aware: under INFERA_PALLAS_SQL=1 the round-5 widened kernel
    # carries count_if/bool/product slots → path gains the _pallas suffix
    assert conn._exec_path.startswith(expect_path)
    hrows = _host_rows(conn, q, monkeypatch)
    assert len(rows) == len(hrows)
    for a, b in zip(rows, hrows):
        for x, y in zip(a, b):
            if isinstance(y, float):
                assert x == pytest.approx(y, rel=rel, abs=1e-9)
            else:
                assert x == y
    return rows


@pytest.fixture(params=["single", "mesh"])
def conn(request):
    c = Connection()
    if request.param == "mesh":
        c.set_mesh(8)
    _mk(c)
    path = ("device_plan_mesh" if request.param == "mesh"
            else "device_plan")
    return c, path


def test_count_if(conn, monkeypatch):
    c, path = conn
    rows = _check(c, "select g, count_if(v > 0.0) c from t "
                     "group by g order by g", monkeypatch, path)
    x = np.arange(N)
    v = (x % 40) / 4.0 - 3.0
    for key, cnt in rows:
        assert cnt == int(((x % 5 == key) & (v > 0)).sum())


def test_bool_and_or(conn, monkeypatch):
    c, path = conn
    _check(c, "select g, bool_and(v > -4.0) ba, bool_or(v > 9.0) bo, "
              "bool_and(v > 0.0) bf from t group by g order by g",
           monkeypatch, path)


def test_arg_min_max(conn, monkeypatch):
    c, path = conn
    rows = _check(c, "select g, arg_min(iv, v) am, arg_max(iv, v) ax "
                     "from t group by g order by g", monkeypatch, path)
    # sanity vs numpy (ties -> first occurrence)
    x = np.arange(N)
    g = x % 5
    v = ((x % 40).astype(np.float32) / np.float32(4.0)
         - np.float32(3.0)).astype(np.float64)
    iv = x % 7
    for key, am, ax in rows:
        m = g == key
        assert am == iv[m][np.argmin(v[m])]
        assert ax == iv[m][np.argmax(v[m])]


def test_approx_count_distinct_host_exact(conn, monkeypatch):
    """The device HLL must reproduce the HOST estimate bit-exactly (same
    splitmix64 hash, same register histogram, same fixed-order fold)."""
    c, path = conn
    _check(c, "select g, approx_count_distinct(hv) a, "
              "approx_count_distinct(iv) b from t group by g order by g",
           monkeypatch, path)
    _check(c, "select approx_count_distinct(hv) from t", monkeypatch, path)


def test_approx_count_distinct_f64_not_f32_exact_falls_back(monkeypatch):
    """ADVICE r4 (high): DOUBLE columns whose values are not f32-exact
    must NOT take the device HLL (the x64-disabled upload downcasts to
    f32 and distinct doubles collide — measured ~120x undercount)."""
    c = Connection()
    c.execute(f"create table fd as select 1 as g, "
              f"1.0 + x * 1e-9 as dv from range({N}) r(x)")
    (est,) = c.execute("select approx_count_distinct(dv) from fd").rows[0]
    assert c._exec_path == "host"
    # all N values distinct; HLL error envelope ~2% at 2^14 registers
    assert abs(est - N) / N < 0.05
    # f32-exact doubles (small integers widened) still ride the device
    c.execute(f"create table fe as select 1 as g, (x % 1000) * 1.0 as ev "
              f"from range({N}) r(x)")
    rows = c.execute("select approx_count_distinct(ev) from fe").rows
    assert c._exec_path == "device_plan"
    host = Connection()
    host.catalog = c.catalog
    import infera_tpu.sql.device_plan as dp
    with monkeypatch.context() as m:
        m.setattr(dp, "try_execute_on_device", lambda *a, **k: None)
        hrows = host.execute(
            "select approx_count_distinct(ev) from fe").rows
    assert rows == hrows


def test_product(conn, monkeypatch):
    """Device product = sign + compensated log2-sum; tolerance reflects
    the f32 expression-evaluation rounding a multiplicative aggregate
    amplifies linearly in the group size (sums stay compensated)."""
    c, path = conn
    _check(c, "select g, product(1.0 + v / 1000.0) p from t "
              "group by g order by g", monkeypatch, path, rel=1e-3)
    # sign and zero handling
    c.execute(f"create table pz as select x % 3 as g, "
              f"case when x % 8 = 0 then 0.0 else "
              f"(x % 5)::float - 2.0 end as v from range({N}) r(x)")
    rows = c.execute("select g, product(v) from pz group by g order by g").rows
    assert c._exec_path.startswith(path)
    for _g, p in rows:
        assert p == 0.0  # every group contains a zero


def test_argmax_string_payload(monkeypatch):
    """arg_max may RETURN a non-numeric column: the device finds the row
    id, the host gathers the string."""
    c = Connection()
    c.execute(f"create table s as select x % 4 as g, (x % 90)::float as v, "
              f"'name_' || (x % 11)::varchar as nm from range({N}) r(x)")
    rows = c.execute(
        "select g, arg_max(nm, v) from s group by g order by g").rows
    assert c._exec_path.startswith("device_plan")  # knob-aware (r5 kernel)
    x = np.arange(N)
    for key, nm in rows:
        m = x % 4 == key
        v = (x % 90)[m]
        assert nm == f"name_{(x % 11)[m][np.argmax(v)]}"


def test_mesh_hll_large_group_count(monkeypatch):
    """Round 5 (VERDICT r4 item 8): registers pack 4-per-int32 so the
    mesh HLL exchange admits G up to 4096 (was 1024) — bit-exact vs the
    host estimate at G=2000."""
    c = Connection()
    c.set_mesh(8)
    n = 1 << 16
    c.execute(f"create table hb as select x % 2000 as g, x % 13 as v "
              f"from range({n}) r(x)")
    q = "select g, approx_count_distinct(v) a from hb group by g order by g"
    rows = c.execute(q).rows
    assert c._exec_path == "device_plan_mesh"
    host = Connection()
    host.catalog = c.catalog
    import infera_tpu.sql.device_plan as dp
    with monkeypatch.context() as m:
        m.setattr(dp, "try_execute_on_device", lambda *a, **k: None)
        hrows = host.execute(q).rows
    assert rows == hrows  # same splitmix64 registers → identical estimate


def test_mesh_median_quantile_bisection(monkeypatch):
    """median/quantile on the mesh: global counts fix the ranks, then a
    32-step bitwise bisection selects exact order statistics with only
    [G]-sized count vectors crossing the exchange (VERDICT r3 item 5)."""
    c = Connection()
    c.set_mesh(8)
    _mk(c)
    rows = _check(
        c, "select g, median(v) m, quantile_cont(v, 0.25) qc, "
           "quantile_disc(v, 0.9) qd from t group by g order by g",
        monkeypatch, "device_plan_mesh")
    x = np.arange(N)
    g = x % 5
    v = ((x % 40).astype(np.float32) / np.float32(4.0)
         - np.float32(3.0)).astype(np.float64)
    for key, m, qc, qd in rows:
        vals = np.sort(v[g == key])
        assert m == pytest.approx(np.median(vals), abs=1e-6)
        assert qc == pytest.approx(np.quantile(vals, 0.25), abs=1e-6)
        idx = max(int(np.ceil(0.9 * len(vals))) - 1, 0)
        assert qd == pytest.approx(vals[idx], abs=1e-6)


def test_empty_selection_renders_null(conn, monkeypatch):
    """Review r4: a global aggregate whose WHERE selects zero rows renders
    NULL for bool_and/bool_or/product/approx_count_distinct/sum/min — the
    device identities (True/False/1.0/0/0.0/inf) must never leak."""
    c, path = conn
    q = ("select bool_and(v > 0), bool_or(v > 0), product(v), "
         "approx_count_distinct(iv), sum(v), min(v) from t "
         "where v > 1000.0")
    rows = c.execute(q).rows
    assert rows[0] == (None, None, None, None, None, None)
