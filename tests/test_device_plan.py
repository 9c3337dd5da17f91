"""Fused device SQL execution (device_plan): results must match the host
path exactly for eligible queries, and ineligible queries must fall back."""

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.sql import Connection
from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS


@pytest.fixture()
def conn_big(model_dir, clean_registry):
    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(
        f"create table big as select x % 7 as g, (x % 100)::float / 10.0 as f1, "
        f"((x + 3) % 50)::float / 5.0 as f2, ((x * 7) % 30)::float / 3.0 as f3 "
        f"from range({n}) r(x)"
    )
    it.load_model("linear", f"{model_dir}/linear.onnx")
    return conn, n


def _host_frame(n):
    x = np.arange(n, dtype=np.int64)
    g = x % 7
    f1 = (x % 100).astype(np.float32) / np.float32(10.0)
    f2 = ((x + 3) % 50).astype(np.float32) / np.float32(5.0)
    f3 = ((x * 7) % 30).astype(np.float32) / np.float32(3.0)
    return g, f1, f2, f3


def test_fused_global_aggregate_with_predict(conn_big):
    conn, n = conn_big
    rows = conn.execute(
        "select count(*), avg(infera_predict('linear', f1, f2, f3)), "
        "sum(f1) from big"
    ).rows
    g, f1, f2, f3 = _host_frame(n)
    pred = 2 * f1 - f2 + 0.5 * f3 + np.float32(0.25)
    assert rows[0][0] == n
    assert rows[0][1] == pytest.approx(float(pred.mean()), rel=1e-4)
    assert rows[0][2] == pytest.approx(float(f1.sum()), rel=1e-4)


def test_fused_filtered_groupby_predict(conn_big):
    conn, n = conn_big
    rows = conn.execute(
        "select g, count(*) c, avg(infera_predict('linear', f1, f2, f3)) p "
        "from big where f1 > 5.0 group by g order by g"
    ).rows
    g, f1, f2, f3 = _host_frame(n)
    pred = 2 * f1 - f2 + 0.5 * f3 + np.float32(0.25)
    sel = f1 > 5.0
    assert len(rows) == 7
    for key, c, p in rows:
        mask = sel & (g == key)
        assert c == int(mask.sum())
        assert p == pytest.approx(float(pred[mask].mean()), rel=1e-4)


def test_fused_min_max(conn_big):
    conn, n = conn_big
    rows = conn.execute("select min(f2), max(f3) from big where g = 3").rows
    g, f1, f2, f3 = _host_frame(n)
    mask = g == 3
    assert rows[0][0] == pytest.approx(float(f2[mask].min()))
    assert rows[0][1] == pytest.approx(float(f3[mask].max()))


def test_integer_sum_falls_back_to_exact_host(conn_big):
    conn, n = conn_big
    # integer sums must be exact → host path (f32 would lose precision)
    rows = conn.execute("select sum(g) from big").rows
    g, *_ = _host_frame(n)
    assert rows[0][0] == int(g.sum())


def test_small_tables_stay_on_host(model_dir, clean_registry):
    conn = Connection()
    conn.execute("create table small as select 1.0::float f1 from range(10) r(x)")
    rows = conn.execute("select count(*), sum(f1) from small").rows
    assert rows[0] == (10, 10.0)


def test_fused_matches_volatile_semantics(conn_big):
    """After unload, a fused-eligible query must fail like the host path
    (the model is resolved per execution, never cached in a stale plan)."""
    conn, n = conn_big
    conn.execute("select avg(infera_predict('linear', f1, f2, f3)) from big")
    it.unload_model("linear")
    with pytest.raises(Exception) as ei:
        conn.execute("select avg(infera_predict('linear', f1, f2, f3)) from big")
    assert "Model not found: linear" in str(ei.value)


def test_explain_reports_fused_plan(conn_big):
    conn, n = conn_big
    rows = conn.execute(
        "explain select g, count(*), avg(infera_predict('linear', f1, f2, f3)) "
        "from big where f1 > 5.0 group by g"
    ).rows
    text = "\n".join(r[0] for r in rows)
    assert "fused device plan" in text
    assert "SCAN big" in text
    # integer sum → host operators
    rows = conn.execute("explain select sum(g) from big").rows
    text = "\n".join(r[0] for r in rows)
    assert "host/hybrid operators" in text
