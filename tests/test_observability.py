"""Observability subsystem tests: metrics registry, measure(), logging."""

import sys

import pytest

from infera_tpu import log, observability as obs
from infera_tpu import config as config_mod
from infera_tpu.config import LogLevel


def test_measure_records_metrics():
    with obs.measure("q1", rows=1000) as m:
        pass
    # search instead of indexing: METRICS is process-global and other
    # machinery (lingering test servers/threads) may interleave records
    rec = next(r for r in obs.METRICS.entries if r.name == "q1")
    assert rec.rows == 1000
    assert rec.wall_s >= 0
    d = rec.as_dict()
    assert {"name", "rows", "wall_ms", "rows_per_s", "bytes_in",
            "path"} <= set(d)


def test_metrics_ring_capacity():
    reg = obs.MetricsRegistry(capacity=3)
    for i in range(5):
        reg.record(obs.QueryMetrics(name=f"q{i}", rows=i, wall_s=1.0))
    assert len(reg.entries) == 3
    assert reg.entries[0].name == "q4"  # most recent first


def test_log_level_gating(capsys, monkeypatch):
    monkeypatch.setenv("INFERA_LOG_LEVEL", "ERROR")
    config_mod.reset_config_for_tests()
    log.warn("hidden")
    log.error("shown")
    err = capsys.readouterr().err
    assert "[ERROR] shown" in err
    assert "hidden" not in err
    config_mod.reset_config_for_tests()


def test_log_format(capsys, monkeypatch):
    monkeypatch.setenv("INFERA_LOG_LEVEL", "DEBUG")
    config_mod.reset_config_for_tests()
    log.debug("details here")
    assert "[DEBUG] details here" in capsys.readouterr().err
    config_mod.reset_config_for_tests()


def test_annotate_is_usable():
    with obs.annotate("op-name"):
        x = sum(range(10))
    assert x == 45


def test_sql_execute_records_metrics():
    from infera_tpu.sql import Connection

    conn = Connection()
    conn.execute("select 1, 2, 3")
    rec = next(r for r in obs.METRICS.entries if r.name == "Select")
    assert rec.rows == 1


def test_metrics_record_execution_path(model_dir, clean_registry,
                                        monkeypatch):
    """Per-statement metrics name the path that served the query
    (host / device_plan / device_join_plan / streaming_plan). Pins the
    XLA tier names — the pallas knob is held off (its _pallas suffixes
    are covered by tests/test_pallas_sql.py)."""
    monkeypatch.setenv("INFERA_PALLAS_SQL", "0")
    import infera_tpu as it
    from infera_tpu.observability import METRICS
    from infera_tpu.sql import Connection
    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(f"create table pt as select x % 5 as g, "
                 f"(x % 9)::float as f from range({n}) r(x)")
    conn.execute("select g, sum(f) from pt group by g")
    assert METRICS.entries[0].path == "device_plan"
    conn.execute("select f from pt limit 3")
    assert METRICS.entries[0].path == "host"


def test_explain_analyze_reports_actuals(model_dir, clean_registry):
    from infera_tpu.sql import Connection
    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(f"create table ea as select x % 4 as g, "
                 f"(x % 9)::float as f from range({n}) r(x)")
    rows = conn.execute(
        "explain analyze select g, sum(f) from ea group by g").rows
    text = "\n".join(r[0] for r in rows)
    assert "fused device plan" in text
    assert "ACTUAL: 4 rows" in text
    assert "PATH: device_plan" in text
    # plain EXPLAIN must not execute: ACTUAL line absent
    rows = conn.execute("explain select g, sum(f) from ea group by g").rows
    assert not any("ACTUAL" in r[0] for r in rows)


def test_device_plan_phase_breakdown(clean_registry, monkeypatch):
    """Fused plans record a per-phase wall breakdown (plan/probe/upload/
    exec+readback) in METRICS and EXPLAIN ANALYZE (round-3, VERDICT item 5).
    Pins the XLA program's schema — the pallas path records its own
    (plan/probe/pallas_exec), so the knob is held off here."""
    monkeypatch.setenv("INFERA_PALLAS_SQL", "0")
    from infera_tpu.observability import METRICS
    from infera_tpu.sql import Connection
    from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS

    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(f"create table t as select x % 4 as g, (x % 9)::float as f "
                 f"from range({n}) r(x)")
    conn.execute("select g, count(*), sum(f) from t group by g order by g")
    assert conn._exec_path == "device_plan"
    m = METRICS.entries[0].as_dict()
    assert m["path"] == "device_plan"
    ph = m["phases"]
    assert set(ph) >= {"plan_ms", "probe_ms", "upload_ms",
                       "exec_readback_ms", "compiled"}
    assert ph["compiled"] is True  # first execution traced+compiled
    text = "\n".join(r[0] for r in conn.execute(
        "explain analyze select g, count(*), sum(f) from t group by g").rows)
    assert "PHASES: " in text and "exec_readback_ms=" in text
    # identical statement re-runs against the cached compiled plan
    conn.execute("select g, count(*), sum(f) from t group by g order by g")
    m2 = METRICS.entries[0].as_dict()
    assert m2["phases"]["compiled"] is False

    # host statements carry no phase breakdown
    conn.execute("select 1")
    assert METRICS.entries[0].as_dict().get("phases") is None
