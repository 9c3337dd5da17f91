"""Observability subsystem tests: metrics registry, measure(), logging."""

import sys

import pytest

from infera_tpu import log, observability as obs
from infera_tpu import config as config_mod
from infera_tpu.config import LogLevel


def test_measure_records_metrics():
    start = len(obs.METRICS.entries)
    with obs.measure("q1", rows=1000) as m:
        pass
    assert len(obs.METRICS.entries) == start + 1
    rec = obs.METRICS.entries[0]
    assert rec.name == "q1" and rec.rows == 1000
    assert rec.wall_s >= 0
    d = rec.as_dict()
    assert set(d) == {"name", "rows", "wall_ms", "rows_per_s", "bytes_in"}


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

    start = len(obs.METRICS.entries)
    conn = Connection()
    conn.execute("select 1, 2, 3")
    assert len(obs.METRICS.entries) > start
    rec = obs.METRICS.entries[0]
    assert rec.name == "Select"
    assert rec.rows == 1
