"""Streaming ∘ mesh composition (round-3, VERDICT item 3): tables larger
than one device's memory budget execute across the dp mesh chunk-by-chunk —
each device scans CHUNK_ROWS rows per step (fixed HBM footprint), partial
group tables merge across devices in-program (psum/pmin/pmax over ICI), and
the host folds per-chunk partials in f64 exactly as the single-device
streaming plan does. This is the architecture for BASELINE.json config 5
(billion-row partitioned table) validated on the 8-device virtual mesh."""

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.sql import Connection

NDEV = 8


@pytest.fixture()
def small_chunks(monkeypatch):
    from infera_tpu.sql import streaming_plan

    monkeypatch.setattr(streaming_plan, "STREAM_MIN_ROWS", 1 << 14)
    monkeypatch.setattr(streaming_plan, "CHUNK_ROWS", 4096)
    return streaming_plan


def test_streaming_mesh_matches_host(small_chunks, clean_registry, model_dir):
    """Grouped aggregates (f32 floats, EXACT int64 sums past 2^53, int64
    min/max, model predictions) over a multi-chunk scan on the mesh; chunk
    size does not divide the row count (padding-row coverage)."""
    conn = Connection()
    conn.set_mesh(NDEV)
    n = 4096 * NDEV * 2 + 777  # 2 full global chunks + a ragged tail
    base = (1 << 41) + 1
    conn.execute(
        f"create table big as select x % 6 as g, {base} + x as v, "
        f"(x % 100)::float / 10.0 as f1, ((x + 3) % 50)::float / 5.0 as f2, "
        f"((x * 7) % 30)::float / 3.0 as f3 from range({n}) r(x)")
    it.load_model("linear", f"{model_dir}/linear.onnx")
    rows = conn.execute(
        "select g, count(*) c, sum(v) s, min(v), max(v), sum(f1), "
        "avg(infera_predict('linear', f1, f2, f3)) p "
        "from big where f1 > 1.0 group by g order by g").rows
    assert conn._exec_path == "streaming_plan_mesh"
    x = np.arange(n, dtype=np.int64)
    g = x % 6
    f1 = (x % 100).astype(np.float32) / np.float32(10.0)
    f2 = ((x + 3) % 50).astype(np.float32) / np.float32(5.0)
    f3 = ((x * 7) % 30).astype(np.float32) / np.float32(3.0)
    pred = (2 * f1 - f2 + 0.5 * f3 + np.float32(0.25)).astype(np.float64)
    sel = f1 > 1.0
    assert len(rows) == 6
    for key, c, s, mn, mx, sf, p in rows:
        m = sel & (g == key)
        idx = x[m]
        assert c == int(m.sum())
        assert s == sum(base + int(i) for i in idx)  # bit-exact int64
        assert mn == base + int(idx.min())
        assert mx == base + int(idx.max())
        assert sf == pytest.approx(float(f1[m].astype(np.float64).sum()),
                                   rel=1e-6)
        assert p == pytest.approx(float(pred[m].mean()), rel=1e-4)


def test_streaming_mesh_global_aggregate(small_chunks, clean_registry):
    conn = Connection()
    conn.set_mesh(NDEV)
    n = 4096 * NDEV * 3 + 5
    conn.execute(f"create table t as select x % 9 as h, (x % 13)::float as f "
                 f"from range({n}) r(x)")
    rows = conn.execute("select count(*), sum(f), max(f) from t").rows
    assert conn._exec_path == "streaming_plan_mesh"
    x = np.arange(n)
    f = (x % 13).astype(np.float64)
    assert rows[0][0] == n
    assert rows[0][1] == pytest.approx(float(f.sum()), rel=1e-9)
    assert rows[0][2] == 12.0


def test_streaming_mesh_no_mesh_single_device(small_chunks, clean_registry):
    """Without a mesh the path label stays streaming_plan (no regression)."""
    conn = Connection()
    conn.set_mesh(None)
    n = 4096 * 8 + 1
    conn.execute(f"create table t as select x % 3 as g, (x % 7)::float as f "
                 f"from range({n}) r(x)")
    rows = conn.execute("select g, count(*) from t group by g order by g").rows
    assert conn._exec_path == "streaming_plan"
    assert sum(r[1] for r in rows) == n


def test_streaming_mesh_64m_columnar(tmp_path, clean_registry):
    """The VERDICT item-3 bar: a 64M-row memmap-backed read_columnar GROUP
    BY executes with path=streaming_plan_mesh on the 8-device virtual mesh,
    bit-exact for int64 sums past 2^53. Per-device peak HBM is bounded by
    construction: each device holds CHUNK_ROWS (2^20) rows per column per
    step — 8 MiB for the int64 word pair — independent of the 64M-row
    table (the full table never uploads; chunks stream through the memmap)."""
    from infera_tpu.columnar import Column, Table
    from infera_tpu.columnar import types as T
    from infera_tpu.columnar.diskfile import write_columnar

    n = 64 * (1 << 20)
    base = (1 << 38) + 1  # per-group sums ~2^60: past f64 exactness (2^53),
    # under the 2^62 overflow guard
    x = np.arange(n, dtype=np.int64)
    d = tmp_path / "big_col"
    write_columnar(Table({
        "g": Column((x % 16).astype(np.int64), T.BIGINT),
        "v": Column(base + x, T.BIGINT),
    }), str(d))
    del x

    conn = Connection()
    conn.set_mesh(NDEV)
    rows = conn.execute(
        f"select g, count(*) c, sum(v) s from read_columnar('{d}') "
        f"group by g order by g").rows
    assert conn._exec_path == "streaming_plan_mesh"
    assert len(rows) == 16
    per = n // 16
    for key, c, s in rows:
        assert c == per
        # sum over x ≡ key (mod 16): per*base + sum(key + 16*j for j<per)
        expect = per * base + per * key + 16 * (per * (per - 1) // 2)
        assert s == expect  # bit-exact; f64 would round (sums ~2^47·…)
