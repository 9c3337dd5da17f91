"""CSV import/export via read_csv() and COPY ... TO."""

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.errors import SqlError
from infera_tpu.sql import Connection


def test_roundtrip(tmp_path):
    conn = Connection()
    conn.execute(
        "create table t as select x as id, (x * 1.5)::double as v, "
        "case when x % 2 = 0 then 'even' else 'odd' end as tag "
        "from range(5) r(x)"
    )
    path = tmp_path / "t.csv"
    res = conn.execute(f"copy t to '{path}'")
    assert res.rows == [(5,)]
    rows = conn.execute(f"select id, v, tag from read_csv('{path}') order by id").rows
    assert rows[0] == (0, 0.0, "even")
    assert rows[3] == (3, 4.5, "odd")
    assert len(rows) == 5


def test_copy_query_and_nulls(tmp_path):
    conn = Connection()
    path = tmp_path / "q.csv"
    conn.execute(
        f"copy (select 1 a, null b union all select 2, null) to '{path}'"
    )
    rows = conn.execute(f"select a, b is null from read_csv('{path}') order by a").rows
    assert rows == [(1, True), (2, True)]


def test_type_inference_mixed(tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("a,b,c\n1,1.5,x\n2,bad,y\n,,\n")
    conn = Connection()
    rows = conn.execute(f"select * from read_csv('{p}')").rows
    assert rows[0] == (1, "1.5", "x")   # b degrades to VARCHAR on 'bad'
    assert rows[2] == (None, None, None)


def test_csv_predict_flow(tmp_path, model_dir, clean_registry):
    """End-to-end: CSV in → predict → COPY out."""
    src = tmp_path / "features.csv"
    src.write_text("f1,f2,f3\n1,2,3\n2,4,6\n")
    conn = Connection()
    conn.execute(f"select infera_load_model('linear', '{model_dir}/linear.onnx')")
    out = tmp_path / "preds.csv"
    conn.execute(
        f"copy (select f1, infera_predict('linear', f1::float, f2::float, "
        f"f3::float) y from read_csv('{src}')) to '{out}'"
    )
    rows = conn.execute(f"select y from read_csv('{out}') order by y").rows
    assert rows[0][0] == pytest.approx(1.75)
    assert rows[1][0] == pytest.approx(3.25)


def test_read_missing_file():
    conn = Connection()
    with pytest.raises(SqlError) as ei:
        conn.execute("select * from read_csv('/no/such/file.csv')")
    assert "IO Error" in str(ei.value)
