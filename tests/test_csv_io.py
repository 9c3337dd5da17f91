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


def test_native_csv_fast_path(tmp_path):
    """Numeric CSVs parse through the C fast path with the same typing and
    NULL semantics as the general reader."""
    from infera_tpu.runtime.native import csv_parse_numeric, native_available
    from infera_tpu.sql.csv_io import read_csv

    p = tmp_path / "n.csv"
    p.write_text("id,val,opt\n1,1.5,\n2,2.25,7\n3,-0.5,8\n")
    t = read_csv(str(p))
    assert t.columns["id"].sql_type.name == "BIGINT"
    assert t.columns["val"].sql_type.name == "DOUBLE"
    assert t.columns["opt"].sql_type.name == "BIGINT"
    np.testing.assert_array_equal(t.columns["id"].data, [1, 2, 3])
    np.testing.assert_allclose(t.columns["val"].data, [1.5, 2.25, -0.5])
    assert t.columns["opt"].is_null(0)
    assert t.columns["opt"].value(2) == 8
    if native_available():
        # the C parser really handled this body
        parsed = csv_parse_numeric(b"1,1.5,\n2,2.25,7\n3,-0.5,8\n", 3)
        assert parsed is not None
        values, valid, is_float = parsed
        assert values.shape == (3, 3)
        assert list(is_float) == [False, True, False]
        assert not valid[2][0] and valid[2][1]


def test_native_csv_falls_back_on_strings_and_quotes(tmp_path):
    from infera_tpu.sql.csv_io import read_csv

    p = tmp_path / "s.csv"
    p.write_text('id,name\n1,"alpha, beta"\n2,gamma\n')
    t = read_csv(str(p))
    assert t.columns["name"].value(0) == "alpha, beta"
    assert t.columns["id"].sql_type.name == "BIGINT"

    p2 = tmp_path / "m.csv"
    p2.write_text("id,label\n1,x\n2,y\n")
    t2 = read_csv(str(p2))
    assert t2.columns["label"].value(1) == "y"


def test_native_csv_scientific_and_crlf(tmp_path):
    from infera_tpu.sql.csv_io import read_csv

    p = tmp_path / "e.csv"
    p.write_bytes(b"a,b\r\n1e3,5\r\n-2.5E-1,6\r\n")
    t = read_csv(str(p))
    assert t.columns["a"].sql_type.name == "DOUBLE"
    np.testing.assert_allclose(t.columns["a"].data, [1000.0, -0.25])
    np.testing.assert_array_equal(t.columns["b"].data, [5, 6])


def test_native_csv_exact_big_int64(tmp_path):
    """|int| > 2^53 cannot round-trip through the C parser's f64 buffer —
    it must bail so the exact general reader runs (ADVICE r1, medium)."""
    from infera_tpu.runtime.native import csv_parse_numeric, native_available
    from infera_tpu.sql.csv_io import read_csv

    big = 9007199254740993  # 2^53 + 1: nearest double is 2^53
    p = tmp_path / "b.csv"
    p.write_text(f"id,v\n1,{big}\n2,7\n")
    t = read_csv(str(p))
    assert t.columns["v"].sql_type.name == "BIGINT"
    assert int(t.columns["v"].data[0]) == big
    if native_available():
        assert csv_parse_numeric(f"1,{big}\n2,7\n".encode(), 2) is None
        # in-range int64s still take the fast path exactly
        parsed = csv_parse_numeric(b"1,9007199254740992\n", 2)
        assert parsed is not None
        assert int(parsed[0][1][0]) == 9007199254740992
