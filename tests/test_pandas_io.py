"""pandas DataFrame interop (DuckDB-style registration + .df() results)."""

import numpy as np
import pandas as pd
import pytest

import infera_tpu as it
from infera_tpu.sql import Connection


def test_register_dataframe_and_query(clean_registry, model_dir):
    df = pd.DataFrame({
        "g": np.arange(1000) % 4,
        "f1": (np.arange(1000) % 10).astype(np.float32),
        "f2": np.ones(1000, np.float32),
        "f3": np.full(1000, 2.0, np.float32),
        "label": [f"cat_{i % 3}" for i in range(1000)],
    })
    conn = Connection()
    conn.register_table("df", df)
    it.load_model("linear", f"{model_dir}/linear.onnx")
    rows = conn.execute(
        "select g, count(*) c, avg(infera_predict('linear', f1, f2, f3)) p "
        "from df group by g order by g").rows
    assert len(rows) == 4
    f1 = (np.arange(1000) % 10).astype(np.float32)
    g = np.arange(1000) % 4
    pred = 2 * f1 - 1.0 + 0.5 * 2.0 + 0.25
    for key, c, p in rows:
        m = g == key
        assert c == int(m.sum())
        assert p == pytest.approx(float(pred[m].mean()), rel=1e-5)
    # string column querying
    rows = conn.execute(
        "select label, count(*) from df group by label order by label").rows
    assert rows == [("cat_0", 334), ("cat_1", 333), ("cat_2", 333)]


def test_nan_becomes_null():
    df = pd.DataFrame({"x": [1.0, np.nan, 3.0]})
    conn = Connection()
    conn.register_table("t", df)
    rows = conn.execute("select count(x), count(*), sum(x) from t").rows
    assert rows == [(2, 3, 4.0)]


def test_nullable_int_extension_dtype():
    df = pd.DataFrame({"x": pd.array([1, None, 3], dtype="Int64")})
    conn = Connection()
    conn.register_table("t", df)
    rows = conn.execute("select count(x), sum(x) from t").rows
    assert rows == [(2, 4)]


def test_result_df_roundtrip():
    conn = Connection()
    conn.execute("create table t as select x % 3 as g, (x * 1.5)::float as v "
                 "from range(9) r(x)")
    out = conn.execute("select g, sum(v) s from t group by g order by g").df()
    assert list(out.columns) == ["g", "s"]
    assert len(out) == 3
    x = np.arange(9)
    v = (x * 1.5).astype(np.float32)
    for i, kg in enumerate([0, 1, 2]):
        assert out["s"][i] == pytest.approx(float(v[x % 3 == kg].sum()))


def test_df_null_roundtrip():
    df = pd.DataFrame({"a": [1.0, np.nan], "s": ["x", None]})
    conn = Connection()
    conn.register_table("t", df)
    out = conn.execute("select a, s from t").df()
    assert np.isnan(out["a"][1])
    assert pd.isna(out["s"][1])
