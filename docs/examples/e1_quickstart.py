"""Quickstart: load a model and predict from SQL (analog of the reference's
docs/examples/e1 SQL walkthrough)."""

import tempfile

from infera_tpu.onnx.builder import write_reference_test_models
from infera_tpu.sql import Connection

with tempfile.TemporaryDirectory() as models:
    write_reference_test_models(models)
    conn = Connection()
    conn.execute(f"select infera_load_model('linear', '{models}/linear.onnx')")
    print(conn.execute("select infera_get_model_info('linear')").rows[0][0])
    print(conn.execute("select infera_predict('linear', 1.0, 2.0, 3.0)").rows)
    conn.execute(
        "create table obs as select x::float as f1, (x+1)::float as f2, "
        "(x+2)::float as f3 from range(5) r(x)"
    )
    for row in conn.execute(
        "select f1, infera_predict('linear', f1, f2, f3) as y from obs"
    ).rows:
        print(row)
