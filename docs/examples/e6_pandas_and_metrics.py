"""pandas interop + query metrics: register a DataFrame, predict over it in
SQL, read the per-statement metrics (rows/s + execution path)."""

import tempfile

import numpy as np
import pandas as pd

from infera_tpu.observability import METRICS
from infera_tpu.onnx.builder import write_reference_test_models
from infera_tpu.sql import Connection

with tempfile.TemporaryDirectory() as models:
    write_reference_test_models(models)
    conn = Connection()
    conn.execute(f"select infera_load_model('linear', '{models}/linear.onnx')")

    n = 40_000
    df = pd.DataFrame({
        "g": np.arange(n) % 4,
        "f1": (np.arange(n) % 10).astype(np.float32),
        "f2": np.ones(n, np.float32),
        "f3": np.full(n, 2.0, np.float32),
    })
    conn.register_table("obs", df)
    out = conn.execute(
        "select g, count(*) c, avg(infera_predict('linear', f1, f2, f3)) p "
        "from obs group by g order by g").df()
    print(out)
    m = METRICS.entries[0].as_dict()
    print(f"served by {m['path']}: {m['rows_per_s']:,.0f} rows/s")
