"""Out-of-core columnar tables + streaming fused aggregation: COPY a table
to the columnar format, reopen it memmap-backed, aggregate on device."""

import tempfile

from infera_tpu.sql import Connection

with tempfile.TemporaryDirectory() as d:
    conn = Connection()
    conn.execute("create table t as select x % 16 as g, "
                 "(x % 1000)::float / 100.0 as v from range(120000) r(x)")
    print(conn.execute(f"copy t to '{d}/t_col' (format columnar)").rows)
    rows = conn.execute(
        f"select g, count(*) c, round(sum(v), 1) s "
        f"from read_columnar('{d}/t_col') group by g order by g limit 4").rows
    for r in rows:
        print(r)
    # EXPLAIN ANALYZE shows the path that served the query
    for (line,) in conn.execute(
            "explain analyze select count(*), sum(v) from t").rows:
        print(line)
