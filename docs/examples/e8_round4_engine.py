"""Round-4 engine tour: Pallas-fused SQL plans, the big×big shuffle join,
the extended aggregate tail (device HLL, arg_min/arg_max, count_if,
product), vectorized windows with DESC RANGE offsets, and EXPLAIN ANALYZE
showing which execution tier served each query."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("INFERA_PALLAS_SQL", "1")  # interpret-mode demo on CPU

from infera_tpu.sql import Connection

conn = Connection()
n = 1 << 15

# --- Pallas-fused plan: predict + filter + grouped aggregates run inside
# ONE kernel pass (path=device_plan_pallas on TPU; interpret mode here)
import tempfile

import infera_tpu as it
from infera_tpu.onnx.builder import mlp_model

with tempfile.NamedTemporaryFile(suffix=".onnx", delete=False) as f:
    f.write(mlp_model(in_dim=3, hidden=(16,), out_dim=1,
                      softmax=False).serialize())
    model_path = f.name
it.load_model("scorer", model_path)
conn.execute(
    f"create table events as select x % 32 as segment, "
    f"(x % 100)::float / 10.0 as f1, ((x + 3) % 50)::float / 5.0 as f2, "
    f"((x * 7) % 30)::float / 3.0 as f3 from range({n}) r(x)")
rows = conn.execute(
    "select segment, count(*) c, avg(infera_predict('scorer', f1, f2, f3)) "
    "score from events where f1 > 2.0 group by segment order by segment "
    "limit 3").rows
print("pallas plan head:", rows, "path:", conn._exec_path)

# --- big×big shuffle join: duplicate keys on BOTH sides, no pair
# materialization (2.8e12 pairs counted exactly at the 16M benchmark)
conn.execute(f"create table fa as select x % 200 as k, x % 5 as g, "
             f"(x % 40)::float / 4.0 as v from range({n}) r(x)")
conn.execute(f"create table fb as select (x * 3) % 250 as k, "
             f"(x % 90)::float / 9.0 as w from range({n}) r(x)")
rows = conn.execute(
    "select g, count(*) pairs, sum(w) from fa join fb on fa.k = fb.k "
    "group by g order by g limit 2").rows
print("shuffle join head:", rows, "path:", conn._exec_path)

# --- extended aggregate tail on the fused device plan: a HOST-EXACT
# HyperLogLog (splitmix64 emulated in 32-bit limbs), arg extremes by row
# id, conditional counts
rows = conn.execute(
    "select count_if(v > 5.0) hot, approx_count_distinct(k) approx_keys, "
    "arg_max(k, v) top_key, bool_or(v > 9.5) any_near_max from fa").rows
print("aggregate tail:", rows[0])

# --- vectorized windows: packed-int64 sort, DESC RANGE offsets
rows = conn.execute(
    "select g, v, sum(v) over (partition by g order by v desc "
    "range between 1.0 preceding and current row) recent "
    "from fa order by g, v desc limit 3").rows
print("desc range frame head:", rows)

# --- EXPLAIN ANALYZE records the tier + per-phase wall clock
out = conn.execute(
    "explain analyze select g, count(*) from fa join fb on fa.k = fb.k "
    "group by g")
print("\n".join(r[0] for r in out.rows[-3:]))
