"""Analytics SQL surface (round 3): subqueries, grouping sets, window
frames, quantiles, and outer-join aggregates — all through the same
Connection that serves the reference's 13 infera_* functions."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from infera_tpu.sql import Connection

conn = Connection()
conn.execute(
    "create table sales as select x % 4 as region, x % 12 as month, "
    "(x % 97)::float + 1.0 as amount, x % 50 as customer "
    "from range(20000) r(x)")
conn.execute(
    "create table region_names as select x as region, "
    "'R' || x::varchar as name from range(3) r(x)")  # region 3 unmatched

# ROLLUP: per-(region, month) totals + region subtotals + grand total
rows = conn.execute(
    "select region, month, sum(amount) from sales "
    "group by rollup(region, month) order by region, month limit 5").rows
print("rollup head:", rows[:3])

# window frames: 3-month moving average per region
rows = conn.execute(
    "select region, month, avg(amount) over (partition by region "
    "order by month rows between 2 preceding and current row) ma "
    "from (select region, month, sum(amount) amount from sales "
    "group by region, month) order by region, month limit 4").rows
print("moving avg head:", rows[:2])

# quantiles ride the fused device plan at scale (literal fractions)
rows = conn.execute(
    "select region, quantile_cont(amount, 0.5) p50, "
    "quantile_cont(amount, 0.95) p95 from sales group by region "
    "order by region").rows
print("p50/p95 per region:", rows[0])

# correlated EXISTS: regions whose top sale exceeds a threshold
rows = conn.execute(
    "select region from region_names rn where exists "
    "(select 1 from sales s where s.region = rn.region "
    "and s.amount > 95.0) order by region").rows
print("regions with >95 sales:", [r[0] for r in rows])

# LEFT-join aggregate with NULL-correct counts (fused on device at scale)
rows = conn.execute(
    "select count(*) n, count(name) matched from sales "
    "left join region_names on sales.region = region_names.region").rows
print("left join counts:", rows[0])
assert rows[0][0] == 20000 and rows[0][1] == 15000
