"""Billion-row streaming demonstration (VERDICT r4 item 9).

Runs the streaming fused-aggregate plan (sql/streaming_plan.py) over an
out-of-core 1e9-row columnar table on ONE chip, asserting the fixed-HBM
discipline (chunked memmap scan, int64 limb exactness, f64 combine) holds
at BASELINE.json config 5's scale axis. The table is generated once by the
companion generator (deterministic formulas: g = x %% 16, v = 3e10 + 7x,
f = (x %% 1000) / 8) so every aggregate asserts in closed form:

    count(g)  = N / 16                       (exact)
    sum(v)    = 3e10*cnt + 7 * sum(x over g) (exact int64 limb sums,
                                              ~2^61 — far past f64's 2^53)
    sum(f)    per group in closed form        (f64-combined)

Usage:  python -m infera_tpu.testing.billion_stream [dir]
Emits one JSON line: rows/s, wall seconds, chunk rows (the HBM bound),
device peak bytes when the platform reports memory_stats.
"""

from __future__ import annotations

import json
import sys
import time


def main(path: str = "/root/bench_data/billion") -> dict:
    import jax

    from ..sql import Connection
    from ..sql.streaming_plan import CHUNK_ROWS

    conn = Connection()
    t0 = time.perf_counter()
    q = (f"select g, count(*) c, sum(v) sv, sum(f) sf "
         f"from read_columnar('{path}') group by g order by g")
    rows = conn.execute(q).rows
    dt = time.perf_counter() - t0
    path_taken = conn._exec_path
    n = 1_000_000_000
    assert path_taken.startswith("streaming_plan"), path_taken
    assert len(rows) == 16

    # closed-form oracle per group g: rows are x = g, g+16, ... < N
    for g, c, sv, sf in rows:
        cnt = (n - g + 15) // 16
        assert c == cnt, (g, c, cnt)
        # sum of x over the group: arithmetic series
        sx = cnt * g + 16 * (cnt * (cnt - 1) // 2)
        want_v = 30_000_000_000 * cnt + 7 * sx
        assert sv == want_v, (g, sv, want_v)  # exact past 2^53
        # f = (x % 1000)/8 with x = g + 16k: x % 1000 cycles with period
        # lcm(16,1000)/16 = 125 over k — fold the cycle in closed form
        ks = range(125)
        cyc = sum(((g + 16 * k) % 1000) for k in ks) / 8.0
        full, rem = divmod(cnt, 125)
        tail = sum(((g + 16 * k) % 1000) for k in range(rem)) / 8.0
        want_f = full * cyc + tail
        assert abs(sf - want_f) <= 1e-6 * abs(want_f), (g, sf, want_f)

    stats = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        pass
    out = {
        "metric": "billion_row_streaming_rows_per_s_single_chip",
        "rows": n,
        "seconds": round(dt, 1),
        "rows_per_s": round(n / dt, 1),
        "path": path_taken,
        "chunk_rows": CHUNK_ROWS,
        "hbm_peak_bytes": stats.get("peak_bytes_in_use"),
        "exactness": "int64 limb sums past 2^53 + closed-form f64 float "
                     "sums, all 16 groups asserted",
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
