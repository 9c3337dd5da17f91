"""Window-function evaluation (OVER clauses).

Host implementation: partition via group ids, order via lexsort, then one
pass in partition-major order. Frame semantics follow the standard:

- ranking/offset functions (row_number, rank, dense_rank, percent_rank,
  cume_dist, ntile, lag, lead) use the ORDER BY ordering, no frame;
- aggregate and value functions (count/sum/avg/min/max, first_value/
  last_value/nth_value) evaluate over the window FRAME. The default frame
  is RANGE UNBOUNDED PRECEDING..CURRENT ROW when ORDER BY is present
  (running aggregates including peer rows — round-3 fix: the previous
  implementation used the whole partition, which diverges from the
  DuckDB/standard semantics the reference's host would give), else the
  whole partition. ROWS frames take positional bounds; RANGE supports
  UNBOUNDED/CURRENT bounds (peer groups) and numeric offsets over a
  single ascending numeric ORDER BY key.
"""

from __future__ import annotations

import numpy as np

from ..columnar import Column, infer_sql_type
from ..columnar import types as T
from ..errors import SqlError
from .aggregate import group_ids_host

WINDOW_FUNCTIONS = frozenset({
    "row_number", "rank", "dense_rank", "ntile",
    "percent_rank", "cume_dist",
    "count", "sum", "avg", "mean", "min", "max",
    "lag", "lead", "first_value", "last_value", "nth_value",
})

_FRAMED = frozenset({"count", "sum", "avg", "mean", "min", "max",
                     "first_value", "last_value", "nth_value"})


def _frame_bounds(frame, i, n_rows, peer_lo, peer_hi, keyvals, asc):
    """Resolve the frame to inclusive [lo, hi] indices within the ordered
    partition for the row at position i."""
    unit, start, end = frame

    def one(b, is_start):
        if b == "unbounded_preceding":
            return 0
        if b == "unbounded_following":
            return n_rows - 1
        if unit == "rows":
            if b == "current":
                return i
            kind, k = b
            k = int(k)
            return i - k if kind == "preceding" else i + k
        # range
        if b == "current":
            return peer_lo if is_start else peer_hi
        kind, k = b
        if keyvals is None:
            raise SqlError(
                "Binder Error: RANGE offsets need a single ascending "
                "numeric ORDER BY key")
        v = keyvals[i]
        delta = float(k)
        target = v - delta if kind == "preceding" else v + delta
        # the searchsorted side follows the bound POSITION, not its kind:
        # a frame start is the first ordered row with key >= target, a
        # frame end the last row with key <= target (round-4 fix: choosing
        # the side by preceding/following included the row's own peers in
        # '… AND 1 PRECEDING' frames and dropped peers at the frame end)
        if is_start:
            return int(np.searchsorted(keyvals, target, side="left"))
        return int(np.searchsorted(keyvals, target, side="right")) - 1

    lo = max(one(start, True), 0)
    hi = min(one(end, False), n_rows - 1)
    return lo, hi


def eval_window(wf, scope, eval_fn) -> Column:
    n = scope.num_rows
    name = wf.name.lower()
    if name not in WINDOW_FUNCTIONS:
        raise SqlError(f"Catalog Error: window function {wf.name} does not exist")

    part_cols = [eval_fn(e, scope) for e in wf.partition_by]
    parts, _ = group_ids_host(part_cols, n)

    order_cols = [eval_fn(item.expr, scope) for item in wf.order_by]
    sort_keys: list = []
    for col, item in zip(reversed(order_cols), reversed(list(wf.order_by))):
        data = col.data
        if data.dtype == object:
            ranks = np.argsort(np.argsort([str(v) for v in data]))
            vals = ranks.astype(np.float64)
        else:
            vals = data.astype(np.float64)
        if not item.ascending:
            vals = -vals
        vals = np.where(col.valid_mask(), vals, np.inf)
        sort_keys.append(vals)
    sort_keys.append(parts.astype(np.float64))  # partition most significant
    order = np.lexsort(sort_keys)

    arg_col = eval_fn(wf.args[0], scope) if wf.args else None

    frame = wf.frame
    if frame is None and name in _FRAMED:
        frame = (("range", "unbounded_preceding", "current")
                 if wf.order_by
                 else ("rows", "unbounded_preceding",
                       "unbounded_following"))

    # RANGE numeric offsets: single ASCENDING numeric key (descending
    # offset frames raise through _frame_bounds' keyvals guard)
    range_key = None
    range_asc = True
    if (frame is not None and frame[0] == "range"
            and len(order_cols) == 1
            and order_cols[0].data.dtype != object
            and wf.order_by[0].ascending):
        range_key = order_cols[0].data.astype(np.float64)

    out_vals: list = [None] * n

    # positions of each partition's rows, in window order
    part_rows: dict = {}
    for pos in order:
        part_rows.setdefault(parts[pos], []).append(pos)

    def order_key(pos):
        return tuple(
            (col.value(pos) is None, col.value(pos)) for col in order_cols
        )

    for rows in part_rows.values():
        n_rows = len(rows)
        if name == "row_number":
            for i, pos in enumerate(rows):
                out_vals[pos] = i + 1
            continue
        if name in ("rank", "dense_rank", "percent_rank", "cume_dist"):
            ranks = [0] * n_rows
            denses = [0] * n_rows
            rank = 0
            dense = 0
            prev = object()
            for i, pos in enumerate(rows):
                k = order_key(pos)
                if k != prev:
                    rank = i + 1
                    dense += 1
                    prev = k
                ranks[i] = rank
                denses[i] = dense
            if name == "cume_dist":
                # rows with order key <= current / partition rows
                hi = [0] * n_rows
                j = n_rows - 1
                for i in range(n_rows - 1, -1, -1):
                    if i < n_rows - 1 and \
                            order_key(rows[i]) != order_key(rows[i + 1]):
                        j = i
                    hi[i] = j
                for i, pos in enumerate(rows):
                    out_vals[pos] = (hi[i] + 1) / n_rows
            else:
                for i, pos in enumerate(rows):
                    if name == "rank":
                        out_vals[pos] = ranks[i]
                    elif name == "dense_rank":
                        out_vals[pos] = denses[i]
                    else:  # percent_rank
                        out_vals[pos] = (0.0 if n_rows == 1
                                         else (ranks[i] - 1) / (n_rows - 1))
            continue
        if name == "ntile":
            buckets = int(eval_fn(wf.args[0], scope).value(0))
            for i, pos in enumerate(rows):
                out_vals[pos] = i * buckets // n_rows + 1
            continue
        if name in ("lag", "lead"):
            offset = 1
            default = None
            if len(wf.args) > 1:
                offset = int(eval_fn(wf.args[1], scope).value(0))
            if len(wf.args) > 2:
                default = eval_fn(wf.args[2], scope).value(0)
            for i, pos in enumerate(rows):
                j = i - offset if name == "lag" else i + offset
                out_vals[pos] = (arg_col.value(rows[j])
                                 if 0 <= j < n_rows else default)
            continue

        # --- framed aggregates / value functions -------------------------
        # peer spans for RANGE CURRENT bounds
        peer_lo = [0] * n_rows
        peer_hi = [0] * n_rows
        i = 0
        while i < n_rows:
            j = i
            while j + 1 < n_rows and \
                    order_key(rows[j + 1]) == order_key(rows[i]):
                j += 1
            for k in range(i, j + 1):
                peer_lo[k] = i
                peer_hi[k] = j
            i = j + 1
        keyvals = (range_key[rows] if range_key is not None else None)
        vals = [arg_col.value(p) for p in rows] if arg_col is not None \
            else None
        arg_is_int = arg_col is not None and arg_col.sql_type.is_integer
        # prefix sums/counts for the running fast path
        if name in ("count", "sum", "avg", "mean") and vals is not None:
            pc = np.cumsum([v is not None for v in vals])
            ps = np.cumsum([float(v) if v is not None else 0.0
                            for v in vals])
        for i, pos in enumerate(rows):
            lo, hi = _frame_bounds(frame, i, n_rows, peer_lo[i],
                                   peer_hi[i], keyvals, range_asc)
            if lo > hi:
                out_vals[pos] = 0 if name == "count" else None
                continue
            if name == "count":
                if arg_col is None:
                    out_vals[pos] = hi - lo + 1
                else:
                    out_vals[pos] = int(
                        pc[hi] - (pc[lo - 1] if lo else 0))
            elif name in ("sum", "avg", "mean"):
                c = int(pc[hi] - (pc[lo - 1] if lo else 0))
                if c == 0:
                    out_vals[pos] = None
                else:
                    s = float(ps[hi] - (ps[lo - 1] if lo else 0.0))
                    if name == "sum":
                        # SUM over an integer column stays BIGINT (the f64
                        # prefix sum is exact below 2^53)
                        out_vals[pos] = int(s) if arg_is_int else s
                    else:
                        out_vals[pos] = s / c
            elif name in ("min", "max"):
                w = [v for v in vals[lo:hi + 1] if v is not None]
                out_vals[pos] = (None if not w
                                 else (min(w) if name == "min" else max(w)))
            elif name == "first_value":
                out_vals[pos] = vals[lo]
            elif name == "last_value":
                out_vals[pos] = vals[hi]
            else:  # nth_value(arg, k) — k-th frame row, 1-based
                k = int(eval_fn(wf.args[1], scope).value(0))
                out_vals[pos] = (vals[lo + k - 1]
                                 if 1 <= k <= hi - lo + 1 else None)

    if name in ("row_number", "rank", "dense_rank", "ntile", "count"):
        out_type = T.BIGINT
    elif name in ("percent_rank", "cume_dist"):
        out_type = T.DOUBLE
    elif name in ("lag", "lead", "first_value", "last_value",
                  "nth_value") and arg_col is not None:
        out_type = arg_col.sql_type
    else:
        out_type = infer_sql_type(out_vals)
    return Column.from_values(out_vals, out_type)
