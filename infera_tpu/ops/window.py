"""Window-function evaluation (OVER clauses).

Host implementation: partition via group ids, order via lexsort, then one
pass in partition-major order. Frame semantics: ranking/offset functions use
the ORDER BY ordering; aggregate window functions use the whole partition
(the common unbounded frame)."""

from __future__ import annotations

import numpy as np

from ..columnar import Column, infer_sql_type
from ..columnar import types as T
from ..errors import SqlError
from .aggregate import group_ids_host

WINDOW_FUNCTIONS = frozenset({
    "row_number", "rank", "dense_rank", "ntile",
    "count", "sum", "avg", "mean", "min", "max",
    "lag", "lead", "first_value", "last_value",
})


def eval_window(wf, scope, eval_fn) -> Column:
    n = scope.num_rows
    name = wf.name.lower()
    if name not in WINDOW_FUNCTIONS:
        raise SqlError(f"Catalog Error: window function {wf.name} does not exist")

    part_cols = [eval_fn(e, scope) for e in wf.partition_by]
    parts, _ = group_ids_host(part_cols, n)

    order_cols = [eval_fn(item.expr, scope) for item in wf.order_by]
    sort_keys: list = []
    for col, item in zip(reversed(order_cols), reversed([i for i in wf.order_by])):
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
        if name == "row_number":
            for i, pos in enumerate(rows):
                out_vals[pos] = i + 1
        elif name in ("rank", "dense_rank"):
            rank = 0
            dense = 0
            prev = object()
            for i, pos in enumerate(rows):
                k = order_key(pos)
                if k != prev:
                    rank = i + 1
                    dense += 1
                    prev = k
                out_vals[pos] = rank if name == "rank" else dense
        elif name == "ntile":
            buckets = int(eval_fn(wf.args[0], scope).value(0))
            sz = len(rows)
            for i, pos in enumerate(rows):
                out_vals[pos] = i * buckets // sz + 1
        elif name in ("lag", "lead"):
            offset = 1
            default = None
            if len(wf.args) > 1:
                offset = int(eval_fn(wf.args[1], scope).value(0))
            if len(wf.args) > 2:
                default = eval_fn(wf.args[2], scope).value(0)
            for i, pos in enumerate(rows):
                j = i - offset if name == "lag" else i + offset
                out_vals[pos] = (arg_col.value(rows[j])
                                 if 0 <= j < len(rows) else default)
        elif name == "first_value":
            v = arg_col.value(rows[0])
            for pos in rows:
                out_vals[pos] = v
        elif name == "last_value":
            v = arg_col.value(rows[-1])
            for pos in rows:
                out_vals[pos] = v
        else:  # partition aggregates
            if name == "count":
                v = (len(rows) if arg_col is None
                     else sum(arg_col.value(p) is not None for p in rows))
            else:
                vals = [arg_col.value(p) for p in rows
                        if arg_col.value(p) is not None]
                if not vals:
                    v = None
                elif name == "sum":
                    v = sum(vals)
                elif name in ("avg", "mean"):
                    v = sum(vals) / len(vals)
                elif name == "min":
                    v = min(vals)
                elif name == "max":
                    v = max(vals)
            for pos in rows:
                out_vals[pos] = v

    if name in ("row_number", "rank", "dense_rank", "ntile", "count"):
        out_type = T.BIGINT
    elif name in ("lag", "lead", "first_value", "last_value") and arg_col is not None:
        out_type = arg_col.sql_type
    else:
        out_type = infer_sql_type(out_vals)
    return Column.from_values(out_vals, out_type)
