"""Blockwise streaming execution: billion-row partitions through a fixed
HBM footprint.

SURVEY.md §5 identifies "blockwise streaming of billion-row partitions
through the inference operator" as the engine's scale axis (rows, not
sequence length). The driver below iterates a query step over fixed-size
row chunks: JAX's async dispatch pipelines chunk k+1's host→device transfer
with chunk k's compute (double-buffering falls out of the runtime; there's
no blocking read inside the loop), and the partial aggregates combine at
the end.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import numpy as np


def stream_query(chunks: Iterable, step_fn: Callable,
                 combine_fn: Callable, init):
    """Run ``step_fn(chunk_arrays) -> partial`` over every chunk and fold
    partials with ``combine_fn(acc, partial)``.

    - chunks: iterable of numpy array tuples (host-resident row blocks, all
      the same shape so one executable serves every chunk)
    - step_fn: jitted device computation for one chunk
    - partials stay on device; only the final accumulator is returned.
    """
    acc = init
    in_flight = []
    for chunk in chunks:
        device_chunk = tuple(jax.device_put(a) for a in chunk)
        partial = step_fn(*device_chunk)
        in_flight.append(partial)
        # fold lazily: combining immediately would serialize dispatch
        if len(in_flight) >= 2:
            acc = combine_fn(acc, in_flight.pop(0))
    for partial in in_flight:
        acc = combine_fn(acc, partial)
    return jax.block_until_ready(acc)


def chunked(arrays: tuple, chunk_rows: int):
    """Split equal-length host arrays into fixed-size row chunks, padding
    the tail with zeros (masks should already encode row validity)."""
    n = len(arrays[0])
    for start in range(0, n, chunk_rows):
        stop = min(start + chunk_rows, n)
        out = []
        for a in arrays:
            part = a[start:stop]
            if len(part) < chunk_rows:
                pad = np.zeros((chunk_rows - len(part),) + a.shape[1:], a.dtype)
                part = np.concatenate([part, pad], axis=0)
            out.append(part)
        yield tuple(out)
