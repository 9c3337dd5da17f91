"""ONNX Sequence / Optional ops — the static-structure subset.

Reference parity: tract supports the sequence opset the reference inherits
through its engine (/root/reference/infera/src/engine.rs delegates the full
op surface to tract). Under XLA every shape must be static, so sequences
here are TRACE-TIME tuples: structure (length, element membership) resolves
while tracing, elements stay traced arrays. That covers what inference
exports actually do with sequences — Split→sequence→per-element work→
Concat — while genuinely data-dependent structure (a position computed
from tensor VALUES) raises a clear OnnxError instead of a wrong answer.

Optional values are modeled the same way: ``None`` (empty) or the wrapped
value, with Has/Get resolving at trace time.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import OnnxError
from .ops import register


def _static_int(node, v, what: str) -> int:
    """A position/length operand must be trace-time static (initializer or
    Constant-folded numpy value) — data-dependent sequence structure cannot
    compile to fixed shapes."""
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, np.ndarray):
        return int(v.reshape(()))
    try:  # concrete jax array (not a tracer)
        return int(np.asarray(v).reshape(()))
    except Exception:
        raise OnnxError(
            f"{node.op_type}: {what} must be static (trace-time constant); "
            f"data-dependent sequence structure has no fixed-shape XLA form")


def _as_seq(node, v):
    if isinstance(v, tuple):
        return v
    raise OnnxError(f"{node.op_type}: input is not a sequence")


def _norm_pos(pos: int, n: int, insert: bool = False) -> int:
    hi = n if insert else n - 1
    p = pos + n if pos < 0 else pos
    if p < 0 or p > hi:
        raise OnnxError(f"sequence position {pos} out of range for length {n}")
    return p


@register("SequenceEmpty")
def _seq_empty(node, inputs, ctx):
    return [()]


@register("SequenceConstruct")
def _seq_construct(node, inputs, ctx):
    return [tuple(inputs)]


@register("SequenceLength")
def _seq_length(node, inputs, ctx):
    return [np.int64(len(_as_seq(node, inputs[0])))]


@register("SequenceAt")
def _seq_at(node, inputs, ctx):
    seq = _as_seq(node, inputs[0])
    pos = _norm_pos(_static_int(node, inputs[1], "position"), len(seq))
    return [seq[pos]]


@register("SequenceInsert")
def _seq_insert(node, inputs, ctx):
    seq = _as_seq(node, inputs[0])
    tensor = inputs[1]
    if len(inputs) > 2 and inputs[2] is not None:
        pos = _norm_pos(_static_int(node, inputs[2], "position"), len(seq),
                        insert=True)
    else:
        pos = len(seq)
    return [seq[:pos] + (tensor,) + seq[pos:]]


@register("SequenceErase")
def _seq_erase(node, inputs, ctx):
    seq = _as_seq(node, inputs[0])
    if len(inputs) > 1 and inputs[1] is not None:
        pos = _norm_pos(_static_int(node, inputs[1], "position"), len(seq))
    else:
        pos = len(seq) - 1
        if pos < 0:
            raise OnnxError("SequenceErase on empty sequence")
    return [seq[:pos] + seq[pos + 1:]]


@register("ConcatFromSequence")
def _concat_from_seq(node, inputs, ctx):
    seq = _as_seq(node, inputs[0])
    if not seq:
        raise OnnxError("ConcatFromSequence on empty sequence")
    axis = node.attr("axis")
    arrs = [jnp.asarray(t) for t in seq]
    if node.attr("new_axis", 0):
        return [jnp.stack(arrs, axis=axis)]
    return [jnp.concatenate(arrs, axis=axis)]


@register("SplitToSequence")
def _split_to_seq(node, inputs, ctx):
    x = jnp.asarray(inputs[0])
    axis = node.attr("axis", 0)
    keepdims = node.attr("keepdims", 1)
    n = x.shape[axis]
    if len(inputs) > 1 and inputs[1] is not None:
        split = inputs[1]
        if not isinstance(split, np.ndarray):
            try:
                split = np.asarray(split)
            except Exception:
                raise OnnxError("SplitToSequence: split sizes must be static")
        if split.ndim == 0:
            size = int(split)
            sizes = [size] * (n // size) + ([n % size] if n % size else [])
        else:
            sizes = [int(s) for s in split]
        out = []
        start = 0
        for s in sizes:
            out.append(jnp.take(x, jnp.arange(start, start + s), axis=axis))
            start += s
        return [tuple(out)]
    # no split operand: one element per slice, squeezing axis unless keepdims
    pieces = []
    for i in range(n):
        piece = jnp.take(x, jnp.arange(i, i + 1), axis=axis)
        if not keepdims:
            piece = jnp.squeeze(piece, axis=axis)
        pieces.append(piece)
    return [tuple(pieces)]


# --- Optional ---------------------------------------------------------------

@register("Optional")
def _optional(node, inputs, ctx):
    return [inputs[0] if inputs else None]


@register("OptionalHasElement")
def _optional_has(node, inputs, ctx):
    v = inputs[0] if inputs else None
    present = v is not None and not (isinstance(v, tuple) and False)
    return [np.asarray(present)]


@register("OptionalGetElement")
def _optional_get(node, inputs, ctx):
    v = inputs[0]
    if v is None:
        raise OnnxError("OptionalGetElement on empty optional")
    return [v]
