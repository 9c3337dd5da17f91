"""ONNX control-flow operators: If / Loop / Scan.

The reference inherits these from tract's full opset
(/root/reference/infera/src/engine.rs:49-55 — tract-onnx parses and runs the
whole standard opset). TPU-first lowering instead of an interpreter:

- ``If``  → branch folded at trace time when the condition is static, else
  ``lax.cond`` (both branches traced into the XLA computation, predicated
  select at run time — no host round-trip).
- ``Loop`` → ``lax.while_loop`` when there are no scan outputs (exact ONNX
  early-exit semantics, works with a traced trip count); ``lax.scan`` with an
  active-mask freeze when scan outputs are present (requires a static trip
  count — XLA cannot produce dynamically sized outputs).
- ``Scan`` → ``lax.scan`` directly (axes moved to front, directions lowered
  to reversals).

All three keep the body inside the SAME jitted computation as the parent
graph — no data-dependent Python control flow under jit (static shapes,
compiler-friendly, SURVEY.md §7.3 strategy).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..errors import OnnxError
from .ops import register


def _scalar_bool(value):
    return jnp.reshape(jnp.asarray(value), ()).astype(bool)


@register("If")
def op_if(node, inputs, ctx):
    then_g = node.attr("then_branch")
    else_g = node.attr("else_branch")
    if then_g is None or else_g is None:
        raise OnnxError(f"If '{node.name}': missing then/else branch graph")
    cond = inputs[0]
    static = ctx.as_static(cond)
    if static is not None:
        chosen = then_g if bool(np.asarray(static).reshape(())) else else_g
        return list(ctx.run_subgraph(chosen, []))

    def branch(graph):
        def fn(_):
            return tuple(jnp.asarray(o) for o in ctx.run_subgraph(graph, []))

        return fn

    try:
        outs = lax.cond(_scalar_bool(cond), branch(then_g), branch(else_g), None)
    except TypeError as e:
        raise OnnxError(
            f"If '{node.name}': branches must produce matching "
            f"shapes/dtypes under a traced condition: {e}")
    return list(outs)


@register("Loop")
def op_loop(node, inputs, ctx):
    body = node.attr("body")
    if body is None:
        raise OnnxError(f"Loop '{node.name}': missing body graph")
    m_in, cond_in = inputs[0], inputs[1]
    v_init = [jnp.asarray(v) for v in inputs[2:]]
    n_state = len(v_init)
    # body: (iter_num, cond, v_1..v_N) -> (cond, v_1..v_N, scan_1..scan_K)
    n_scan = len(body.outputs) - 1 - n_state
    if n_scan < 0:
        raise OnnxError(
            f"Loop '{node.name}': body declares {len(body.outputs)} outputs "
            f"for {n_state} loop-carried values")

    m_static = ctx.as_static(m_in) if m_in is not None else None
    cond0 = (_scalar_bool(cond_in) if cond_in is not None
             else jnp.asarray(True))

    def run_body(i, cond, vs):
        outs = ctx.run_subgraph(
            body, [jnp.asarray(i, jnp.int32), cond, *vs])
        new_cond = _scalar_bool(outs[0])
        new_vs = tuple(jnp.asarray(o) for o in outs[1:1 + n_state])
        scans = tuple(jnp.asarray(o) for o in outs[1 + n_state:])
        return new_cond, new_vs, scans

    if n_scan == 0:
        # exact ONNX semantics incl. early exit, trip count may be traced
        if m_in is not None:
            m_val = jnp.reshape(jnp.asarray(m_in), ()).astype(jnp.int32)
        else:
            m_val = jnp.asarray(np.iinfo(np.int32).max, jnp.int32)

        def cond_fn(state):
            i, cond, _ = state
            return jnp.logical_and(i < m_val, cond)

        def body_fn(state):
            i, cond, vs = state
            new_cond, new_vs, _ = run_body(i, cond, vs)
            return i + 1, new_cond, new_vs

        try:
            _, _, vs = lax.while_loop(
                cond_fn, body_fn, (jnp.asarray(0, jnp.int32), cond0,
                                   tuple(v_init)))
        except TypeError as e:
            raise OnnxError(
                f"Loop '{node.name}': body must preserve the shapes/dtypes "
                f"of loop-carried values: {e}")
        return list(vs)

    # scan outputs present: XLA needs a static trip count. Early exit is
    # honored for the carried state (active-mask freeze) but scan outputs
    # keep length M with post-exit rows repeating the last active row.
    if m_static is None:
        raise OnnxError(
            f"Loop '{node.name}': scan outputs require a statically known "
            f"trip count (XLA cannot size outputs dynamically)")
    m = int(np.asarray(m_static).reshape(()))

    def scan_step(carry, i):
        cond, vs = carry
        new_cond, new_vs, scans = run_body(i, cond, vs)
        keep_cond = jnp.logical_and(cond, new_cond)
        kept = tuple(jnp.where(cond, nv, v) for nv, v in zip(new_vs, vs))
        return (keep_cond, kept), scans

    try:
        (_, vs), scan_outs = lax.scan(
            scan_step, (cond0, tuple(v_init)),
            jnp.arange(max(m, 0), dtype=jnp.int32))
    except TypeError as e:
        raise OnnxError(
            f"Loop '{node.name}': body must preserve the shapes/dtypes of "
            f"loop-carried values: {e}")
    return list(vs) + [scan_outs[k] for k in range(n_scan)]


@register("Scan")
def op_scan(node, inputs, ctx):
    body = node.attr("body")
    if body is None:
        raise OnnxError(f"Scan '{node.name}': missing body graph")
    n_scan_in = int(node.attr("num_scan_inputs", 0))
    if n_scan_in <= 0 or n_scan_in > len(inputs):
        raise OnnxError(f"Scan '{node.name}': bad num_scan_inputs {n_scan_in}")
    n_state = len(inputs) - n_scan_in
    states = tuple(jnp.asarray(v) for v in inputs[:n_state])
    xs = [jnp.asarray(v) for v in inputs[n_state:]]
    n_out_scan = len(body.outputs) - n_state
    if n_out_scan < 0:
        raise OnnxError(
            f"Scan '{node.name}': body declares {len(body.outputs)} outputs "
            f"for {n_state} state variables")

    in_axes = list(node.attr("scan_input_axes", [0] * n_scan_in))
    in_dirs = list(node.attr("scan_input_directions", [0] * n_scan_in))
    out_axes = list(node.attr("scan_output_axes", [0] * n_out_scan))
    out_dirs = list(node.attr("scan_output_directions", [0] * n_out_scan))

    moved = []
    for x, ax, d in zip(xs, in_axes, in_dirs):
        ax = ax % x.ndim
        x = jnp.moveaxis(x, ax, 0)
        if d:  # reverse direction
            x = jnp.flip(x, 0)
        moved.append(x)

    def step(carry, slices):
        outs = ctx.run_subgraph(body, [*carry, *slices])
        new_states = tuple(jnp.asarray(o) for o in outs[:n_state])
        scans = tuple(jnp.asarray(o) for o in outs[n_state:])
        return new_states, scans

    try:
        final_states, scan_outs = lax.scan(step, states, tuple(moved))
    except TypeError as e:
        raise OnnxError(
            f"Scan '{node.name}': body must preserve state shapes/dtypes "
            f"and scan inputs must share a leading length: {e}")

    outs = list(final_states)
    for k in range(n_out_scan):
        y = scan_outs[k]
        if out_dirs[k]:
            y = jnp.flip(y, 0)
        ax = out_axes[k] % y.ndim
        outs.append(jnp.moveaxis(y, 0, ax))
    return outs
