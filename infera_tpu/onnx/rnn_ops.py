"""ONNX recurrent ops: RNN / GRU / LSTM.

The reference executes these through tract (engine.rs:49-55 compiles any
tract-supported ONNX graph). TPU lowering: `lax.scan` over time — the
recurrence is sequential by nature, but each step is a batched [batch,
4*hidden] MXU matmul, and the input projection X·Wᵀ for ALL timesteps is
hoisted out of the scan into one large matmul (seq·batch × input).

Layouts follow the ONNX spec: X [seq, batch, input]; W [dirs, G*hidden,
input]; R [dirs, G*hidden, hidden]; B [dirs, 2*G*hidden]; outputs
Y [seq, dirs, batch, hidden], Y_h [dirs, batch, hidden] (+ Y_c for LSTM).
Gate orders: LSTM iofc, GRU zrh. Directions: forward / reverse /
bidirectional. Default activations only (sigmoid/tanh); sequence_lens and
peepholes are not supported (unset in mainstream exports).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..errors import OnnxError
from .ops import _HIGHEST, register


def _dirs(node):
    d = node.attr("direction", "forward")
    if isinstance(d, bytes):
        d = d.decode()
    if d not in ("forward", "reverse", "bidirectional"):
        raise OnnxError(f"{node.op_type}: unknown direction {d}")
    return d


def _check_unsupported(node, inputs, seq_lens_idx):
    if len(inputs) > seq_lens_idx and inputs[seq_lens_idx] is not None:
        raise OnnxError(f"{node.op_type}: sequence_lens not supported")
    acts = node.attr("activations")
    if acts:
        names = [a.decode() if isinstance(a, bytes) else a for a in acts]
        n = len(names) // 2 if _dirs(node) == "bidirectional" else len(names)
        defaults = {"RNN": ["Tanh"], "GRU": ["Sigmoid", "Tanh"],
                    "LSTM": ["Sigmoid", "Tanh", "Tanh"]}[node.op_type]
        for i, a in enumerate(names):
            if a != defaults[i % n if n else 0] and a not in defaults:
                raise OnnxError(f"{node.op_type}: activation {a} not supported")


def _dot(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST,
                      preferred_element_type=jnp.float32)


def _run_direction(step, x_proj, init_carry, reverse):
    """scan `step` over time; x_proj [seq, batch, G*hidden] already holds
    X·Wᵀ+Bw for every step."""
    xs = jnp.flip(x_proj, 0) if reverse else x_proj
    carry, ys = lax.scan(step, init_carry, xs)
    if reverse:
        ys = jnp.flip(ys, 0)
    return carry, ys


def _prep(node, inputs, n_gates, b_idx, h_idx):
    x = jnp.asarray(inputs[0], jnp.float32)      # [seq, batch, input]
    w = jnp.asarray(inputs[1], jnp.float32)      # [dirs, G*h, input]
    r = jnp.asarray(inputs[2], jnp.float32)      # [dirs, G*h, h]
    hidden = int(node.attr("hidden_size", r.shape[-1]))
    n_dirs = w.shape[0]
    batch = x.shape[1]
    b = None
    if len(inputs) > b_idx and inputs[b_idx] is not None:
        b = jnp.asarray(inputs[b_idx], jnp.float32)  # [dirs, 2*G*h]
    h0 = None
    if len(inputs) > h_idx and inputs[h_idx] is not None:
        h0 = jnp.asarray(inputs[h_idx], jnp.float32)  # [dirs, batch, h]
    if h0 is None:
        h0 = jnp.zeros((n_dirs, batch, hidden), jnp.float32)
    return x, w, r, b, h0, hidden, n_dirs, batch


def _x_projection(x, w_d, b_d, n_gates, hidden):
    """[seq, batch, input] @ w_dᵀ + input-bias → [seq, batch, G*h]."""
    proj = _dot(x, w_d.T)
    if b_d is not None:
        proj = proj + b_d[: n_gates * hidden]
    return proj


@register("RNN")
def _rnn(node, inputs, ctx):
    _check_unsupported(node, inputs, 4)
    x, w, r, b, h0, hidden, n_dirs, batch = _prep(node, inputs, 1, 3, 5)
    direction = _dirs(node)
    ys_dirs, h_dirs = [], []
    for d in range(n_dirs):
        reverse = direction == "reverse" or (direction == "bidirectional" and d == 1)
        b_d = b[d] if b is not None else None
        xp = _x_projection(x, w[d], b_d, 1, hidden)
        rb = b_d[hidden:] if b_d is not None else 0.0
        r_d = r[d]

        def step(h, xt, r_d=r_d, rb=rb):
            h_new = jnp.tanh(xt + _dot(h, r_d.T) + rb)
            return h_new, h_new

        h_last, ys = _run_direction(step, xp, h0[d], reverse)
        ys_dirs.append(ys)
        h_dirs.append(h_last)
    y = jnp.stack(ys_dirs, 1)  # [seq, dirs, batch, h]
    return [y, jnp.stack(h_dirs, 0)]


@register("GRU")
def _gru(node, inputs, ctx):
    _check_unsupported(node, inputs, 4)
    x, w, r, b, h0, hidden, n_dirs, batch = _prep(node, inputs, 3, 3, 5)
    direction = _dirs(node)
    lbr = bool(node.attr("linear_before_reset", 0))
    ys_dirs, h_dirs = [], []
    for d in range(n_dirs):
        reverse = direction == "reverse" or (direction == "bidirectional" and d == 1)
        b_d = b[d] if b is not None else None
        xp = _x_projection(x, w[d], b_d, 3, hidden)
        r_d = r[d]
        rz, rr, rh = (r_d[:hidden], r_d[hidden:2 * hidden],
                      r_d[2 * hidden:3 * hidden])
        if b_d is not None:
            rbz = b_d[3 * hidden:4 * hidden]
            rbr = b_d[4 * hidden:5 * hidden]
            rbh = b_d[5 * hidden:6 * hidden]
        else:
            rbz = rbr = rbh = 0.0

        def step(h, xt, rz=rz, rr=rr, rh=rh, rbz=rbz, rbr=rbr, rbh=rbh):
            xz, xr, xh = (xt[:, :hidden], xt[:, hidden:2 * hidden],
                          xt[:, 2 * hidden:])
            z = jax.nn.sigmoid(xz + _dot(h, rz.T) + rbz)
            rg = jax.nn.sigmoid(xr + _dot(h, rr.T) + rbr)
            if lbr:
                hh = jnp.tanh(xh + rg * (_dot(h, rh.T) + rbh))
            else:
                hh = jnp.tanh(xh + _dot(rg * h, rh.T) + rbh)
            h_new = (1.0 - z) * hh + z * h
            return h_new, h_new

        h_last, ys = _run_direction(step, xp, h0[d], reverse)
        ys_dirs.append(ys)
        h_dirs.append(h_last)
    return [jnp.stack(ys_dirs, 1), jnp.stack(h_dirs, 0)]


@register("LSTM")
def _lstm(node, inputs, ctx):
    _check_unsupported(node, inputs, 4)
    if len(inputs) > 7 and inputs[7] is not None:
        raise OnnxError("LSTM: peepholes (P) not supported")
    x, w, r, b, h0, hidden, n_dirs, batch = _prep(node, inputs, 4, 3, 5)
    c0 = None
    if len(inputs) > 6 and inputs[6] is not None:
        c0 = jnp.asarray(inputs[6], jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((n_dirs, batch, hidden), jnp.float32)
    direction = _dirs(node)
    ys_dirs, h_dirs, c_dirs = [], [], []
    for d in range(n_dirs):
        reverse = direction == "reverse" or (direction == "bidirectional" and d == 1)
        b_d = b[d] if b is not None else None
        xp = _x_projection(x, w[d], b_d, 4, hidden)
        r_d = r[d]
        ri, ro, rf, rc = (r_d[:hidden], r_d[hidden:2 * hidden],
                          r_d[2 * hidden:3 * hidden], r_d[3 * hidden:])
        if b_d is not None:
            rb = b_d[4 * hidden:]
            rbi, rbo, rbf, rbc = (rb[:hidden], rb[hidden:2 * hidden],
                                  rb[2 * hidden:3 * hidden], rb[3 * hidden:])
        else:
            rbi = rbo = rbf = rbc = 0.0

        def step(carry, xt, ri=ri, ro=ro, rf=rf, rc=rc,
                 rbi=rbi, rbo=rbo, rbf=rbf, rbc=rbc):
            h, c = carry
            xi, xo, xf, xc = (xt[:, :hidden], xt[:, hidden:2 * hidden],
                              xt[:, 2 * hidden:3 * hidden], xt[:, 3 * hidden:])
            i = jax.nn.sigmoid(xi + _dot(h, ri.T) + rbi)
            f = jax.nn.sigmoid(xf + _dot(h, rf.T) + rbf)
            g = jnp.tanh(xc + _dot(h, rc.T) + rbc)
            o = jax.nn.sigmoid(xo + _dot(h, ro.T) + rbo)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_last, c_last), ys = _run_direction(step, xp, (h0[d], c0[d]), reverse)
        ys_dirs.append(ys)
        h_dirs.append(h_last)
        c_dirs.append(c_last)
    return [jnp.stack(ys_dirs, 1), jnp.stack(h_dirs, 0), jnp.stack(c_dirs, 0)]
