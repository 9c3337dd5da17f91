"""Extended ONNX op lowerings (beyond onnx/ops.py's core set).

Coverage extensions toward tract's breadth (the reference executes models
through tract, /root/reference/infera/src/engine.rs:49-55, which supports
most of the ONNX standard): padding/shape ops common in CNN exports,
transformer helpers (Einsum, Trilu, CumSum, TopK, OneHot), normalizations,
the trig/activation long tail, scatter/gather variants, and the
quantized-model op family (QuantizeLinear/DequantizeLinear/MatMulInteger/
QLinearMatMul/DynamicQuantizeLinear) so externally-quantized ONNX files run
natively on the int8 MXU path.

Same conventions as ops.py: static shapes resolved at trace time via
ctx.as_static; everything jit-safe (no data-dependent Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..errors import OnnxError
from .ops import _HIGHEST, _static_ints, _unary, register

# ---------------------------------------------------------------------------
# Unary long tail
# ---------------------------------------------------------------------------

register("Tan")(_unary(jnp.tan))
register("Asin")(_unary(jnp.arcsin))
register("Acos")(_unary(jnp.arccos))
register("Atan")(_unary(jnp.arctan))
register("Sinh")(_unary(jnp.sinh))
register("Cosh")(_unary(jnp.cosh))
register("Asinh")(_unary(jnp.arcsinh))
register("Acosh")(_unary(jnp.arccosh))
register("Atanh")(_unary(jnp.arctanh))
register("Sign")(_unary(jnp.sign))
register("IsNaN")(_unary(jnp.isnan))
register("HardSwish")(_unary(lambda x: x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)))
register("Mish")(_unary(lambda x: x * jnp.tanh(jax.nn.softplus(x))))


@register("IsInf")
def _isinf(node, inputs, ctx):
    x = inputs[0]
    pos = bool(node.attr("detect_positive", 1))
    neg = bool(node.attr("detect_negative", 1))
    out = jnp.zeros_like(jnp.asarray(x), bool)
    if pos:
        out = out | (x == jnp.inf)
    if neg:
        out = out | (x == -jnp.inf)
    return [out]


@register("Selu")
def _selu(node, inputs, ctx):
    alpha = node.attr("alpha", 1.67326319217681884765625)
    gamma = node.attr("gamma", 1.05070102214813232421875)
    x = inputs[0]
    return [gamma * jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))]


@register("Celu")
def _celu(node, inputs, ctx):
    alpha = node.attr("alpha", 1.0)
    x = jnp.asarray(inputs[0], jnp.float32)
    return [jnp.maximum(x, 0) + jnp.minimum(0, alpha * (jnp.exp(x / alpha) - 1.0))]


@register("ThresholdedRelu")
def _thresholded_relu(node, inputs, ctx):
    alpha = node.attr("alpha", 1.0)
    x = inputs[0]
    return [jnp.where(x > alpha, x, 0.0)]


@register("Shrink")
def _shrink(node, inputs, ctx):
    lambd = node.attr("lambd", 0.5)
    bias = node.attr("bias", 0.0)
    x = inputs[0]
    return [jnp.where(x < -lambd, x + bias, jnp.where(x > lambd, x - bias, 0.0))]


@register("Hardmax")
def _hardmax(node, inputs, ctx):
    axis = node.attr("axis", -1)
    x = jnp.asarray(inputs[0])
    idx = jnp.argmax(x, axis=axis)
    return [jax.nn.one_hot(idx, x.shape[axis], axis=axis, dtype=x.dtype)]


@register("LpNormalization")
def _lp_normalization(node, inputs, ctx):
    axis = node.attr("axis", -1)
    p = node.attr("p", 2)
    x = jnp.asarray(inputs[0], jnp.float32)
    if p == 1:
        d = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    else:
        d = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return [x / jnp.where(d == 0, 1.0, d)]


@register("MeanVarianceNormalization")
def _mvn(node, inputs, ctx):
    axes = tuple(node.attr("axes", [0, 2, 3]))
    x = jnp.asarray(inputs[0], jnp.float32)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=axes, keepdims=True)
    return [(x - mean) / jnp.sqrt(var + 1e-9)]


# ---------------------------------------------------------------------------
# Reductions missing from the core set
# ---------------------------------------------------------------------------

def _reduce(fn):
    def impl(node, inputs, ctx):
        x = jnp.asarray(inputs[0])
        if len(node.inputs) > 1 and node.inputs[1]:
            axes = _static_ints(ctx, node, node.inputs[1], "axes")
        else:
            axes = node.attr("axes")
        keepdims = bool(node.attr("keepdims", 1))
        axes = tuple(axes) if axes else None
        if axes is None and node.attr("noop_with_empty_axes", 0):
            return [x]
        return [fn(x, axes, keepdims)]

    return impl


register("ReduceL1")(_reduce(
    lambda x, a, k: jnp.sum(jnp.abs(x), axis=a, keepdims=k)))
register("ReduceSumSquare")(_reduce(
    lambda x, a, k: jnp.sum(x * x, axis=a, keepdims=k)))
register("ReduceLogSum")(_reduce(
    lambda x, a, k: jnp.log(jnp.sum(x, axis=a, keepdims=k))))


# ---------------------------------------------------------------------------
# Shape / data movement
# ---------------------------------------------------------------------------

@register("Pad")
def _pad(node, inputs, ctx):
    x = jnp.asarray(inputs[0])
    if len(node.inputs) > 1 and node.inputs[1]:
        pads = _static_ints(ctx, node, node.inputs[1], "pads")
    else:
        pads = node.attr("pads")
    if pads is None:
        raise OnnxError(f"Pad '{node.name}': missing pads")
    mode = node.attr("mode", "constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    value = 0.0
    if len(node.inputs) > 2 and node.inputs[2]:
        cv = ctx.as_static(inputs[2])
        if cv is not None:
            value = float(np.asarray(cv).reshape(-1)[0])
    rank = x.ndim
    axes = list(range(rank))
    if len(node.inputs) > 3 and node.inputs[3]:
        axes = _static_ints(ctx, node, node.inputs[3], "axes")
        axes = [a % rank for a in axes]
    width = [(0, 0)] * rank
    half = len(pads) // 2
    for i, a in enumerate(axes[:half]):
        width[a] = (pads[i], pads[i + half])
    if any(b < 0 or e < 0 for b, e in width):
        # negative pads mean trimming
        slices = []
        for d, (b, e) in enumerate(width):
            start = -b if b < 0 else 0
            stop = x.shape[d] + e if e < 0 else x.shape[d]
            slices.append(slice(start, stop))
        x = x[tuple(slices)]
        width = [(max(b, 0), max(e, 0)) for b, e in width]
    jmode = {"constant": "constant", "reflect": "reflect", "edge": "edge",
             "wrap": "wrap"}.get(mode)
    if jmode is None:
        raise OnnxError(f"Pad mode {mode} not supported")
    if jmode == "constant":
        return [jnp.pad(x, width, mode="constant", constant_values=value)]
    return [jnp.pad(x, width, mode=jmode)]


@register("DepthToSpace")
def _depth_to_space(node, inputs, ctx):
    b = int(node.attr("blocksize"))
    mode = node.attr("mode", "DCR")
    if isinstance(mode, bytes):
        mode = mode.decode()
    x = jnp.asarray(inputs[0])
    n, c, h, w = x.shape
    if mode == "DCR":
        y = x.reshape(n, b, b, c // (b * b), h, w)
        y = jnp.transpose(y, (0, 3, 4, 1, 5, 2))
    else:  # CRD
        y = x.reshape(n, c // (b * b), b, b, h, w)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))
    return [y.reshape(n, c // (b * b), h * b, w * b)]


@register("SpaceToDepth")
def _space_to_depth(node, inputs, ctx):
    b = int(node.attr("blocksize"))
    x = jnp.asarray(inputs[0])
    n, c, h, w = x.shape
    y = x.reshape(n, c, h // b, b, w // b, b)
    y = jnp.transpose(y, (0, 3, 5, 1, 2, 4))
    return [y.reshape(n, c * b * b, h // b, w // b)]


@register("Trilu")
def _trilu(node, inputs, ctx):
    upper = bool(node.attr("upper", 1))
    k = 0
    if len(node.inputs) > 1 and node.inputs[1]:
        k = _static_ints(ctx, node, node.inputs[1], "k")[0]
    x = jnp.asarray(inputs[0])
    return [jnp.triu(x, k) if upper else jnp.tril(x, k)]


@register("CumSum")
def _cumsum(node, inputs, ctx):
    axis = _static_ints(ctx, node, node.inputs[1], "axis")[0]
    x = jnp.asarray(inputs[0])
    exclusive = bool(node.attr("exclusive", 0))
    reverse = bool(node.attr("reverse", 0))
    if reverse:
        x = jnp.flip(x, axis)
    y = jnp.cumsum(x, axis=axis)
    if exclusive:
        y = y - x
    if reverse:
        y = jnp.flip(y, axis)
    return [y]


@register("OneHot")
def _onehot(node, inputs, ctx):
    axis = node.attr("axis", -1)
    depth = _static_ints(ctx, node, node.inputs[1], "depth")[0]
    values = ctx.as_static(inputs[2])
    if values is None:
        raise OnnxError("OneHot: values must be static")
    off, on = [float(v) for v in np.asarray(values).reshape(-1)]
    idx = jnp.asarray(inputs[0]).astype(jnp.int32)
    idx = jnp.where(idx < 0, idx + depth, idx)
    oh = jax.nn.one_hot(idx, depth, axis=axis, dtype=jnp.float32)
    return [oh * (on - off) + off]


@register("EyeLike")
def _eyelike(node, inputs, ctx):
    x = jnp.asarray(inputs[0])
    k = int(node.attr("k", 0))
    return [jnp.eye(x.shape[0], x.shape[1], k=k, dtype=x.dtype)]


@register("CastLike")
def _castlike(node, inputs, ctx):
    return [jnp.asarray(inputs[0]).astype(jnp.asarray(inputs[1]).dtype)]


@register("TopK")
def _topk(node, inputs, ctx):
    k = _static_ints(ctx, node, node.inputs[1], "k")[0]
    axis = node.attr("axis", -1)
    largest = bool(node.attr("largest", 1))
    x = jnp.asarray(inputs[0])
    x_m = jnp.moveaxis(x, axis, -1)
    vals, idx = lax.top_k(x_m if largest else -x_m, k)
    if not largest:
        vals = -vals
    return [jnp.moveaxis(vals, -1, axis),
            jnp.moveaxis(idx.astype(jnp.int32), -1, axis)]


@register("GatherND")
def _gather_nd(node, inputs, ctx):
    batch_dims = int(node.attr("batch_dims", 0))
    if batch_dims != 0:
        raise OnnxError("GatherND batch_dims != 0 not supported")
    data = jnp.asarray(inputs[0])
    indices = jnp.asarray(inputs[1]).astype(jnp.int32)
    last = indices.shape[-1]
    flat_idx = indices.reshape(-1, last)
    out = data[tuple(flat_idx[:, i] for i in range(last))]
    return [out.reshape(indices.shape[:-1] + data.shape[last:])]


@register("ScatterElements")
def _scatter_elements(node, inputs, ctx):
    axis = node.attr("axis", 0)
    reduction = node.attr("reduction", "none")
    if isinstance(reduction, bytes):
        reduction = reduction.decode()
    data = jnp.asarray(inputs[0])
    indices = jnp.asarray(inputs[1]).astype(jnp.int32)
    updates = jnp.asarray(inputs[2])
    # build full index grids along every axis, replacing `axis` with indices
    grids = jnp.meshgrid(*[jnp.arange(s) for s in indices.shape],
                         indexing="ij")
    grids[axis] = jnp.where(indices < 0, indices + data.shape[axis], indices)
    at = data.at[tuple(grids)]
    if reduction == "add":
        return [at.add(updates)]
    if reduction == "mul":
        return [at.multiply(updates)]
    if reduction in ("none", None):
        return [at.set(updates)]
    raise OnnxError(f"ScatterElements reduction {reduction} not supported")


@register("ScatterND")
def _scatter_nd(node, inputs, ctx):
    reduction = node.attr("reduction", "none")
    if isinstance(reduction, bytes):
        reduction = reduction.decode()
    data = jnp.asarray(inputs[0])
    indices = jnp.asarray(inputs[1]).astype(jnp.int32)
    updates = jnp.asarray(inputs[2])
    last = indices.shape[-1]
    flat_idx = indices.reshape(-1, last)
    flat_upd = updates.reshape((flat_idx.shape[0],) + data.shape[last:])
    at = data.at[tuple(flat_idx[:, i] for i in range(last))]
    if reduction == "add":
        return [at.add(flat_upd)]
    if reduction == "mul":
        return [at.multiply(flat_upd)]
    if reduction in ("none", None):
        return [at.set(flat_upd)]
    raise OnnxError(f"ScatterND reduction {reduction} not supported")


@register("Compress")
def _compress(node, inputs, ctx):
    cond = ctx.as_static(inputs[1])
    if cond is None:
        raise OnnxError("Compress: condition must be static (dynamic output shape)")
    cond = np.asarray(cond, bool)
    axis = node.attr("axis")
    x = jnp.asarray(inputs[0])
    if axis is None:
        return [x.reshape(-1)[np.nonzero(cond)[0]]]
    return [jnp.take(x, np.nonzero(cond)[0], axis=int(axis))]


@register("ReverseSequence")
def _reverse_sequence(node, inputs, ctx):
    batch_axis = int(node.attr("batch_axis", 1))
    time_axis = int(node.attr("time_axis", 0))
    x = jnp.asarray(inputs[0])
    seq_lens = jnp.asarray(inputs[1]).astype(jnp.int32)
    t = x.shape[time_axis]
    pos = jnp.arange(t)
    # per batch element b: out[i] = x[len_b-1-i] for i < len_b else x[i]
    def rev_one(xb, lb):
        idx = jnp.where(pos < lb, lb - 1 - pos, pos)
        return jnp.take(xb, idx, axis=0)

    xb = jnp.moveaxis(x, (batch_axis, time_axis), (0, 1))
    out = jax.vmap(rev_one)(xb, seq_lens)
    return [jnp.moveaxis(out, (0, 1), (batch_axis, time_axis))]


@register("Einsum")
def _einsum(node, inputs, ctx):
    eq = node.attr("equation")
    if isinstance(eq, bytes):
        eq = eq.decode()
    return [jnp.einsum(eq, *[jnp.asarray(a) for a in inputs],
                       precision=_HIGHEST)]


@register("Resize")
def _resize(node, inputs, ctx):
    mode = node.attr("mode", "nearest")
    if isinstance(mode, bytes):
        mode = mode.decode()
    x = jnp.asarray(inputs[0])
    out_shape = None
    if len(node.inputs) > 3 and node.inputs[3]:
        out_shape = _static_ints(ctx, node, node.inputs[3], "sizes")
    elif len(node.inputs) > 2 and node.inputs[2]:
        scales = ctx.as_static(inputs[2])
        if scales is None:
            raise OnnxError("Resize: scales must be static")
        scales = np.asarray(scales, np.float64).reshape(-1)
        if len(scales):
            out_shape = [int(np.floor(s * d)) for s, d in zip(scales, x.shape)]
    if out_shape is None:
        raise OnnxError("Resize: needs static sizes or scales")
    method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}.get(mode)
    if method is None:
        raise OnnxError(f"Resize mode {mode} not supported")
    return [jax.image.resize(x, tuple(out_shape), method=method)]


@register("InstanceNormalization")
def _instance_norm(node, inputs, ctx):
    eps = node.attr("epsilon", 1e-5)
    x = jnp.asarray(inputs[0], jnp.float32)
    scale = jnp.asarray(inputs[1], jnp.float32)
    bias = jnp.asarray(inputs[2], jnp.float32)
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return [(x - mean) / jnp.sqrt(var + eps) * scale.reshape(shape)
            + bias.reshape(shape)]


@register("GroupNormalization")
def _group_norm(node, inputs, ctx):
    eps = node.attr("epsilon", 1e-5)
    groups = int(node.attr("num_groups"))
    x = jnp.asarray(inputs[0], jnp.float32)
    scale = jnp.asarray(inputs[1], jnp.float32)
    bias = jnp.asarray(inputs[2], jnp.float32)
    n, c = x.shape[0], x.shape[1]
    spatial = x.shape[2:]
    xg = x.reshape((n, groups, c // groups) + spatial)
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=axes, keepdims=True)
    y = ((xg - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    if scale.size == groups:  # per-group affine (opset 18)
        scale = jnp.repeat(scale, c // groups)
        bias = jnp.repeat(bias, c // groups)
    return [y * scale.reshape(shape) + bias.reshape(shape)]


# ---------------------------------------------------------------------------
# Quantized-model ops (externally-quantized ONNX → int8 MXU path)
# ---------------------------------------------------------------------------

def _qparams(inputs, i_scale, i_zp):
    scale = jnp.asarray(inputs[i_scale], jnp.float32)
    zp = (jnp.asarray(inputs[i_zp], jnp.int32)
          if len(inputs) > i_zp and inputs[i_zp] is not None else jnp.int32(0))
    return scale, zp


@register("QuantizeLinear")
def _quantize_linear(node, inputs, ctx):
    axis = node.attr("axis", 1)
    x = jnp.asarray(inputs[0], jnp.float32)
    scale, zp = _qparams(inputs, 1, 2)
    if scale.ndim == 1 and scale.size > 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = zp.reshape(shape) if zp.ndim else zp
    q = jnp.rint(x / scale) + zp
    # zero-point dtype decides the target range; default uint8
    zp_static = (ctx.as_static(node.inputs[2])
                 if len(node.inputs) > 2 and node.inputs[2] else None)
    signed = zp_static is not None and zp_static.dtype == np.int8
    lo, hi = (-128, 127) if signed else (0, 255)
    return [jnp.clip(q, lo, hi).astype(jnp.int32)]


@register("DequantizeLinear")
def _dequantize_linear(node, inputs, ctx):
    axis = node.attr("axis", 1)
    x = jnp.asarray(inputs[0], jnp.float32)
    scale, zp = _qparams(inputs, 1, 2)
    if scale.ndim == 1 and scale.size > 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = zp.reshape(shape) if zp.ndim else zp
    return [(x - zp.astype(jnp.float32)) * scale]


@register("DynamicQuantizeLinear")
def _dynamic_quantize_linear(node, inputs, ctx):
    x = jnp.asarray(inputs[0], jnp.float32)
    lo = jnp.minimum(jnp.min(x), 0.0)
    hi = jnp.maximum(jnp.max(x), 0.0)
    scale = (hi - lo) / 255.0
    scale = jnp.where(scale == 0, 1.0, scale)
    zp = jnp.clip(jnp.rint(-lo / scale), 0, 255)
    q = jnp.clip(jnp.rint(x / scale) + zp, 0, 255).astype(jnp.int32)
    return [q, scale, zp.astype(jnp.int32)]


@register("MatMulInteger")
def _matmul_integer(node, inputs, ctx):
    a = jnp.asarray(inputs[0], jnp.int32)
    b = jnp.asarray(inputs[1], jnp.int32)
    if len(inputs) > 2 and inputs[2] is not None:
        a = a - jnp.asarray(inputs[2], jnp.int32)
    if len(inputs) > 3 and inputs[3] is not None:
        b = b - jnp.asarray(inputs[3], jnp.int32)
    # int32 dot (TPU MXU handles int8/int32 matmuls natively)
    return [lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)]


@register("QLinearMatMul")
def _qlinear_matmul(node, inputs, ctx):
    a = jnp.asarray(inputs[0], jnp.int32) - jnp.asarray(inputs[2], jnp.int32)
    a_scale = jnp.asarray(inputs[1], jnp.float32)
    b = jnp.asarray(inputs[3], jnp.int32) - jnp.asarray(inputs[5], jnp.int32)
    b_scale = jnp.asarray(inputs[4], jnp.float32)
    y_scale = jnp.asarray(inputs[6], jnp.float32)
    y_zp = jnp.asarray(inputs[7], jnp.int32)
    acc = lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (a_scale * b_scale) / y_scale
    # y_zero_point's static dtype decides the saturation range (int8 QDQ
    # models produce signed outputs), mirroring QuantizeLinear above
    yzp_static = (ctx.as_static(node.inputs[7])
                  if len(node.inputs) > 7 and node.inputs[7] else None)
    signed = yzp_static is not None and yzp_static.dtype == np.int8
    lo, hi = (-128, 127) if signed else (0, 255)
    return [jnp.clip(jnp.rint(y) + y_zp, lo, hi).astype(jnp.int32)]


# ---------------------------------------------------------------------------
# Detection / dynamic-output long tail (toward tract's full opset,
# /root/reference/infera/src/engine.rs:49-55)
# ---------------------------------------------------------------------------


@register("ConvTranspose")
def _conv_transpose(node, inputs, ctx):
    """Transposed convolution: conv_general_dilated with lhs_dilation =
    strides and a flipped, IO-swapped kernel (XLA-native, MXU-eligible)."""
    x, w = inputs[0], inputs[1]
    spatial = x.ndim - 2
    group = int(node.attr("group", 1))
    strides = tuple(node.attr("strides") or (1,) * spatial)
    dilations = tuple(node.attr("dilations") or (1,) * spatial)
    out_pad = tuple(node.attr("output_padding") or (0,) * spatial)
    pads = node.attr("pads")
    auto_pad = node.attr("auto_pad", "NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    k = w.shape[2:]

    out_shape_attr = node.attr("output_shape")
    if out_shape_attr:
        # derive total padding per the ONNX spec, split SAME_UPPER style
        in_sp = x.shape[2:]
        pads_begin, pads_end = [], []
        for i in range(spatial):
            total = (strides[i] * (in_sp[i] - 1) + out_pad[i]
                     + ((k[i] - 1) * dilations[i] + 1) - int(out_shape_attr[i]))
            total = max(total, 0)
            if auto_pad == "SAME_UPPER":
                pads_begin.append(total // 2)
                pads_end.append(total - total // 2)
            else:
                pads_begin.append(total - total // 2)
                pads_end.append(total // 2)
        pads = pads_begin + pads_end
    elif not pads:
        if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
            pads_total = [(k[i] - 1) * dilations[i] + 1 - strides[i]
                          for i in range(spatial)]
            pads_total = [max(p, 0) for p in pads_total]
            if auto_pad == "SAME_UPPER":
                pads = ([p // 2 for p in pads_total]
                        + [p - p // 2 for p in pads_total])
            else:
                pads = ([p - p // 2 for p in pads_total]
                        + [p // 2 for p in pads_total])
        else:
            pads = [0] * (2 * spatial)

    # ONNX ConvTranspose kernel is [C_in, C_out/group, *k]; XLA wants
    # [C_out, C_in/group, *k] with spatial dims flipped
    cin = w.shape[0]
    cout = w.shape[1] * group
    wg = w.reshape((group, cin // group, w.shape[1]) + k)
    wg = jnp.swapaxes(wg, 1, 2)  # [g, C_out/g, C_in/g, *k]
    wk = wg.reshape((cout, cin // group) + k)
    wk = jnp.flip(wk, axis=tuple(range(2, 2 + spatial)))

    padding = [
        (dilations[i] * (k[i] - 1) - pads[i],
         dilations[i] * (k[i] - 1) - pads[spatial + i] + out_pad[i])
        for i in range(spatial)
    ]
    specs = {1: ("NCH", "OIH", "NCH"), 2: ("NCHW", "OIHW", "NCHW"),
             3: ("NCDHW", "OIDHW", "NCDHW")}
    dn = lax.conv_dimension_numbers(x.shape, wk.shape, specs[spatial])
    y = lax.conv_general_dilated(
        x, wk, window_strides=(1,) * spatial, padding=padding,
        lhs_dilation=strides, rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=group, precision=_HIGHEST,
    )
    if len(inputs) > 2 and inputs[2] is not None:
        y = y + inputs[2].reshape((1, -1) + (1,) * spatial)
    return [y]


def _require_static(ctx, node, value, what):
    arr = ctx.as_static(value)
    if arr is None:
        raise OnnxError(
            f"{node.op_type} '{node.name}': {what} must be statically known "
            f"(the op's output shape is data-dependent, which XLA cannot "
            f"express; tract's CPU interpreter can)")
    return np.asarray(arr)


@register("NonMaxSuppression")
def _non_max_suppression(node, inputs, ctx):
    """Exact ONNX NMS on statically-known inputs (host fold at trace time).

    Output [num_selected, 3] is data-dependent; under tracing this op raises
    rather than silently truncating."""
    boxes = _require_static(ctx, node, node.inputs[0], "boxes")
    scores = _require_static(ctx, node, node.inputs[1], "scores")
    max_out = int(_require_static(ctx, node, node.inputs[2],
                                  "max_output_boxes_per_class").reshape(()).item()) \
        if len(node.inputs) > 2 and node.inputs[2] else 0
    iou_thr = float(np.asarray(ctx.as_static(node.inputs[3])).reshape(()).item()) \
        if len(node.inputs) > 3 and node.inputs[3] else 0.0
    score_thr = float(np.asarray(ctx.as_static(node.inputs[4])).reshape(()).item()) \
        if len(node.inputs) > 4 and node.inputs[4] else -np.inf
    center = bool(node.attr("center_point_box", 0))

    def to_corners(b):
        if not center:
            y1, x1, y2, x2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            return (np.minimum(y1, y2), np.minimum(x1, x2),
                    np.maximum(y1, y2), np.maximum(x1, x2))
        xc, yc, w_, h_ = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        return (yc - h_ / 2, xc - w_ / 2, yc + h_ / 2, xc + w_ / 2)

    selected = []
    for bi in range(scores.shape[0]):
        y1, x1, y2, x2 = to_corners(boxes[bi])
        area = (y2 - y1) * (x2 - x1)
        for ci in range(scores.shape[1]):
            s = scores[bi, ci]
            order = np.argsort(-s, kind="stable")
            order = order[s[order] > score_thr]
            kept = []
            for idx in order:
                if max_out and len(kept) >= max_out:
                    break
                ok = True
                for j in kept:
                    yy1 = max(y1[idx], y1[j]); xx1 = max(x1[idx], x1[j])
                    yy2 = min(y2[idx], y2[j]); xx2 = min(x2[idx], x2[j])
                    inter = max(yy2 - yy1, 0.0) * max(xx2 - xx1, 0.0)
                    union = area[idx] + area[j] - inter
                    if union > 0 and inter / union > iou_thr:
                        ok = False
                        break
                if ok:
                    kept.append(int(idx))
            selected.extend((bi, ci, k) for k in kept)
    return [np.asarray(selected, np.int64).reshape(-1, 3)]


@register("Unique")
def _unique(node, inputs, ctx):
    """Exact ONNX Unique on statically-known input (host fold): outputs Y,
    indices, inverse_indices, counts. Dynamic-shape output → static-only."""
    x = _require_static(ctx, node, node.inputs[0], "input")
    axis = node.attr("axis")
    want_sorted = bool(node.attr("sorted", 1))
    flat = x.reshape(-1) if axis is None else x
    uniq, first_idx, inverse, counts = np.unique(
        flat, return_index=True, return_inverse=True, return_counts=True,
        axis=None if axis is None else int(axis))
    if not want_sorted:
        # reorder to first-occurrence order
        order = np.argsort(first_idx, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        uniq = (uniq[order] if axis is None
                else np.take(uniq, order, axis=int(axis)))
        first_idx = first_idx[order]
        counts = counts[order]
        inverse = rank[inverse]
    return [uniq, first_idx.astype(np.int64),
            inverse.reshape(-1).astype(np.int64), counts.astype(np.int64)]


@register("TfIdfVectorizer")
def _tfidf_vectorizer(node, inputs, ctx):
    """N-gram counting over integer token tensors (the numeric mode of the
    op; sklearn/ORT exports use it after external tokenization). All the
    n-gram structure is attribute-static, so matching lowers to broadcast
    equality against the pool ngrams over strided windows — pure
    compare/reduce, jit-safe. String-tensor input is out of scope (no
    string tensors on device)."""
    x = inputs[0]
    if hasattr(x, "dtype") and not jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.integer):
        raise OnnxError("TfIdfVectorizer: only integer token input is "
                        "supported (string tensors have no device analog)")
    x = jnp.asarray(x, jnp.int32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    if x.ndim != 2:
        raise OnnxError("TfIdfVectorizer: input must be 1-D or 2-D")
    N, C = x.shape
    mode = node.attr("mode", "TF")
    min_g = int(node.attr("min_gram_length", 1))
    max_g = int(node.attr("max_gram_length", 1))
    max_skip = int(node.attr("max_skip_count", 0))
    ngram_counts = [int(v) for v in node.attr("ngram_counts", [])]
    ngram_indexes = [int(v) for v in node.attr("ngram_indexes", [])]
    pool = [int(v) for v in node.attr("pool_int64s", [])]
    weights = node.attr("weights")
    n_out = max(ngram_indexes) + 1 if ngram_indexes else 0
    out = jnp.zeros((N, n_out), jnp.float32)
    if n_out == 0:
        return [out[0] if squeeze else out]
    w_arr = np.ones(len(ngram_indexes), np.float32) if weights is None \
        else np.asarray([float(v) for v in weights], np.float32)

    # decode the pool: section i holds ngrams of length i+1 starting at
    # pool offset ngram_counts[i]
    ngram_id = 0
    for sec, start in enumerate(ngram_counts):
        L = sec + 1
        end = ngram_counts[sec + 1] if sec + 1 < len(ngram_counts) \
            else len(pool)
        m = (end - start) // L
        if m == 0:
            continue
        grams = np.asarray(pool[start:end], np.int32).reshape(m, L)
        ids = np.asarray(ngram_indexes[ngram_id:ngram_id + m], np.int32)
        ngram_id += m
        if not (min_g <= L <= max_g):
            continue
        counts = jnp.zeros((N, m), jnp.float32)
        skips = range(max_skip + 1) if L > 1 else range(1)
        for s in skips:
            span = (L - 1) * (s + 1)
            P = C - span
            if P <= 0:
                continue
            idx = (np.arange(P)[:, None]
                   + np.arange(L)[None, :] * (s + 1))  # [P, L]
            win = x[:, jnp.asarray(idx)]               # [N, P, L]
            eq = (win[:, :, None, :] == jnp.asarray(grams)[None, None]
                  ).all(axis=-1)                       # [N, P, m]
            counts = counts + eq.sum(axis=1).astype(jnp.float32)
        wv = jnp.asarray(w_arr[ngram_id - m:ngram_id])
        if mode == "TF":
            vals = counts
        elif mode == "IDF":
            vals = (counts > 0).astype(jnp.float32) * wv[None, :]
        elif mode == "TFIDF":
            vals = counts * wv[None, :]
        else:
            raise OnnxError(f"TfIdfVectorizer: unknown mode '{mode}'")
        out = out.at[:, jnp.asarray(ids)].add(vals)
    return [out[0] if squeeze else out]
