"""ONNX operator lowerings to JAX.

The reference runs models through the external tract CPU engine
(/root/reference/infera/src/engine.rs:49-55, :144). Here every op lowers to
jax.numpy / lax so the whole model graph fuses into one XLA computation that
runs on the TPU MXU/VPU. Matmul-class ops force float32 HIGHEST precision:
SQL parity tests pin results to 1e-5 and exact list equality
(/root/reference/test/sql/test_predict_multi_list.test:20-30), which bf16
MXU accumulation would break (SURVEY.md §7.3).

Each impl has signature ``fn(node, inputs, ctx) -> list[jnp.ndarray]`` where
``inputs`` are the node's resolved input values (traced jnp arrays, or numpy
arrays when statically known) and ``ctx`` provides static-value lookup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..errors import OnnxError
from .proto import Node

OP_IMPLS: dict = {}


def register(op_type: str, domain: str = ""):
    def deco(fn):
        OP_IMPLS[(domain, op_type)] = fn
        return fn

    return deco


def get_impl(domain: str, op_type: str):
    impl = OP_IMPLS.get((domain, op_type))
    if impl is None and domain in ("ai.onnx", "onnx.ai"):
        impl = OP_IMPLS.get(("", op_type))
    if impl is None:
        raise OnnxError(f"unsupported ONNX op {domain + '.' if domain else ''}{op_type}")
    return impl


_HIGHEST = lax.Precision.HIGHEST


def _static_ints(ctx, node: Node, value, what: str) -> list:
    """Resolve a tensor that must be statically known (e.g. Reshape target)."""
    arr = ctx.as_static(value)
    if arr is None:
        raise OnnxError(
            f"{node.op_type} '{node.name}': {what} must be statically known"
        )
    return [int(v) for v in np.asarray(arr).reshape(-1)]


# ---------------------------------------------------------------------------
# Elementwise / unary
# ---------------------------------------------------------------------------

def _unary(fn):
    return lambda node, inputs, ctx: [fn(inputs[0])]


register("Identity")(_unary(lambda x: x))
register("Relu")(_unary(lambda x: jnp.maximum(x, 0)))
register("Sigmoid")(_unary(jax.nn.sigmoid))
register("Tanh")(_unary(jnp.tanh))
register("Exp")(_unary(jnp.exp))
register("Log")(_unary(jnp.log))
register("Sqrt")(_unary(jnp.sqrt))
register("Abs")(_unary(jnp.abs))
register("Neg")(_unary(jnp.negative))
register("Floor")(_unary(jnp.floor))
register("Ceil")(_unary(jnp.ceil))
register("Round")(_unary(jnp.round))
register("Erf")(_unary(lax.erf))
register("Softplus")(_unary(jax.nn.softplus))
register("Softsign")(_unary(jax.nn.soft_sign))
register("Not")(_unary(jnp.logical_not))
register("Reciprocal")(_unary(lambda x: 1.0 / x))
register("Sin")(_unary(jnp.sin))
register("Cos")(_unary(jnp.cos))


@register("LeakyRelu")
def _leaky_relu(node, inputs, ctx):
    alpha = node.attr("alpha", 0.01)
    return [jnp.where(inputs[0] >= 0, inputs[0], alpha * inputs[0])]


@register("Elu")
def _elu(node, inputs, ctx):
    alpha = node.attr("alpha", 1.0)
    x = inputs[0]
    return [jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1.0))]


@register("HardSigmoid")
def _hard_sigmoid(node, inputs, ctx):
    alpha = node.attr("alpha", 0.2)
    beta = node.attr("beta", 0.5)
    return [jnp.clip(alpha * inputs[0] + beta, 0.0, 1.0)]


@register("Clip")
def _clip(node, inputs, ctx):
    x = inputs[0]
    lo = node.attr("min")
    hi = node.attr("max")
    if lo is None and len(inputs) > 1 and inputs[1] is not None:
        lo = inputs[1]
    if hi is None and len(inputs) > 2 and inputs[2] is not None:
        hi = inputs[2]
    if lo is not None:
        x = jnp.maximum(x, lo)
    if hi is not None:
        x = jnp.minimum(x, hi)
    return [x]


@register("Softmax")
def _softmax(node, inputs, ctx):
    axis = node.attr("axis", -1)
    return [jax.nn.softmax(inputs[0], axis=axis)]


@register("LogSoftmax")
def _log_softmax(node, inputs, ctx):
    axis = node.attr("axis", -1)
    return [jax.nn.log_softmax(inputs[0], axis=axis)]


@register("Cast")
def _cast(node, inputs, ctx):
    from .proto import np_dtype_for

    to = node.attr("to", 1)
    return [inputs[0].astype(np_dtype_for(to))]


# ---------------------------------------------------------------------------
# Binary / variadic (numpy broadcasting == ONNX broadcasting for opset >= 7)
# ---------------------------------------------------------------------------

def _binary(fn):
    return lambda node, inputs, ctx: [fn(inputs[0], inputs[1])]


register("Add")(_binary(jnp.add))
register("Sub")(_binary(jnp.subtract))
register("Mul")(_binary(jnp.multiply))
register("Div")(_binary(jnp.divide))
register("Pow")(_binary(jnp.power))
register("Mod")(_binary(jnp.mod))
register("Equal")(_binary(jnp.equal))
register("Greater")(_binary(jnp.greater))
register("GreaterOrEqual")(_binary(jnp.greater_equal))
register("Less")(_binary(jnp.less))
register("LessOrEqual")(_binary(jnp.less_equal))
register("And")(_binary(jnp.logical_and))
register("Or")(_binary(jnp.logical_or))
register("Xor")(_binary(jnp.logical_xor))
register("PRelu")(_binary(lambda x, s: jnp.where(x >= 0, x, s * x)))


@register("Min")
def _min(node, inputs, ctx):
    out = inputs[0]
    for x in inputs[1:]:
        out = jnp.minimum(out, x)
    return [out]


@register("Max")
def _max(node, inputs, ctx):
    out = inputs[0]
    for x in inputs[1:]:
        out = jnp.maximum(out, x)
    return [out]


@register("Sum")
def _sum(node, inputs, ctx):
    out = inputs[0]
    for x in inputs[1:]:
        out = out + x
    return [out]


@register("Mean")
def _mean(node, inputs, ctx):
    out = inputs[0]
    for x in inputs[1:]:
        out = out + x
    return [out / len(inputs)]


@register("Where")
def _where(node, inputs, ctx):
    return [jnp.where(inputs[0], inputs[1], inputs[2])]


# ---------------------------------------------------------------------------
# Matmul family (MXU path)
# ---------------------------------------------------------------------------

def _quantize_weight_int8(node, key: str, w_np):
    """Per-output-channel symmetric int8 quantization of a static weight,
    cached on the Node (round-to-nearest; channel axis = last)."""
    entry = getattr(node, "_infera_int8", None)
    if entry is None or entry[0] != key:
        w = np.asarray(w_np, np.float32)
        scale = np.max(np.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
        scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
        q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
        entry = (key, q, scale)
        node._infera_int8 = entry
    return entry[1], entry[2]


def _policy_dot(node, a, b, ctx, key="w"):
    """Matmul under the model's precision policy (executor.py ctx):

    - ``f32`` (default): HIGHEST-precision f32 — the parity path, pinned by
      the reference's 1e-5 / exact-equality tests.
    - ``bf16``: both operands cast to bf16, f32 accumulation — MXU-native
      rate, ~2-3 decimal digits of weight precision.
    - ``int8``: static per-channel weight quantization + dynamic per-row
      activation quantization; int8×int8→int32 on the MXU, dequantized by
      row_scale × channel_scale. Falls back to bf16 when the weight is not
      a static initializer.
    """
    prec = getattr(ctx, "matmul_precision", "f32")
    if prec == "f32":
        return jnp.matmul(a, b, precision=_HIGHEST,
                          preferred_element_type=jnp.result_type(a, b))
    if prec == "int8" and isinstance(b, np.ndarray) and b.ndim == 2:
        w_q, w_scale = _quantize_weight_int8(node, key, b)
        a = jnp.asarray(a, jnp.float32)
        if getattr(ctx, "_calibrating", False):
            # eager (unjitted) calibration pass: record the per-tensor
            # activation range for this matmul input, compute in f32
            amax = float(jnp.max(jnp.abs(a)))
            prev = getattr(node, "_infera_act_scale", 0.0) or 0.0
            node._infera_act_scale = max(prev, amax / 127.0)
            return jnp.matmul(a, jnp.asarray(b), precision=_HIGHEST,
                              preferred_element_type=jnp.float32)
        act_scale = getattr(node, "_infera_act_scale", None)
        if act_scale:
            # STATIC path (round-3): the calibrated per-tensor scale is a
            # trace-time constant, so quantization is one multiply +
            # rint/clip (no per-row max reduce or divide) and the dequant
            # folds act_scale into the per-channel weight-scale vector
            inv = np.float32(1.0 / act_scale)
            a_q = jnp.clip(jnp.rint(a * inv), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                a_q, jnp.asarray(w_q),
                (((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return y.astype(jnp.float32) * jnp.asarray(
                w_scale * np.float32(act_scale))
        # dynamic fallback (no calibration yet): per-row abs-max scales
        a_scale = jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0
        a_scale = jnp.where(a_scale == 0, 1.0, a_scale)
        a_q = jnp.clip(jnp.rint(a / a_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            a_q, jnp.asarray(w_q),
            (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * a_scale * jnp.asarray(w_scale)
    # bf16 (and int8 fallback for traced/non-2D weights)
    return jnp.matmul(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
                      preferred_element_type=jnp.float32)


@register("MatMul")
def _matmul(node, inputs, ctx):
    a, b = inputs
    return [_policy_dot(node, a, b, ctx)]


@register("Gemm")
def _gemm(node, inputs, ctx):
    a = inputs[0]
    b = inputs[1]
    alpha = node.attr("alpha", 1.0)
    beta = node.attr("beta", 1.0)
    if node.attr("transA", 0):
        a = a.T
    if node.attr("transB", 0):
        b = b.T
    y = _policy_dot(node, a, b, ctx)
    if alpha != 1.0:
        y = alpha * y
    if len(inputs) > 2 and inputs[2] is not None:
        c = inputs[2]
        y = y + (beta * c if beta != 1.0 else c)
    return [y]


# ---------------------------------------------------------------------------
# Shape manipulation
# ---------------------------------------------------------------------------

@register("Reshape")
def _reshape(node, inputs, ctx):
    x = inputs[0]
    target = _static_ints(ctx, node, node.inputs[1] if len(node.inputs) > 1 else None,
                          "shape input") if len(node.inputs) > 1 else node.attr("shape")
    if target is None:
        raise OnnxError(f"Reshape '{node.name}': missing shape")
    shape = []
    for i, d in enumerate(target):
        if d == 0 and not node.attr("allowzero", 0):
            shape.append(x.shape[i])
        else:
            shape.append(d)
    # Fixed-batch generalization (SURVEY.md §2.2 batching caveat): if the
    # model was exported with a hard-coded batch dim but we're running a
    # bigger batch, free dim 0 so the row count flows through.
    if (
        shape
        and shape[0] not in (-1, x.shape[0])
        and -1 not in shape
        and int(np.prod(shape)) != int(np.prod(x.shape))
    ):
        shape[0] = -1
    return [jnp.reshape(x, shape)]


@register("Flatten")
def _flatten(node, inputs, ctx):
    axis = node.attr("axis", 1)
    x = inputs[0]
    lead = int(np.prod(x.shape[:axis])) if axis > 0 else 1
    return [jnp.reshape(x, (lead, -1))]


@register("Transpose")
def _transpose(node, inputs, ctx):
    perm = node.attr("perm")
    x = inputs[0]
    if perm is None:
        perm = list(reversed(range(x.ndim)))
    return [jnp.transpose(x, perm)]


@register("Concat")
def _concat(node, inputs, ctx):
    axis = node.attr("axis", 0)
    return [jnp.concatenate(inputs, axis=axis)]


@register("Split")
def _split(node, inputs, ctx):
    x = inputs[0]
    axis = node.attr("axis", 0)
    if len(node.inputs) > 1:
        sizes = _static_ints(ctx, node, node.inputs[1], "split sizes")
    else:
        sizes = node.attr("split")
    if sizes is None:
        n = len(node.outputs)
        sizes = [x.shape[axis] // n] * n
    offsets = np.cumsum([0] + list(sizes))
    return [lax.slice_in_dim(x, int(offsets[i]), int(offsets[i + 1]), axis=axis)
            for i in range(len(sizes))]


@register("Squeeze")
def _squeeze(node, inputs, ctx):
    x = inputs[0]
    if len(node.inputs) > 1:
        axes = _static_ints(ctx, node, node.inputs[1], "axes")
    else:
        axes = node.attr("axes")
    if axes is None:
        return [jnp.squeeze(x)]
    return [jnp.squeeze(x, axis=tuple(a % x.ndim for a in axes))]


@register("Unsqueeze")
def _unsqueeze(node, inputs, ctx):
    x = inputs[0]
    if len(node.inputs) > 1:
        axes = _static_ints(ctx, node, node.inputs[1], "axes")
    else:
        axes = node.attr("axes")
    out_rank = x.ndim + len(axes)
    axes = sorted(a % out_rank for a in axes)
    for a in axes:
        x = jnp.expand_dims(x, a)
    return [x]


@register("Slice")
def _slice(node, inputs, ctx):
    x = inputs[0]
    if len(node.inputs) > 1:
        starts = _static_ints(ctx, node, node.inputs[1], "starts")
        ends = _static_ints(ctx, node, node.inputs[2], "ends")
        axes = (
            _static_ints(ctx, node, node.inputs[3], "axes")
            if len(node.inputs) > 3 and node.inputs[3]
            else list(range(len(starts)))
        )
        steps = (
            _static_ints(ctx, node, node.inputs[4], "steps")
            if len(node.inputs) > 4 and node.inputs[4]
            else [1] * len(starts)
        )
    else:
        starts = node.attr("starts")
        ends = node.attr("ends")
        axes = node.attr("axes", list(range(len(starts))))
        steps = [1] * len(starts)
    slices = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = ax % x.ndim
        dim = x.shape[ax]
        if st < 0:
            st += dim
        if en < 0:
            en += dim
        en = min(en, dim)
        st = max(min(st, dim), 0)
        slices[ax] = slice(st, en, sp)
    return [x[tuple(slices)]]


@register("Gather")
def _gather(node, inputs, ctx):
    axis = node.attr("axis", 0)
    return [jnp.take(inputs[0], inputs[1].astype(jnp.int32), axis=axis)]


@register("GatherElements")
def _gather_elements(node, inputs, ctx):
    axis = node.attr("axis", 0)
    return [jnp.take_along_axis(inputs[0], inputs[1].astype(jnp.int32), axis=axis)]


@register("Expand")
def _expand(node, inputs, ctx):
    x = inputs[0]
    target = _static_ints(ctx, node, node.inputs[1], "shape")
    # ONNX Expand broadcasts; target dims of 1 keep input size
    shape = list(np.broadcast_shapes(tuple(x.shape), tuple(target)))
    return [jnp.broadcast_to(x, shape)]


@register("Tile")
def _tile(node, inputs, ctx):
    reps = _static_ints(ctx, node, node.inputs[1], "repeats")
    return [jnp.tile(inputs[0], reps)]


@register("Shape")
def _shape(node, inputs, ctx):
    start = node.attr("start", 0)
    end = node.attr("end")
    shp = inputs[0].shape
    shp = shp[start:end] if end is not None else shp[start:]
    return [np.asarray(shp, dtype=np.int64)]


@register("Size")
def _size(node, inputs, ctx):
    return [np.asarray(int(np.prod(inputs[0].shape)), dtype=np.int64)]


@register("Constant")
def _constant(node, inputs, ctx):
    t = node.attr("value")
    if t is not None:
        return [np.asarray(t.array)]
    for key, cast in (
        ("value_float", np.float32),
        ("value_int", np.int64),
    ):
        v = node.attr(key)
        if v is not None:
            return [np.asarray(v, dtype=cast)]
    v = node.attr("value_floats")
    if v is not None:
        return [np.asarray(v, dtype=np.float32)]
    v = node.attr("value_ints")
    if v is not None:
        return [np.asarray(v, dtype=np.int64)]
    raise OnnxError(f"Constant '{node.name}': unsupported payload")


@register("ConstantOfShape")
def _constant_of_shape(node, inputs, ctx):
    shape = _static_ints(ctx, node, node.inputs[0], "shape")
    t = node.attr("value")
    if t is not None:
        fill = np.asarray(t.array).reshape(-1)[0]
        dtype = t.array.dtype
    else:
        fill, dtype = 0.0, np.float32
    return [jnp.full(shape, fill, dtype=dtype)]


@register("Range")
def _range(node, inputs, ctx):
    start = _static_ints(ctx, node, node.inputs[0], "start")[0]
    limit = _static_ints(ctx, node, node.inputs[1], "limit")[0]
    delta = _static_ints(ctx, node, node.inputs[2], "delta")[0]
    return [np.arange(start, limit, delta, dtype=np.int64)]


# ---------------------------------------------------------------------------
# Reductions
# ---------------------------------------------------------------------------

def _reduce(jnp_fn):
    def impl(node, inputs, ctx):
        x = inputs[0]
        if len(node.inputs) > 1 and node.inputs[1]:
            axes = _static_ints(ctx, node, node.inputs[1], "axes")
        else:
            axes = node.attr("axes")
        keepdims = bool(node.attr("keepdims", 1))
        axes_t = tuple(a % x.ndim for a in axes) if axes is not None else None
        return [jnp_fn(x, axis=axes_t, keepdims=keepdims)]

    return impl


register("ReduceSum")(_reduce(jnp.sum))
register("ReduceMean")(_reduce(jnp.mean))
register("ReduceMax")(_reduce(jnp.max))
register("ReduceMin")(_reduce(jnp.min))
register("ReduceProd")(_reduce(jnp.prod))
register("ReduceL2")(_reduce(lambda x, axis, keepdims: jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))))
register("ReduceLogSumExp")(_reduce(lambda x, axis, keepdims: jax.scipy.special.logsumexp(x, axis=axis, keepdims=keepdims)))


@register("ArgMax")
def _argmax(node, inputs, ctx):
    axis = node.attr("axis", 0)
    keepdims = bool(node.attr("keepdims", 1))
    out = jnp.argmax(inputs[0], axis=axis).astype(jnp.int64)
    if keepdims:
        out = jnp.expand_dims(out, axis)
    return [out]


@register("ArgMin")
def _argmin(node, inputs, ctx):
    axis = node.attr("axis", 0)
    keepdims = bool(node.attr("keepdims", 1))
    out = jnp.argmin(inputs[0], axis=axis).astype(jnp.int64)
    if keepdims:
        out = jnp.expand_dims(out, axis)
    return [out]


# ---------------------------------------------------------------------------
# NN layers (conv-family lowered to lax.conv_general_dilated → MXU)
# ---------------------------------------------------------------------------

@register("Conv")
def _conv(node, inputs, ctx):
    x, w = inputs[0], inputs[1]
    groups = node.attr("group", 1)
    strides = node.attr("strides")
    dilations = node.attr("dilations")
    pads = node.attr("pads")
    auto_pad = node.attr("auto_pad", "NOTSET")
    spatial = x.ndim - 2
    strides = tuple(strides) if strides else (1,) * spatial
    dilations = tuple(dilations) if dilations else (1,) * spatial
    if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
        padding = "SAME"
    elif pads:
        padding = [(pads[i], pads[i + spatial]) for i in range(spatial)]
    else:
        padding = [(0, 0)] * spatial
    dn = lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW", "OIHW", "NCHW") if spatial == 2 else
        ("NCH", "OIH", "NCH") if spatial == 1 else
        ("NCDHW", "OIDHW", "NCDHW"),
    )
    y = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=groups, precision=_HIGHEST,
    )
    if len(inputs) > 2 and inputs[2] is not None:
        b = inputs[2]
        y = y + b.reshape((1, -1) + (1,) * spatial)
    return [y]


@register("BatchNormalization")
def _batchnorm(node, inputs, ctx):
    x, scale, bias, mean, var = inputs[:5]
    eps = node.attr("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = lax.rsqrt(var + eps)
    return [(x - mean.reshape(shape)) * (inv * scale).reshape(shape) + bias.reshape(shape)]


@register("GlobalAveragePool")
def _global_avg_pool(node, inputs, ctx):
    x = inputs[0]
    axes = tuple(range(2, x.ndim))
    return [jnp.mean(x, axis=axes, keepdims=True)]


@register("GlobalMaxPool")
def _global_max_pool(node, inputs, ctx):
    x = inputs[0]
    axes = tuple(range(2, x.ndim))
    return [jnp.max(x, axis=axes, keepdims=True)]


def _pool(reduce_fn, init, is_avg):
    def impl(node, inputs, ctx):
        x = inputs[0]
        spatial = x.ndim - 2
        kernel = tuple(node.attr("kernel_shape"))
        strides = tuple(node.attr("strides") or (1,) * spatial)
        pads = node.attr("pads")
        auto_pad = node.attr("auto_pad", "NOTSET")
        if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
            padding = "SAME"
        elif pads:
            padding = [(0, 0), (0, 0)] + [(pads[i], pads[i + spatial]) for i in range(spatial)]
        else:
            padding = [(0, 0)] * x.ndim
        window = (1, 1) + kernel
        strides_full = (1, 1) + strides
        if padding == "SAME":
            y = lax.reduce_window(x, init, reduce_fn, window, strides_full, "SAME")
        else:
            y = lax.reduce_window(x, init, reduce_fn, window, strides_full, padding)
        if is_avg:
            ones = jnp.ones_like(x)
            denom = lax.reduce_window(ones, 0.0, lax.add, window, strides_full,
                                      "SAME" if padding == "SAME" else padding)
            y = y / denom
        return [y]

    return impl


register("MaxPool")(_pool(lax.max, -jnp.inf, False))
register("AveragePool")(_pool(lax.add, 0.0, True))


@register("Dropout")
def _dropout(node, inputs, ctx):
    # Inference mode: identity (optionally also emits an all-true mask).
    outs = [inputs[0]]
    if len(node.outputs) > 1:
        outs.append(jnp.ones(inputs[0].shape, dtype=bool))
    return outs


@register("LayerNormalization")
def _layernorm(node, inputs, ctx):
    x = inputs[0]
    scale = inputs[1]
    bias = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
    axis = node.attr("axis", -1)
    eps = node.attr("epsilon", 1e-5)
    axes = tuple(range(axis % x.ndim, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=axes, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps) * scale
    if bias is not None:
        y = y + bias
    outs = [y]
    if len(node.outputs) > 1:
        outs.append(mean)
    if len(node.outputs) > 2:
        outs.append(lax.rsqrt(var + eps))
    return outs


@register("Gelu")
def _gelu(node, inputs, ctx):
    approx = node.attr("approximate", "none")
    if isinstance(approx, bytes):
        approx = approx.decode()
    return [jax.nn.gelu(inputs[0], approximate=(approx == "tanh"))]


@register("LRN")
def _lrn(node, inputs, ctx):
    x = inputs[0]
    size = node.attr("size")
    alpha = node.attr("alpha", 1e-4)
    beta = node.attr("beta", 0.75)
    bias = node.attr("bias", 1.0)
    half = size // 2
    sq = x * x
    pads = [(0, 0), (half, size - 1 - half)] + [(0, 0)] * (x.ndim - 2)
    padded = jnp.pad(sq, pads)
    acc = sum(
        lax.slice_in_dim(padded, i, i + x.shape[1], axis=1) for i in range(size)
    )
    return [x / jnp.power(bias + (alpha / size) * acc, beta)]
