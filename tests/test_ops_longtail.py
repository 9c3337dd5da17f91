"""Long-tail ONNX ops toward tract's full opset: ConvTranspose (vs torch),
NonMaxSuppression and Unique (static-fold exact semantics)."""

import numpy as np
import pytest

from infera_tpu.onnx.executor import _Ctx
from infera_tpu.onnx.ops import get_impl
from infera_tpu.onnx.proto import Attribute, Node


def _node(op, inputs, outputs, **attrs):
    return Node(op_type=op, inputs=inputs, outputs=outputs,
                attributes={k: Attribute.make(k, v) for k, v in attrs.items()})


@pytest.mark.parametrize(
    "stride,pad,out_pad,group,dilation",
    [(1, 0, 0, 1, 1), (2, 1, 1, 1, 1), (2, 0, 0, 2, 1), (1, 1, 0, 1, 2)],
)
def test_conv_transpose_matches_torch(stride, pad, out_pad, group, dilation):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    n, cin, cout, h = 2, 4, 6, 9
    k = 3
    x = rng.standard_normal((n, cin, h, h)).astype(np.float32)
    w = rng.standard_normal((cin, cout // group, k, k)).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    want = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, output_padding=out_pad,
        groups=group, dilation=dilation).numpy()

    node = _node("ConvTranspose", ["x", "w", "b"], ["y"],
                 strides=[stride, stride], pads=[pad, pad, pad, pad],
                 output_padding=[out_pad, out_pad], group=group,
                 dilations=[dilation, dilation])
    impl = get_impl("", "ConvTranspose")
    import jax.numpy as jnp

    got = impl(node, [jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)],
               _Ctx({}))[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_conv_transpose_output_shape_attr():
    import torch.nn.functional as F
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 5, 5)).astype(np.float32)
    w = rng.standard_normal((3, 4, 3, 3)).astype(np.float32)
    # stride 2, no explicit pads: ONNX derives pads to hit output_shape 10x10
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              stride=2, padding=0).numpy()  # 11x11 natural
    node = _node("ConvTranspose", ["x", "w"], ["y"], strides=[2, 2],
                 output_shape=[11, 11])
    impl = get_impl("", "ConvTranspose")
    import jax.numpy as jnp

    got = impl(node, [jnp.asarray(x), jnp.asarray(w)], _Ctx({}))[0]
    assert got.shape == (1, 4, 11, 11)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_non_max_suppression_static():
    boxes = np.asarray([[
        [0.0, 0.0, 1.0, 1.0],
        [0.0, 0.1, 1.0, 1.1],    # IoU ~0.82 with box 0
        [0.0, 10.0, 1.0, 11.0],  # far away
        [0.0, 10.1, 1.0, 11.1],  # overlaps box 2
    ]], np.float32)
    scores = np.asarray([[[0.9, 0.75, 0.6, 0.95]]], np.float32)
    node = _node("NonMaxSuppression", ["b", "s", "m", "iou", "sc"], ["y"])
    ctx = _Ctx({"b": boxes, "s": scores,
                "m": np.asarray([3], np.int64),
                "iou": np.asarray([0.5], np.float32),
                "sc": np.asarray([0.0], np.float32)})
    impl = get_impl("", "NonMaxSuppression")
    got = impl(node, [boxes, scores, None, None, None], ctx)[0]
    # order: score-descending, overlapping suppressed: box3 (.95), box0 (.9),
    # box1 suppressed by 0, box2 suppressed by 3
    assert got.tolist() == [[0, 0, 3], [0, 0, 0]]


def test_non_max_suppression_traced_raises():
    import jax.numpy as jnp

    from infera_tpu.errors import OnnxError

    node = _node("NonMaxSuppression", ["b", "s"], ["y"])
    ctx = _Ctx({})
    impl = get_impl("", "NonMaxSuppression")
    import jax

    with pytest.raises(OnnxError, match="statically known"):
        jax.jit(lambda b, s: impl(
            _node("NonMaxSuppression", ["b", "s"], ["y"]),
            [b, s], _Ctx({})))(jnp.zeros((1, 2, 4)), jnp.zeros((1, 1, 2)))


def test_unique_sorted_and_unsorted():
    x = np.asarray([2, 1, 1, 3, 4, 3], np.int64)
    node_sorted = _node("Unique", ["x"], ["y", "i", "inv", "c"])
    impl = get_impl("", "Unique")
    y, idx, inv, cnt = impl(node_sorted, [x], _Ctx({"x": x}))
    assert y.tolist() == [1, 2, 3, 4]
    assert cnt.tolist() == [2, 1, 2, 1]
    assert (y[inv] == x).all()

    node_unsorted = _node("Unique", ["x"], ["y", "i", "inv", "c"], sorted=0)
    y, idx, inv, cnt = impl(node_unsorted, [x], _Ctx({"x": x}))
    assert y.tolist() == [2, 1, 3, 4]  # first-occurrence order
    assert cnt.tolist() == [1, 2, 2, 1]
    assert (y[inv] == x).all()
    assert idx.tolist() == [0, 1, 3, 4]


def test_unique_axis():
    x = np.asarray([[1, 0], [1, 0], [2, 3]], np.int64)
    node = _node("Unique", ["x"], ["y", "i", "inv", "c"], axis=0)
    impl = get_impl("", "Unique")
    y, idx, inv, cnt = impl(node, [x], _Ctx({"x": x}))
    assert y.tolist() == [[1, 0], [2, 3]]
    assert cnt.tolist() == [2, 1]
