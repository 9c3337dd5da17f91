"""Signal/vision ONNX ops (onnx/signal_vision_ops.py): DFT/STFT vs numpy
FFT, GridSample vs torch, RoiAlign vs a direct-from-spec scalar reference,
MelWeightMatrix invariants."""

import numpy as np
import pytest

from infera_tpu.onnx.executor import _Ctx
from infera_tpu.onnx.ops import get_impl
from infera_tpu.onnx.proto import Attribute, Node


def _node(op, inputs, outputs, **attrs):
    return Node(op_type=op, inputs=inputs, outputs=outputs,
                attributes={k: Attribute.make(k, v) for k, v in attrs.items()})


def _run(op, inputs, **attrs):
    import jax.numpy as jnp

    node = _node(op, [f"i{k}" for k in range(len(inputs))], ["y"], **attrs)
    vals = [v if isinstance(v, np.ndarray) or v is None else jnp.asarray(v)
            for v in inputs]
    return np.asarray(get_impl("", op)(node, vals, _Ctx({}))[0])


# ---------------------------------------------------------------------------
# DFT
# ---------------------------------------------------------------------------


def test_dft_real_forward_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 1)).astype(np.float32)
    got = _run("DFT", [x])
    want = np.fft.fft(x[..., 0].astype(np.float64), axis=1)
    np.testing.assert_allclose(got[..., 0], want.real, atol=1e-4)
    np.testing.assert_allclose(got[..., 1], want.imag, atol=1e-4)


def test_dft_complex_inverse_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 12, 2)).astype(np.float32)
    spec = _run("DFT", [x])
    back = _run("DFT", [spec], inverse=1)
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_dft_onesided_and_axis():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 8, 1)).astype(np.float32)
    got = _run("DFT", [x], axis=2, onesided=1)
    want = np.fft.rfft(x[..., 0].astype(np.float64), axis=2)
    assert got.shape == (2, 5, 5, 2)
    np.testing.assert_allclose(got[..., 0], want.real, atol=1e-4)
    np.testing.assert_allclose(got[..., 1], want.imag, atol=1e-4)


def test_dft_length_pad_and_truncate():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 10, 1)).astype(np.float32)
    got = _run("DFT", [x, np.asarray(16)])
    want = np.fft.fft(x[..., 0].astype(np.float64), n=16, axis=1)
    np.testing.assert_allclose(got[..., 0], want.real, atol=1e-4)
    got = _run("DFT", [x, np.asarray(8)])
    want = np.fft.fft(x[:, :8, 0].astype(np.float64), axis=1)
    np.testing.assert_allclose(got[..., 1], want.imag, atol=1e-4)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def test_stft_matches_numpy_frames():
    rng = np.random.default_rng(4)
    sig = rng.standard_normal((2, 64, 1)).astype(np.float32)
    window = np.hanning(16).astype(np.float32)
    got = _run("STFT", [sig, np.asarray(8), window])
    frames = (64 - 16) // 8 + 1
    assert got.shape == (2, frames, 16 // 2 + 1, 2)
    for b in range(2):
        for t in range(frames):
            seg = sig[b, t * 8: t * 8 + 16, 0].astype(np.float64)
            want = np.fft.rfft(seg * window)
            np.testing.assert_allclose(got[b, t, :, 0], want.real, atol=1e-4)
            np.testing.assert_allclose(got[b, t, :, 1], want.imag, atol=1e-4)


def test_stft_twosided_no_window():
    rng = np.random.default_rng(5)
    sig = rng.standard_normal((1, 32, 1)).astype(np.float32)
    got = _run("STFT", [sig, np.asarray(16), None, np.asarray(16)],
               onesided=0)
    assert got.shape == (1, 2, 16, 2)
    want = np.fft.fft(sig[0, :16, 0].astype(np.float64))
    np.testing.assert_allclose(got[0, 0, :, 0], want.real, atol=1e-4)


# ---------------------------------------------------------------------------
# MelWeightMatrix
# ---------------------------------------------------------------------------


def test_mel_weight_matrix_shape_and_triangles():
    got = _run("MelWeightMatrix",
               [np.asarray(8), np.asarray(16), np.asarray(8192),
                np.asarray(0.0, np.float32), np.asarray(4096.0, np.float32)])
    assert got.shape == (9, 8) and got.dtype == np.float32
    assert (got >= 0).all() and (got <= 1).all()
    # every mel bin has a nonempty triangle and bins tile the spectrum in
    # increasing frequency order
    peaks = got.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    assert got.sum() > 0


# ---------------------------------------------------------------------------
# GridSample vs torch
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["linear", "nearest"])
@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align", [0, 1])
def test_grid_sample_matches_torch(mode, padding, align):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 5, 7)).astype(np.float32)
    grid = (rng.uniform(-1.4, 1.4, (2, 4, 6, 2))).astype(np.float32)
    got = _run("GridSample", [x, grid], mode=mode, padding_mode=padding,
               align_corners=align)
    tmode = "bilinear" if mode == "linear" else mode
    want = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                         mode=tmode, padding_mode=padding,
                         align_corners=bool(align)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# RoiAlign vs a direct-from-spec scalar reference
# ---------------------------------------------------------------------------


def _roi_align_ref(x, rois, bidx, out_h, out_w, ratio, scale, mode, ctm):
    N, C, H, W = x.shape
    R = rois.shape[0]
    out = np.zeros((R, C, out_h, out_w), np.float64)
    for r in range(R):
        x1, y1, x2, y2 = rois[r].astype(np.float64) * scale
        if ctm == "half_pixel":
            x1, y1, x2, y2 = x1 - 0.5, y1 - 0.5, x2 - 0.5, y2 - 0.5
        rw, rh = x2 - x1, y2 - y1
        if ctm != "half_pixel":
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out_w, rh / out_h
        b = int(bidx[r])
        for ph in range(out_h):
            for pw in range(out_w):
                acc, n_acc, mx = 0.0, 0, -np.inf
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y1 + ph * bh + (iy + 0.5) * bh / ratio
                        xx = x1 + pw * bw + (ix + 0.5) * bw / ratio
                        if y < -1.0 or y > H or xx < -1.0 or xx > W:
                            continue
                        y = min(max(y, 0.0), H - 1)
                        xx = min(max(xx, 0.0), W - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(xx))
                        y1b, x1b = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y - y0, xx - x0
                        for ch in range(C):
                            v = (x[b, ch, y0, x0] * (1 - ly) * (1 - lx)
                                 + x[b, ch, y0, x1b] * (1 - ly) * lx
                                 + x[b, ch, y1b, x0] * ly * (1 - lx)
                                 + x[b, ch, y1b, x1b] * ly * lx)
                            if ch == 0:
                                n_acc += 1
                            if mode == "avg":
                                out[r, ch, ph, pw] += v
                            else:
                                out[r, ch, ph, pw] = max(out[r, ch, ph, pw],
                                                         v)
                if mode == "avg" and n_acc:
                    out[r, :, ph, pw] /= n_acc
    return out


@pytest.mark.parametrize("mode", ["avg", "max"])
@pytest.mark.parametrize("ctm", ["half_pixel", "output_half_pixel"])
def test_roi_align_matches_reference(mode, ctm):
    rng = np.random.default_rng(7)
    x = rng.uniform(0.1, 1.0, (2, 3, 10, 12)).astype(np.float32)
    rois = np.array([[1.0, 1.0, 8.0, 6.0],
                     [0.0, 0.0, 11.0, 9.0],
                     [2.5, 3.5, 7.0, 7.0]], np.float32)
    bidx = np.array([0, 1, 0], np.int64)
    got = _run("RoiAlign", [x, rois, bidx], output_height=3, output_width=4,
               sampling_ratio=2, spatial_scale=1.0, mode=mode,
               coordinate_transformation_mode=ctm)
    want = _roi_align_ref(x, rois, bidx, 3, 4, 2, 1.0, mode, ctm)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_adaptive_needs_static_rois():
    from infera_tpu.errors import OnnxError

    x = np.zeros((1, 1, 4, 4), np.float32)
    rois = np.array([[0.0, 0.0, 3.0, 3.0]], np.float32)
    bidx = np.array([0], np.int64)
    # static rois: adaptive ratio resolves at trace time
    got = _run("RoiAlign", [x, rois, bidx], output_height=2, output_width=2)
    assert got.shape == (1, 1, 2, 2)
    # runtime rois with ratio 0: explicit error, not a silent wrong answer
    import jax.numpy as jnp

    node = _node("RoiAlign", ["x", "r", "b"], ["y"])
    with pytest.raises(OnnxError, match="sampling_ratio"):
        get_impl("", "RoiAlign")(
            node, [jnp.asarray(x), jnp.asarray(rois), jnp.asarray(bidx)],
            _Ctx({}))


# ---------------------------------------------------------------------------
# DeformConv
# ---------------------------------------------------------------------------


def test_deform_conv_zero_offsets_equals_conv():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(8)
    n, c, h, wd, oc, k = 2, 4, 8, 9, 6, 3
    x = rng.standard_normal((n, c, h, wd)).astype(np.float32)
    w = rng.standard_normal((oc, c, k, k)).astype(np.float32)
    b = rng.standard_normal(oc).astype(np.float32)
    oh, ow = h - k + 1, wd - k + 1
    offset = np.zeros((n, 2 * k * k, oh, ow), np.float32)
    got = _run("DeformConv", [x, w, offset, b], kernel_shape=[k, k])
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _deform_conv_ref(x, w, offset, b, mask, stride, pad, dil, group, og):
    N, C, H, W = x.shape
    oC, _, kH, kW = w.shape
    oH, oW = offset.shape[2], offset.shape[3]
    out = np.zeros((N, oC, oH, oW), np.float64)
    cpg = C // group      # input channels per weight group
    cpo = C // og         # input channels per offset group
    off = offset.reshape(N, og, kH, kW, 2, oH, oW)
    for n in range(N):
        for o in range(oC):
            g = o // (oC // group)
            for oy in range(oH):
                for ox in range(oW):
                    acc = 0.0
                    for ci in range(cpg):
                        c = g * cpg + ci
                        eg = c // cpo
                        for i in range(kH):
                            for j in range(kW):
                                y = (oy * stride - pad + i * dil
                                     + off[n, eg, i, j, 0, oy, ox])
                                xx = (ox * stride - pad + j * dil
                                      + off[n, eg, i, j, 1, oy, ox])
                                y0, x0 = int(np.floor(y)), int(np.floor(xx))
                                ly, lx = y - y0, xx - x0
                                v = 0.0
                                for dy, wy in ((0, 1 - ly), (1, ly)):
                                    for dx, wx in ((0, 1 - lx), (1, lx)):
                                        yy, xc = y0 + dy, x0 + dx
                                        if 0 <= yy < H and 0 <= xc < W:
                                            v += x[n, c, yy, xc] * wy * wx
                                if mask is not None:
                                    v *= mask.reshape(
                                        N, og, kH, kW, oH, oW)[n, eg, i, j,
                                                               oy, ox]
                                acc += v * w[o, ci, i, j]
                    out[n, o, oy, ox] = acc + (b[o] if b is not None else 0)
    return out


@pytest.mark.parametrize("group,og,with_mask", [(1, 1, False), (2, 2, True)])
def test_deform_conv_random_offsets_vs_reference(group, og, with_mask):
    rng = np.random.default_rng(9)
    n, c, h, wd, oc, k = 1, 4, 6, 7, 4, 3
    stride, pad, dil = 2, 1, 1
    oh = (h + 2 * pad - k) // stride + 1
    ow = (wd + 2 * pad - k) // stride + 1
    x = rng.standard_normal((n, c, h, wd)).astype(np.float32)
    w = rng.standard_normal((oc, c // group, k, k)).astype(np.float32)
    offset = rng.uniform(-1.5, 1.5,
                         (n, og * 2 * k * k, oh, ow)).astype(np.float32)
    mask = (rng.uniform(0.2, 1.0, (n, og * k * k, oh, ow)).astype(np.float32)
            if with_mask else None)
    inputs = [x, w, offset, None, mask] if with_mask else [x, w, offset]
    got = _run("DeformConv", inputs, kernel_shape=[k, k],
               strides=[stride, stride], pads=[pad, pad, pad, pad],
               dilations=[dil, dil], group=group, offset_group=og)
    want = _deform_conv_ref(x, w, offset, None, mask, stride, pad, dil,
                            group, og)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Random family (deterministic under jax.random, seeded via the seed attr)
# ---------------------------------------------------------------------------


def test_random_normal_moments_and_determinism():
    got = _run("RandomNormal", [], shape=[20000], seed=3.0, mean=2.0,
               scale=0.5)
    assert got.shape == (20000,)
    assert abs(got.mean() - 2.0) < 0.02 and abs(got.std() - 0.5) < 0.02
    again = _run("RandomNormal", [], shape=[20000], seed=3.0, mean=2.0,
                 scale=0.5)
    np.testing.assert_array_equal(got, again)  # same seed -> same stream
    other = _run("RandomNormal", [], shape=[20000], seed=4.0, mean=2.0,
                 scale=0.5)
    assert not np.array_equal(got, other)


def test_random_uniform_range_and_like_shapes():
    got = _run("RandomUniform", [], shape=[5000], low=2.0, high=3.0)
    assert (got >= 2.0).all() and (got < 3.0).all()
    like = _run("RandomNormalLike", [np.zeros((3, 4), np.float32)])
    assert like.shape == (3, 4)


def test_bernoulli_and_multinomial():
    b = _run("Bernoulli", [np.full((20000,), 0.3, np.float32)], seed=1.0)
    assert set(np.unique(b)) <= {0.0, 1.0}
    assert abs(b.mean() - 0.3) < 0.02
    m = _run("Multinomial", [np.log(np.asarray(
        [[0.005, 0.005, 0.99]], np.float32))], sample_size=8, seed=2.0)
    assert m.shape == (1, 8) and (m == 2).mean() > 0.8
