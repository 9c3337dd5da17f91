"""Signal-processing and vision ONNX ops (DFT/STFT/MelWeightMatrix,
GridSample/RoiAlign).

These close the last "addressable on demand" rows of docs/ONNX_COVERAGE.md's
gap table vs tract's opset (the reference executes through tract,
/root/reference/infera/src/engine.rs:49-55). The lowerings are TPU-first:

- DFT/STFT evaluate as dense matmuls against [k, n] cos/sin basis matrices —
  O(n^2) instead of an FFT butterfly, but a single MXU-shaped contraction;
  inference exports use short frames (n <= 1024) where the matmul form is
  both simpler and faster on the systolic array than a scalar FFT would be.
- MelWeightMatrix is fully static → folded to a constant at trace time,
  mirroring the ONNX reference implementation's integer-bin triangles.
- GridSample/RoiAlign lower to batched gathers with vectorized corner
  weights (no data-dependent shapes; RoiAlign's adaptive sampling grid is
  resolved statically or requires an explicit sampling_ratio).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..errors import OnnxError
from .ops import _HIGHEST, register

# ---------------------------------------------------------------------------
# DFT family
# ---------------------------------------------------------------------------


def _dft_matrices(n: int, n_out: int, inverse: bool):
    """[n_out, n] cosine/sine basis (f32 from f64 trig for accuracy)."""
    k = np.arange(n_out, dtype=np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * j / n
    c = np.cos(ang)
    s = np.sin(ang)
    if inverse:
        c, s = c / n, s / n
    return jnp.asarray(c, jnp.float32), jnp.asarray(s, jnp.float32)


def _apply_dft(xr, xi, n: int, onesided: bool, inverse: bool):
    """DFT along the LAST axis of xr/xi; returns (re, im) with the last
    axis sized n//2+1 when onesided."""
    n_out = n // 2 + 1 if onesided else n
    c, s = _dft_matrices(n, n_out, inverse)

    def mm(v, m):
        return jnp.tensordot(v, m, axes=[[-1], [1]]).astype(jnp.float32)

    if inverse:  # e^{+i theta}
        re = mm(xr, c) - (mm(xi, s) if xi is not None else 0.0)
        im = mm(xr, s) + (mm(xi, c) if xi is not None else 0.0)
    else:  # e^{-i theta}
        re = mm(xr, c) + (mm(xi, s) if xi is not None else 0.0)
        im = -mm(xr, s) + (mm(xi, c) if xi is not None else 0.0)
    return re, im


@register("DFT")
def _dft(node, inputs, ctx):
    x = jnp.asarray(inputs[0], jnp.float32)
    inverse = bool(node.attr("inverse", 0))
    onesided = bool(node.attr("onesided", 0))
    if inverse and onesided:
        raise OnnxError("DFT: inverse and onesided are mutually exclusive")
    axis = int(node.attr("axis", 1))
    if len(inputs) > 2 and inputs[2] is not None:  # opset-20 axis input
        ax = ctx.as_static(inputs[2])
        if ax is None:
            raise OnnxError("DFT: axis must be statically known")
        axis = int(np.asarray(ax))
    if axis < 0:
        axis += x.ndim
    if axis == x.ndim - 1:
        raise OnnxError("DFT: axis cannot be the component dimension")
    comp = x.shape[-1]
    if comp not in (1, 2):
        raise OnnxError("DFT: last dimension must be 1 (real) or 2 (complex)")
    n = x.shape[axis]
    if len(inputs) > 1 and inputs[1] is not None:
        dl = ctx.as_static(inputs[1])
        if dl is None:
            raise OnnxError("DFT: dft_length must be statically known")
        dft_length = int(np.asarray(dl))
        if dft_length < n:
            x = jnp.take(x, jnp.arange(dft_length), axis=axis)
        elif dft_length > n:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, dft_length - n)
            x = jnp.pad(x, pad)
        n = dft_length
    # move the transform axis last (components split off first)
    xr = jnp.moveaxis(x[..., 0], axis, -1)
    xi = jnp.moveaxis(x[..., 1], axis, -1) if comp == 2 else None
    re, im = _apply_dft(xr, xi, n, onesided, inverse)
    out = jnp.stack([jnp.moveaxis(re, -1, axis),
                     jnp.moveaxis(im, -1, axis)], axis=-1)
    return [out]


@register("STFT")
def _stft(node, inputs, ctx):
    signal = jnp.asarray(inputs[0], jnp.float32)
    onesided = bool(node.attr("onesided", 1))
    step = ctx.as_static(inputs[1])
    if step is None:
        raise OnnxError("STFT: frame_step must be statically known")
    step = int(np.asarray(step))
    window = inputs[2] if len(inputs) > 2 else None
    frame_length = None
    if len(inputs) > 3 and inputs[3] is not None:
        fl = ctx.as_static(inputs[3])
        if fl is None:
            raise OnnxError("STFT: frame_length must be statically known")
        frame_length = int(np.asarray(fl))
    if frame_length is None:
        if window is None:
            raise OnnxError("STFT: needs window or frame_length")
        frame_length = int(window.shape[0])
    comp = signal.shape[-1]
    if comp not in (1, 2):
        raise OnnxError("STFT: last dimension must be 1 (real) or 2")
    if onesided and comp == 2:
        raise OnnxError("STFT: onesided requires a real signal")
    length = signal.shape[1]
    frames = (length - frame_length) // step + 1
    if frames < 1:
        raise OnnxError("STFT: signal shorter than one frame")
    idx = (np.arange(frames)[:, None] * step
           + np.arange(frame_length)[None, :])  # [frames, frame_length]
    framed = signal[:, jnp.asarray(idx), :]  # [b, frames, frame_length, c]
    if window is not None:
        framed = framed * jnp.asarray(
            window, jnp.float32)[None, None, :, None]
    xr = framed[..., 0]
    xi = framed[..., 1] if comp == 2 else None
    re, im = _apply_dft(xr, xi, frame_length, onesided, inverse=False)
    return [jnp.stack([re, im], axis=-1)]


@register("MelWeightMatrix")
def _mel_weight_matrix(node, inputs, ctx):
    vals = [ctx.as_static(v) for v in inputs[:5]]
    if any(v is None for v in vals):
        raise OnnxError(
            "MelWeightMatrix: all five inputs must be statically known")
    num_mel, dft_length, sample_rate = (int(np.asarray(v)) for v in vals[:3])
    low_hz, high_hz = (float(np.asarray(v)) for v in vals[3:5])
    n_spec = dft_length // 2 + 1

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(low_hz), hz_to_mel(high_hz), num_mel + 2)
    # integer FFT-bin centers, as in the ONNX reference implementation
    bins = np.floor((dft_length + 1) * mel_to_hz(mel_pts) / sample_rate)
    out = np.zeros((n_spec, num_mel), np.float64)
    spec = np.arange(n_spec, dtype=np.float64)
    for i in range(num_mel):
        left, center, right = bins[i], bins[i + 1], bins[i + 2]
        up = (spec - left) / max(center - left, 1.0)
        down = (right - spec) / max(right - center, 1.0)
        tri = np.maximum(0.0, np.minimum(up, down))
        tri[spec > right] = 0.0
        tri[spec < left] = 0.0
        out[:, i] = tri
    dtype = {1: np.float32, 11: np.float64}.get(
        int(node.attr("output_datatype", 1)), np.float32)
    return [jnp.asarray(out.astype(dtype))]


# ---------------------------------------------------------------------------
# GridSample / RoiAlign
# ---------------------------------------------------------------------------


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(coord, size: int, align_corners: bool):
    """Reflection padding in continuous coordinates (torch semantics)."""
    if size == 1:
        return jnp.zeros_like(coord)
    if align_corners:
        span = 2.0 * (size - 1)
        c = jnp.abs(jnp.mod(coord, span))
        return jnp.where(c > size - 1, span - c, c)
    span = 2.0 * size
    c = jnp.mod(coord + 0.5, span)
    c = jnp.abs(c)
    c = jnp.where(c > size, span - c, c) - 0.5
    return jnp.clip(c, 0.0, size - 1)


def _sample_2d(xp, b_idx, ys, xs, H: int, W: int, padding: str,
               align_corners: bool, nearest: bool):
    """Gather/interpolate xp [N, H, W, C] at continuous (ys, xs) per-batch
    index arrays (all broadcast-compatible); returns [..., C]."""
    if padding == "reflection":
        ys = _reflect(ys, H, align_corners)
        xs = _reflect(xs, W, align_corners)
    if nearest:
        yi = jnp.rint(ys).astype(jnp.int32)
        xi = jnp.rint(xs).astype(jnp.int32)
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        v = xp[b_idx, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        if padding == "zeros":
            v = jnp.where(inb[..., None], v, 0.0)
        return v
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    out = 0.0
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            yi = y0.astype(jnp.int32) + dy
            xi = x0.astype(jnp.int32) + dx
            inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            v = xp[b_idx, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
            w = wy * wx
            if padding == "zeros":
                w = jnp.where(inb, w, 0.0)
            out = out + v * w[..., None]
    return out


@register("GridSample")
def _grid_sample(node, inputs, ctx):
    x = jnp.asarray(inputs[0], jnp.float32)
    grid = jnp.asarray(inputs[1], jnp.float32)
    mode = node.attr("mode", "linear")
    if mode == "bilinear":
        mode = "linear"
    if mode not in ("linear", "nearest"):
        raise OnnxError(f"GridSample: unsupported mode '{mode}'")
    padding = node.attr("padding_mode", "zeros")
    if padding not in ("zeros", "border", "reflection"):
        raise OnnxError(f"GridSample: unsupported padding_mode '{padding}'")
    align = bool(node.attr("align_corners", 0))
    if x.ndim != 4 or grid.ndim != 4:
        raise OnnxError("GridSample: only 4-D (NCHW) input is supported")
    N, C, H, W = x.shape
    xp = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for trailing-channel gathers
    gx = _unnormalize(grid[..., 0], W, align)  # [N, Ho, Wo]
    gy = _unnormalize(grid[..., 1], H, align)
    b_idx = jnp.arange(N, dtype=jnp.int32)[:, None, None]
    out = _sample_2d(xp, b_idx, gy, gx, H, W, padding, align,
                     nearest=(mode == "nearest"))
    return [jnp.transpose(out, (0, 3, 1, 2))]


@register("RoiAlign")
def _roi_align(node, inputs, ctx):
    x = jnp.asarray(inputs[0], jnp.float32)
    rois = jnp.asarray(inputs[1], jnp.float32)
    batch_idx = jnp.asarray(inputs[2], jnp.int32)
    out_h = int(node.attr("output_height", 1))
    out_w = int(node.attr("output_width", 1))
    ratio = int(node.attr("sampling_ratio", 0))
    scale = float(node.attr("spatial_scale", 1.0))
    mode = node.attr("mode", "avg")
    ctm = node.attr("coordinate_transformation_mode", "half_pixel")
    if mode not in ("avg", "max"):
        raise OnnxError(f"RoiAlign: unsupported mode '{mode}'")
    N, C, H, W = x.shape
    R = rois.shape[0]
    if ratio < 1:
        static_rois = ctx.as_static(inputs[1])
        if static_rois is None:
            raise OnnxError(
                "RoiAlign: sampling_ratio=0 (adaptive) needs static rois; "
                "set an explicit sampling_ratio for runtime rois")
        r = np.asarray(static_rois, np.float64) * scale
        if ctm == "half_pixel":
            r = r - 0.5
        rw = r[:, 2] - r[:, 0]
        rh = r[:, 3] - r[:, 1]
        if ctm != "half_pixel":
            rw, rh = np.maximum(rw, 1.0), np.maximum(rh, 1.0)
        # one static grid covering every roi's adaptive count
        ratio = max(1, int(np.ceil(max(rw.max() / out_w, rh.max() / out_h)))
                    if R else 1)
    xp = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    x2 = rois[:, 2] * scale
    y2 = rois[:, 3] * scale
    if ctm == "half_pixel":
        x1, y1, x2, y2 = x1 - 0.5, y1 - 0.5, x2 - 0.5, y2 - 0.5
    rw = x2 - x1
    rh = y2 - y1
    if ctm != "half_pixel":
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)
    bin_w = rw / out_w
    bin_h = rh / out_h
    ph = jnp.arange(out_h, dtype=jnp.float32)
    pw = jnp.arange(out_w, dtype=jnp.float32)
    iy = jnp.arange(ratio, dtype=jnp.float32)
    ix = jnp.arange(ratio, dtype=jnp.float32)
    # ys: [R, out_h, sample_y] ; xs: [R, out_w, sample_x]
    ys = (y1[:, None, None] + ph[None, :, None] * bin_h[:, None, None]
          + (iy[None, None, :] + 0.5) * bin_h[:, None, None] / ratio)
    xs = (x1[:, None, None] + pw[None, :, None] * bin_w[:, None, None]
          + (ix[None, None, :] + 0.5) * bin_w[:, None, None] / ratio)
    # broadcast to [R, out_h, out_w, sy, sx]
    ysb = ys[:, :, None, :, None]
    xsb = xs[:, None, :, None, :]
    yc = jnp.clip(jnp.broadcast_to(
        ysb, (R, out_h, out_w, ratio, ratio)), 0.0, H - 1)
    xc = jnp.clip(jnp.broadcast_to(
        xsb, (R, out_h, out_w, ratio, ratio)), 0.0, W - 1)
    # ONNX reference: samples fully outside [-1, size] contribute nothing
    valid = ((ysb > -1.0) & (ysb < H) & (xsb > -1.0) & (xsb < W))
    valid = jnp.broadcast_to(valid, (R, out_h, out_w, ratio, ratio))
    b_idx = batch_idx[:, None, None, None, None]
    v = _sample_2d(xp, b_idx, yc, xc, H, W, "border", True, nearest=False)
    v = jnp.where(valid[..., None], v, 0.0 if mode == "avg" else -jnp.inf)
    if mode == "avg":
        out = v.sum(axis=(3, 4)) / jnp.maximum(
            valid.sum(axis=(3, 4))[..., None].astype(jnp.float32), 1.0)
    else:
        out = jnp.max(v, axis=(3, 4))
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    return [jnp.transpose(out, (0, 3, 1, 2))]


@register("DeformConv")
def _deform_conv(node, inputs, ctx):
    """Deformable convolution v2 (opset 19). The sampling OFFSETS are
    runtime tensors but every shape is static, so each kernel tap lowers
    to four gathers with bilinear weights (zero padding outside), and the
    tap-weighted contraction is a single einsum the MXU executes as a
    matmul — the data-dependence lives in gather indices, never in
    shapes."""
    x = jnp.asarray(inputs[0], jnp.float32)
    w = jnp.asarray(inputs[1], jnp.float32)
    offset = jnp.asarray(inputs[2], jnp.float32)
    b = inputs[3] if len(inputs) > 3 and inputs[3] is not None else None
    mask = (jnp.asarray(inputs[4], jnp.float32)
            if len(inputs) > 4 and inputs[4] is not None else None)
    if x.ndim != 4:
        raise OnnxError("DeformConv: only 2-D (NCHW) input is supported")
    N, C, H, W = x.shape
    oC, wc, kH, kW = w.shape
    group = int(node.attr("group", 1))
    og = int(node.attr("offset_group", 1))
    strides = [int(v) for v in node.attr("strides", [1, 1])]
    dil = [int(v) for v in node.attr("dilations", [1, 1])]
    pads = [int(v) for v in node.attr("pads", [0, 0, 0, 0])]
    oH, oW = offset.shape[2], offset.shape[3]
    # base sampling grid per tap: [kH, kW, oH, oW]
    oy = jnp.arange(oH, dtype=jnp.float32) * strides[0] - pads[0]
    ox = jnp.arange(oW, dtype=jnp.float32) * strides[1] - pads[1]
    ky = jnp.arange(kH, dtype=jnp.float32) * dil[0]
    kx = jnp.arange(kW, dtype=jnp.float32) * dil[1]
    base_y = ky[:, None, None, None] + oy[None, None, :, None]
    base_x = kx[None, :, None, None] + ox[None, None, None, :]
    off = offset.reshape(N, og, kH, kW, 2, oH, oW)
    ys = base_y[None, None] + off[:, :, :, :, 0]   # [N, og, kH, kW, oH, oW]
    xs = base_x[None, None] + off[:, :, :, :, 1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    xp = jnp.transpose(x, (0, 2, 3, 1)).reshape(N, H, W, og, C // og)
    b_idx = jnp.arange(N, dtype=jnp.int32)[:, None, None, None, None, None]
    g_idx = jnp.arange(og, dtype=jnp.int32)[None, :, None, None, None, None]
    sampled = 0.0
    for dy, wy in ((0, 1.0 - ly), (1, ly)):
        for dx, wx in ((0, 1.0 - lx), (1, lx)):
            yi = y0.astype(jnp.int32) + dy
            xi = x0.astype(jnp.int32) + dx
            inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            v = xp[b_idx, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1),
                   g_idx]                      # [N,og,kH,kW,oH,oW,C//og]
            wgt = jnp.where(inb, wy * wx, 0.0)
            sampled = sampled + v * wgt[..., None]
    if mask is not None:
        sampled = sampled * mask.reshape(
            N, og, kH, kW, oH, oW)[..., None]
    # [N, og, kH, kW, oH, oW, C//og] -> [N, C, kH, kW, oH, oW]
    sampled = jnp.moveaxis(sampled, -1, 2).reshape(N, og * (C // og),
                                                   kH, kW, oH, oW)
    # grouped contraction: each output channel sees C/group input channels
    sg = sampled.reshape(N, group, C // group, kH, kW, oH, oW)
    wg = w.reshape(group, oC // group, wc, kH, kW)
    out = jnp.einsum("ngcijhw,gocij->ngohw", sg, wg,
                     precision=_HIGHEST).reshape(N, oC, oH, oW)
    if b is not None:
        out = out + jnp.asarray(b, jnp.float32)[None, :, None, None]
    return [out]


# ---------------------------------------------------------------------------
# Random family — deterministic under jax.random
# ---------------------------------------------------------------------------
#
# ONNX defines these as "arbitrary unless the seed attribute is set". XLA
# has no ambient RNG, so the lowering derives a jax.random key from the
# seed attr (or a fixed default when unseeded — a valid "arbitrary" that
# keeps whole-graph tracing pure and reproducible, which the SQL layer's
# volatility contract requires anyway).


def _rng_key(node):
    import jax

    seed = node.attr("seed")
    s = np.float64(seed) if seed is not None else np.float64(0.0)
    bits = np.uint64(s.view(np.uint64))
    # fold the full 64 seed bits (the low word of small-float bit patterns
    # is all zeros — masking alone would alias 3.0 and 4.0)
    folded = int(bits >> np.uint64(32)) ^ int(bits & np.uint64(0xFFFFFFFF))
    return jax.random.PRNGKey(folded & 0x7FFFFFFF)


def _rand_shape(node, inputs, ctx, like):
    if like:
        return jnp.asarray(inputs[0]).shape
    return tuple(int(v) for v in node.attr("shape"))


def _rand_dtype(node, default=1):
    return {1: jnp.float32, 11: jnp.float64,
            10: jnp.bfloat16}.get(int(node.attr("dtype", default)),
                                  jnp.float32)


def _random_normal(like):
    def impl(node, inputs, ctx):
        import jax

        shape = _rand_shape(node, inputs, ctx, like)
        mean = float(node.attr("mean", 0.0))
        scale = float(node.attr("scale", 1.0))
        v = jax.random.normal(_rng_key(node), shape) * scale + mean
        return [v.astype(_rand_dtype(node))]

    return impl


def _random_uniform(like):
    def impl(node, inputs, ctx):
        import jax

        shape = _rand_shape(node, inputs, ctx, like)
        low = float(node.attr("low", 0.0))
        high = float(node.attr("high", 1.0))
        v = jax.random.uniform(_rng_key(node), shape, minval=low, maxval=high)
        return [v.astype(_rand_dtype(node))]

    return impl


register("RandomNormal")(_random_normal(False))
register("RandomNormalLike")(_random_normal(True))
register("RandomUniform")(_random_uniform(False))
register("RandomUniformLike")(_random_uniform(True))


@register("Bernoulli")
def _bernoulli(node, inputs, ctx):
    import jax

    p = jnp.asarray(inputs[0], jnp.float32)
    u = jax.random.uniform(_rng_key(node), p.shape)
    return [(u < p).astype(_rand_dtype(node, default=0) if node.attr(
        "dtype") is not None else p.dtype)]


@register("Multinomial")
def _multinomial(node, inputs, ctx):
    import jax

    logits = jnp.asarray(inputs[0], jnp.float32)  # [batch, classes]
    n = int(node.attr("sample_size", 1))
    out_dtype = {6: jnp.int32, 7: jnp.int32}.get(
        int(node.attr("dtype", 6)), jnp.int32)
    keys = jax.random.split(_rng_key(node), n)
    cols = [jax.random.categorical(k, logits, axis=-1) for k in keys]
    return [jnp.stack(cols, axis=-1).astype(out_dtype)]
