"""GEMM group-by: segment reductions as one-hot matmuls on the MXU.

XLA lowers ``segment_sum``/``segment_min``/``segment_max`` to scatters —
the TPU's weak spot (round-3 profiling: ~8 ms per 1M-row scatter at 64
segments; the fused SQL plan's aggregate tail ran ~9 of them). For small
group counts the same reduction is a matmul: one-hot(keys) [chunk, G]
contracted against the value row — the exact trick that made the GEMM
tree forest ~370x the gather path (onnx/ml_ops.py). Rows stream through
a lax.scan so the [chunk, G] one-hot lives in VMEM only; sums ride the
MXU (f32 accumulate), min/max ride the VPU as masked chunk reductions.

Numerics: the one-hot entries are exact 0/1, products are exact f32, and
the MXU accumulates in f32 — the result rounds like any f32 summation
(callers needing better use sql/mesh_plan._compensated_segment_sum,
whose residual pass also routes here).

Used when G <= MAX_GEMM_GROUPS and the table is large enough that the
scan amortizes (the scatter path stays for big-G / small-N cases).
"""

from __future__ import annotations

MAX_GEMM_GROUPS = 512
MIN_GEMM_ROWS = 1 << 17
# chunk sized so the [chunk, G] one-hot stays a few MB of VMEM
_TARGET_ELEMS = 1 << 21


def eligible(n: int, G: int) -> bool:
    return G <= MAX_GEMM_GROUPS and n >= MIN_GEMM_ROWS


def _chunked(jnp, jax, keys, vals_rows, G: int):
    """Pad + reshape keys [N] and each [N] value row into [C, chunk]."""
    n = keys.shape[0]
    chunk = max(4096, min(1 << 14, _TARGET_ELEMS // max(G, 1)))
    c = -(-n // chunk)
    pad = c * chunk - n
    if pad:
        # padded keys get G — matches nothing in the one-hot compare
        keys = jnp.concatenate([keys, jnp.full(pad, G, keys.dtype)])
        vals_rows = [jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
                     for v in vals_rows]
    kc = keys.reshape(c, chunk)
    vc = [v.reshape(c, chunk) for v in vals_rows]
    return kc, vc


def segment_sum(jnp, jax, vals, keys, G: int):
    """Drop-in for jax.ops.segment_sum(vals, keys, num_segments=G) using
    one-hot matmuls; ``vals`` may be [N] or a list of [N] rows (shared
    one-hot per chunk — the multi-slot form is nearly free)."""
    single = not isinstance(vals, (list, tuple))
    rows = [vals] if single else list(vals)
    rows = [jnp.asarray(v, jnp.float32) for v in rows]
    kc, vc = _chunked(jnp, jax, jnp.asarray(keys, jnp.int32), rows, G)
    iota = jnp.arange(G, dtype=jnp.int32)
    S = len(rows)

    def body(acc, xs):
        k = xs[0]
        oh = (k[:, None] == iota[None, :]).astype(jnp.float32)
        vstack = jnp.stack(xs[1:], axis=0)  # [S, chunk]
        # HIGHEST: the MXU's DEFAULT precision truncates the VALUE rows to
        # bf16 (8-bit mantissa) before the contraction — measured ~1e-4
        # relative error on 1M-row grouped SUMs on real TPU hardware
        # (round-4 fix; the one-hot side is 0/1-exact either way, and CPU
        # test runs never see the truncation)
        return acc + jnp.dot(vstack, oh,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST), None

    acc0 = jnp.zeros((S, G), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (kc, *vc))
    outs = [acc[i] for i in range(S)]
    return outs[0] if single else outs


def segment_minmax(jnp, jax, vals, keys, G: int, masks=None):
    """Per-group (min, max) for each [N] value row via masked chunk
    reductions (no scatter). ``masks``: optional per-row [N] bool — rows
    where False are excluded (used for validity/WHERE masks)."""
    rows = [jnp.asarray(v, jnp.float32) for v in vals]
    if masks is None:
        masks = [None] * len(rows)
    mrows = [jnp.ones_like(rows[0], jnp.float32) if m is None
             else jnp.asarray(m, jnp.float32) for m in masks]
    kc, vc = _chunked(jnp, jax, jnp.asarray(keys, jnp.int32),
                      rows + mrows, G)
    iota = jnp.arange(G, dtype=jnp.int32)
    S = len(rows)

    def body(carry, xs):
        mns, mxs = carry
        k = xs[0]
        oh = k[:, None] == iota[None, :]
        new_mns, new_mxs = [], []
        for i in range(S):
            v = xs[1 + i]
            live = oh & (xs[1 + S + i][:, None] > 0)
            vm = jnp.where(live, v[:, None], jnp.inf)
            vx = jnp.where(live, v[:, None], -jnp.inf)
            new_mns.append(jnp.minimum(mns[i], vm.min(axis=0)))
            new_mxs.append(jnp.maximum(mxs[i], vx.max(axis=0)))
        return (tuple(new_mns), tuple(new_mxs)), None

    mn0 = tuple(jnp.full(G, jnp.inf, jnp.float32) for _ in range(S))
    mx0 = tuple(jnp.full(G, -jnp.inf, jnp.float32) for _ in range(S))
    (mns, mxs), _ = jax.lax.scan(body, (mn0, mx0), (kc, *vc))
    return list(mns), list(mxs)


def segment_minmax_int32(jnp, jax, k, keys, G: int, mask):
    """Exact per-group (min, max) of int32 values without scatters.

    f32 one-hot reductions round above 2^24, so the value splits into
    f32-exact halves (arithmetic-shift hi, unsigned lo) and min/max
    resolve lexicographically: extreme of hi in one chunk scan, then the
    extreme of lo among rows whose hi attained it (second scan, masked
    through a [G]→[N] gather). Two scans total for both directions."""
    k = jnp.asarray(k, jnp.int32)
    hi = jnp.right_shift(k, 16).astype(jnp.float32)          # [-2^15, 2^15)
    lo = jnp.bitwise_and(k, 0xFFFF).astype(jnp.float32)      # [0, 2^16)
    m = jnp.asarray(mask, bool)
    (hi_mns, ), (hi_mxs, ) = segment_minmax(jnp, jax, [hi], keys, G, [m])
    at_mn = m & (hi == hi_mns[keys])
    at_mx = m & (hi == hi_mxs[keys])
    (lo_mn, lo_mn2), (lo_mx2, lo_mx) = segment_minmax(
        jnp, jax, [lo, lo], keys, G, [at_mn, at_mx])
    del lo_mn2, lo_mx2

    def _join(h, lw, empty):
        v = (h.astype(jnp.int32) << 16) | lw.astype(jnp.int32)
        ok = jnp.isfinite(h) & jnp.isfinite(lw)
        return jnp.where(ok, v, empty)

    big = jnp.int32(2**31 - 1)
    return (_join(hi_mns, lo_mn, big), _join(hi_mxs, lo_mx, -big - 1))


def segment_sum_int_exact(jnp, jax, rows, keys, G: int):
    """Exact integer segment sums via per-chunk f32 one-hot matmuls.

    Caller guarantees per-chunk per-group sum stays below 2^24 (true for
    8-bit limb rows at the <= 2^14 chunk the one-hot sizing picks): the
    chunk partial is then an exactly-representable f32 integer, and the
    cross-chunk accumulator is int32. Returns int32 [G] per row."""
    rows = [jnp.asarray(v, jnp.float32) for v in rows]
    kc, vc = _chunked(jnp, jax, jnp.asarray(keys, jnp.int32), rows, G)
    iota = jnp.arange(G, dtype=jnp.int32)
    S = len(rows)

    def body(acc, xs):
        k = xs[0]
        oh = (k[:, None] == iota[None, :]).astype(jnp.float32)
        vstack = jnp.stack(xs[1:], axis=0)
        part = jnp.dot(vstack, oh, preferred_element_type=jnp.float32)
        return acc + part.astype(jnp.int32), None

    acc0 = jnp.zeros((S, G), jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, (kc, *vc))
    return [acc[i] for i in range(S)]


def segment_lex_minmax(jnp, jax, lo_b, hi, keys, G: int, mask,
                       is_min: bool):
    """Exact int64 per-group extreme as (hi, lo-biased) int32 words,
    scatter-free: the hi word reduces through the int32 hi/lo16 split,
    then the biased lo word reduces among rows whose hi attained it."""
    import numpy as np

    INT32_MIN = np.int32(-(1 << 31))
    INT32_MAX = np.int32((1 << 31) - 1)
    hi_mn, hi_mx = segment_minmax_int32(jnp, jax, hi, keys, G, mask)
    sel_hi = hi_mn if is_min else hi_mx
    at_sel = mask & (hi == sel_hi[keys])
    lo_mn, lo_mx = segment_minmax_int32(jnp, jax, lo_b, keys, G, at_sel)
    # empty groups resolve naturally: both reductions return the same
    # INT32_MAX / INT32_MIN identities the scatter path produces
    del INT32_MIN, INT32_MAX
    return sel_hi, (lo_mn if is_min else lo_mx)


def segment_count_matrix(jnp, jax, keys, vals, G: int, V: int, ok):
    """[G, V] co-occurrence counts without a 2-D scatter: per chunk the
    count matrix is onehot(keys)^T @ onehot(vals) — one MXU contraction —
    accumulated in f32 (exact: cells are integer counts <= n < 2^24 under
    the fused plans' row bounds). Feeds DISTINCT presence (counts > 0)
    and the MODE count matrix. ``ok`` masks rows out of both one-hots."""
    n = keys.shape[0]
    chunk = max(1024, min(1 << 13, _TARGET_ELEMS // max(G + V, 1)))
    c = -(-n // chunk)
    pad = c * chunk - n
    keys = jnp.asarray(keys, jnp.int32)
    vals = jnp.asarray(vals, jnp.int32)
    okf = jnp.asarray(ok, jnp.float32)
    if pad:
        keys = jnp.concatenate([keys, jnp.full(pad, G, keys.dtype)])
        vals = jnp.concatenate([vals, jnp.full(pad, V, vals.dtype)])
        okf = jnp.concatenate([okf, jnp.zeros(pad, jnp.float32)])
    kc = keys.reshape(c, chunk)
    vc = vals.reshape(c, chunk)
    oc = okf.reshape(c, chunk)
    iota_g = jnp.arange(G, dtype=jnp.int32)
    iota_v = jnp.arange(V, dtype=jnp.int32)

    def body(acc, xs):
        k, v, o = xs
        ohk = (k[:, None] == iota_g[None, :]).astype(jnp.float32) \
            * o[:, None]
        ohv = (v[:, None] == iota_v[None, :]).astype(jnp.float32)
        return acc + jnp.dot(ohk.T, ohv,
                             preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((G, V), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (kc, vc, oc))
    return acc
