"""Pallas lowering of fused SQL plans (the ``device_plan_pallas`` path).

VERDICT r3 item 1: the SQL surface ran its flagship query class (predict →
filter → group aggregate) through XLA at 19.5 ms while the columnar Pallas
kernel did the same shape in 0.651 ms (BENCH_r03 — a 30x gap), because the
XLA aggregate tail is scatter-bound on TPU. This module closes that gap for
the SQL engine itself: ``sql/device_plan``'s expression closures execute
INSIDE one Pallas grid pass over feature-major column tiles —

1. the used columns upload once as a stacked [n_cols, N] f32 block
   (feature-major IS the engine's columnar storage layout);
2. per tile, the WHERE predicate, group keys, and every aggregate input
   evaluate on VMEM-resident [1, tile] rows; ``infera_predict`` runs as an
   in-kernel MXU MLP (f32 HIGHEST for parity — matmul-class results are
   pinned to 1e-5) whose inter-layer activations never touch HBM;
3. the group-by tail accumulates into VMEM-resident [G, 128] lane
   accumulators via one-hot VPU reductions — zero scatters — with
   cross-tile Kahan compensation on every sum so the f64 host fold matches
   the XLA path's compensated pairs;
4. only the tiny group table leaves the chip (the tunnel's readback costs
   ~1 MB/s, so the fold to [G] happens in a second small jit — the
   pallas_call stays in its OWN jit per the platform's Mosaic-compose
   quirk, CLAUDE.md).

Reference hot path replaced: /root/reference/infera/bindings/
infera_extension.cpp:260-286 (per-chunk Predict + DuckDB's hash aggregate).

Collision/fractional/int-exactness guards mirror sql/device_plan.py: raw
key min/max per bucket and a fractional-value flag travel with the result;
an in-kernel magnitude flag (|key| >= 2^24, the f32 int-exactness bound)
forces fallback to the XLA program before f32 rounding could mask a
collision.
"""

from __future__ import annotations

import functools
import os

import numpy as np

PALLAS_MAX_GROUPS = 512
PALLAS_MAX_COLS = 64
PALLAS_MAX_WEIGHT_BYTES = 4 << 20
_F32_EXACT = float(1 << 24)
_BIG = float(1 << 30)


def pallas_sql_mode() -> str:
    """INFERA_PALLAS_SQL: "1" force (interpret mode off-TPU — the test
    suite's correctness hook), "0" disable, unset/auto → TPU only."""
    v = os.environ.get("INFERA_PALLAS_SQL", "auto")
    return v if v in ("0", "1") else "auto"


def pick_tile(n_groups: int) -> int:
    # bound the [G, tile] one-hot working set to ~4 MB of VMEM f32.
    # G is capped at 512: a G=1800/tile=512 probe OOM'd Mosaic's 16 MB
    # scoped vmem (36.9 MB stack) on-chip — the accumulator buffers plus
    # the [G, tile] masked broadcasts scale with G, so bigger groups ride
    # the XLA program's GEMM group-by instead.
    return 2048 if n_groups > 256 else 4096


def _kernel(body, n_weights, n_outs, x_ref, *refs):
    w_vals = [refs[i][:] for i in range(n_weights)]
    out_refs = refs[n_weights:n_weights + n_outs]
    body(x_ref, w_vals, out_refs)


def build_fused_plan_call(*, col_keys, weights, where_fn, key_fns, strides,
                          n_groups, sum_fns, min_fns, max_fns, n_valid,
                          n_pad, tile, interpret, dist_fns=(),
                          arg_specs=(), lex_specs=()):
    """Build the jitted pallas_call for one fused plan.

    Closures (where_fn/key_fns/sum_fns/min_fns/max_fns) take a dict mapping
    column key → [1, tile] f32 row (plus "__weights__" → list of
    VMEM-resident weight arrays and "__zeros__" → a [1, tile] zero row for
    scalar broadcasting) and return [1, tile] arrays (or scalars).

    Output buffers (lane accumulators, folded later by build_fold_call):
      sumbuf/compbuf [(1+S)*G, 128]  — Kahan (sum, comp) pairs; row block 0
                                       is the selected-row count
      minbuf [(M+K)*G, 128]          — min slots then per-key raw minima
      maxbuf [(X+K)*G, 128]          — max slots then per-key raw maxima
      flagbuf [K+1+D, 128]           — per-key fractional flags, the
                                       |key| >= 2^24 magnitude flag, then
                                       one invalid flag per DISTINCT slot
      presbuf [sum(banks)*G, 128]    — DISTINCT presence counts: value
                                       index rides the LANES (128 values
                                       per bank), built by one one-hot
                                       MXU matmul per (tile, bank) — zero
                                       scatters, zero transposes
                                       (VERDICT r4 item 2)

    ``dist_fns``: [(fn, v_domain), ...] — COUNT/SUM/AVG(DISTINCT expr)
    AND MODE slots over probed integer domains (v_domain <= 512 = 4
    banks); both accumulate the same per-(group, value) count matrix —
    the fold decides (presence reduction vs unique-max selection).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = int(n_groups)
    S, M, X, K = len(sum_fns), len(min_fns), len(max_fns), len(key_fns)
    D = len(dist_fns)
    AG = len(arg_specs)
    LX = len(lex_specs)
    bank_list = [(int(v) + 127) // 128 for _fn, v, *_k in dist_fns]
    banks_total = sum(bank_list)
    n_cols = len(col_keys)
    rows_sum = (1 + S) * G
    rows_min = max((M + K) * G, 8)
    rows_max = max((X + K) * G, 8)
    rows_flag = K + 1 + D
    rows_pres = max(banks_total * G, 8)
    rows_arg = max(AG * G, 8)
    rows_lex = max(4 * LX * G, 8)

    def _row(v, zeros):
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 0:
            return v.reshape(1, 1) + zeros
        return v

    def body(x_ref, w_vals, out_refs):
        (sum_ref, comp_ref, min_ref, max_ref, flag_ref, pres_ref,
         args_ref, argr_ref, lex_ref) = out_refs

        @pl.when(pl.program_id(0) == 0)
        def _():
            sum_ref[:] = jnp.zeros_like(sum_ref)
            comp_ref[:] = jnp.zeros_like(comp_ref)
            min_ref[:] = jnp.full_like(min_ref, _BIG)
            max_ref[:] = jnp.full_like(max_ref, -_BIG)
            flag_ref[:] = jnp.zeros_like(flag_ref)
            pres_ref[:] = jnp.zeros_like(pres_ref)
            for ai_, (_f, is_min_) in enumerate(arg_specs):
                args_ref[ai_ * G:(ai_ + 1) * G, :] = jnp.full(
                    (G, 128), _BIG if is_min_ else -_BIG, jnp.float32)
            if AG:
                argr_ref[:] = jnp.full_like(argr_ref, _BIG)
            else:
                argr_ref[:] = jnp.zeros_like(argr_ref)
            for li_, (_bk, lex_min_) in enumerate(lex_specs):
                lex_ref[4 * li_ * G:4 * (li_ + 1) * G, :] = jnp.full(
                    (4 * G, 128),
                    float(1 << 17) if lex_min_ else -1.0, jnp.float32)

        zeros = jnp.zeros((1, tile), jnp.float32)
        cols = {k: x_ref[i:i + 1, :] for i, k in enumerate(col_keys)}
        cols["__weights__"] = w_vals
        cols["__zeros__"] = zeros

        base = pl.program_id(0) * tile
        ridx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + base
        mask = ridx < n_valid
        if where_fn is not None:
            mask = mask & jnp.asarray(_row(where_fn(cols), zeros), bool)

        if key_fns:
            raws = [_row(kf(cols), zeros) for kf in key_fns]
            combined = jnp.zeros((1, tile), jnp.int32)
            for r, stride in zip(raws, strides):
                combined = combined + r.astype(jnp.int32) * np.int32(
                    stride & 0x7FFFFFFF)
            keys = jnp.mod(combined, G)
        else:
            raws = []
            keys = jnp.zeros((1, tile), jnp.int32)

        onehot = (jax.lax.broadcasted_iota(jnp.int32, (G, tile), 0)
                  == keys) & mask                       # [G, tile] bool
        oh = onehot.astype(jnp.float32)

        # pin: routes the Kahan error terms through a select on a runtime
        # predicate so interpret mode (XLA) cannot algebraically cancel the
        # compensation (see mesh_plan._opaque_pin); Mosaic never rewrites
        # float algebra, so on hardware this is a free select. The predicate
        # is a LOAD (flag values are always >= 0) — program_id comparisons
        # constant-fold during interpret-mode unrolling. Shape [1, 128]:
        # Mosaic supports sublane-only broadcasts, not sublane+lane.
        pred = flag_ref[K:K + 1, :] >= jnp.float32(0.0)

        def pin(x):
            return jnp.where(pred, x, jnp.float32(0.0))

        def kahan_accum(ref, cref, lo, a):
            """Neumaier-accumulate a [G, tile] summand into the [G, 128]
            lane accumulator, one 128-lane strip at a time. Each strip add
            carries its exact two-sum error into c, with the error branch
            picked by |s| vs |y| (plain Kahan's fast-two-sum assumes
            |s| >= |y| and loses low bits while the accumulator is still
            small — measured ±16 on a 8e9-magnitude cancellation column).
            The f64 host fold of (s, c) then recovers the grouped sum to
            ~f64 precision, matching the XLA path's compensated pairs."""
            s = ref[lo:lo + G, :]
            c = cref[lo:lo + G, :]
            ar = a.reshape(G, tile // 128, 128)
            for k in range(tile // 128):
                y = ar[:, k, :]
                t = pin(s + y)
                e = jnp.where(jnp.abs(s) >= jnp.abs(y),
                              (s - t) + y, (y - t) + s)
                c = c + e
                s = t
            ref[lo:lo + G, :] = s
            cref[lo:lo + G, :] = c

        kahan_accum(sum_ref, comp_ref, 0, oh)           # selected-row count
        for si, fn in enumerate(sum_fns):
            v = _row(fn(cols), zeros)
            kahan_accum(sum_ref, comp_ref, (1 + si) * G, oh * v)

        def lane_min(a):
            return jnp.min(a.reshape(G, tile // 128, 128), axis=1)

        def lane_max(a):
            return jnp.max(a.reshape(G, tile // 128, 128), axis=1)

        for mi, fn in enumerate(min_fns):
            v = _row(fn(cols), zeros)
            masked = jnp.where(onehot, jnp.broadcast_to(v, (G, tile)), _BIG)
            lo = mi * G
            min_ref[lo:lo + G, :] = jnp.minimum(min_ref[lo:lo + G, :],
                                                lane_min(masked))
        for xi, fn in enumerate(max_fns):
            v = _row(fn(cols), zeros)
            masked = jnp.where(onehot, jnp.broadcast_to(v, (G, tile)), -_BIG)
            lo = xi * G
            max_ref[lo:lo + G, :] = jnp.maximum(max_ref[lo:lo + G, :],
                                                lane_max(masked))

        big_row = jnp.zeros((1, tile), jnp.float32)
        for ki, r in enumerate(raws):
            ri = r.astype(jnp.int32)
            rt = ri.astype(jnp.float32)
            # collision-guard payload: per-bucket raw-key min/max (exact in
            # f32 — the magnitude flag below forces fallback past 2^24)
            masked_min = jnp.where(onehot, jnp.broadcast_to(rt, (G, tile)),
                                   _BIG)
            masked_max = jnp.where(onehot, jnp.broadcast_to(rt, (G, tile)),
                                   -_BIG)
            lo = (M + ki) * G
            min_ref[lo:lo + G, :] = jnp.minimum(min_ref[lo:lo + G, :],
                                                lane_min(masked_min))
            lo = (X + ki) * G
            max_ref[lo:lo + G, :] = jnp.maximum(max_ref[lo:lo + G, :],
                                                lane_max(masked_max))
            frac = (mask & (r != rt)).astype(jnp.float32)
            flag_ref[ki:ki + 1, :] = jnp.maximum(
                flag_ref[ki:ki + 1, :],
                jnp.max(frac.reshape(1, tile // 128, 128), axis=1))
            big_row = jnp.maximum(
                big_row, (mask & (jnp.abs(r) >= _F32_EXACT)).astype(
                    jnp.float32))
        flag_ref[K:K + 1, :] = jnp.maximum(
            flag_ref[K:K + 1, :],
            jnp.max(big_row.reshape(1, tile // 128, 128), axis=1))

        # DISTINCT presence: per slot, per 128-value bank, ONE MXU matmul
        # onehot_g[G, tile] x onehot_v[128, tile]^T -> per-(group, value)
        # counts summed across tiles (exact in f32: total <= n < 2^24);
        # the fold reduces presence = counts > 0 to dcount/dsum limbs.
        row_off = 0
        for di, (dfn, v_dom, *_k) in enumerate(dist_fns):
            v = _row(dfn(cols), zeros)
            vt = jnp.trunc(v)
            okv = (v == vt) & (v >= 0.0) & (v < jnp.float32(v_dom))
            badv = (mask & jnp.logical_not(okv)).astype(jnp.float32)
            fr = K + 1 + di
            flag_ref[fr:fr + 1, :] = jnp.maximum(
                flag_ref[fr:fr + 1, :],
                jnp.max(badv.reshape(1, tile // 128, 128), axis=1))
            ohd = (onehot & okv).astype(jnp.float32)      # [G, tile]
            vb = jnp.broadcast_to(vt, (128, tile))
            # tpu.iota is integer-only — build int32 then widen
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (128, tile), 0).astype(jnp.float32)
            for b in range(bank_list[di]):
                ohv = jnp.where(vb == lane + jnp.float32(b * 128),
                                jnp.float32(1.0), jnp.float32(0.0))
                counts = jax.lax.dot_general(
                    ohd, ohv, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                lo = (row_off + b) * G
                pres_ref[lo:lo + G, :] = pres_ref[lo:lo + G, :] + counts
            row_off += bank_list[di]

        # arg_min/arg_max (round 5): lexicographic (value, rowid)
        # accumulators — the winning ROW ID per group, first-occurrence
        # tie-break, matching the XLA slots' semantics. NaN values map to
        # +BIG (the f32-bitcast sortable order puts NaN above +inf, so
        # NaN never wins MIN and does win MAX, like the XLA skey).
        ridf = ridx.astype(jnp.float32)
        for ai_, (afn, is_min_) in enumerate(arg_specs):
            v = _row(afn(cols), zeros)
            v = jnp.where(v != v, jnp.float32(_BIG), v)
            fill = jnp.float32(_BIG if is_min_ else -_BIG)
            s_full = jnp.where(onehot, jnp.broadcast_to(v, (G, tile)),
                               fill)
            s_arr = s_full.reshape(G, tile // 128, 128)
            red = jnp.min if is_min_ else jnp.max
            s_strip = red(s_arr, axis=1)                 # [G, 128]
            r_full = jnp.broadcast_to(ridf, (G, tile)).reshape(
                G, tile // 128, 128)
            r_strip = jnp.min(jnp.where(
                s_arr == s_strip[:, None, :], r_full,
                jnp.float32(_BIG)), axis=1)              # [G, 128]
            lo = ai_ * G
            s_acc = args_ref[lo:lo + G, :]
            r_acc = argr_ref[lo:lo + G, :]
            better = (s_strip < s_acc) if is_min_ else (s_strip > s_acc)
            eq = s_strip == s_acc
            args_ref[lo:lo + G, :] = jnp.where(better, s_strip, s_acc)
            argr_ref[lo:lo + G, :] = jnp.where(
                better, r_strip,
                jnp.where(eq, jnp.minimum(r_acc, r_strip), r_acc))

        # exact int64 MIN/MAX (round 5): lexicographic cascade over the
        # four 16-bit words of the sign-biased value (each word f32-exact)
        # built from the column's byte-limb block rows. Strip reduction
        # cascades word-by-word (masking to rows attaining the prefix
        # extreme), then merges into 4 [G, 128] accumulators with a
        # lexicographic better/equal chain.
        for li_, (bkeys, lex_min_) in enumerate(lex_specs):
            b = [cols[k] for k in bkeys]  # b0..b7 byte rows [1, tile]
            b7x = jnp.where(b[7] >= 128.0, b[7] - 128.0, b[7] + 128.0)
            words = [b7x * 256.0 + b[6], b[5] * 256.0 + b[4],
                     b[3] * 256.0 + b[2], b[1] * 256.0 + b[0]]
            fillw = jnp.float32((1 << 17) if lex_min_ else -1.0)
            red = jnp.min if lex_min_ else jnp.max
            strips = []
            sel_mask = None
            w_arrs = []
            for wv in words:
                w_full = jnp.where(onehot, jnp.broadcast_to(wv, (G, tile)),
                                   fillw)
                w_arr = w_full.reshape(G, tile // 128, 128)
                if sel_mask is not None:
                    w_arr = jnp.where(sel_mask, w_arr, fillw)
                w_strip = red(w_arr, axis=1)
                upd = w_arr == w_strip[:, None, :]
                sel_mask = upd if sel_mask is None else (sel_mask & upd)
                strips.append(w_strip)
                w_arrs.append(w_arr)
            base_l = 4 * li_ * G
            accs = [lex_ref[base_l + j * G:base_l + (j + 1) * G, :]
                    for j in range(4)]
            eq_c = None
            better = None
            for j in range(4):
                cmp_j = (strips[j] < accs[j]) if lex_min_                     else (strips[j] > accs[j])
                eq_j = strips[j] == accs[j]
                bj = cmp_j if eq_c is None else (eq_c & cmp_j)
                better = bj if better is None else (better | bj)
                eq_c = eq_j if eq_c is None else (eq_c & eq_j)
            for j in range(4):
                lex_ref[base_l + j * G:base_l + (j + 1) * G, :] =                     jnp.where(better, strips[j], accs[j])

    weight_specs = [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                                 memory_space=pltpu.VMEM) for w in weights]
    out_specs = [
        pl.BlockSpec((rows_sum, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_sum, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_min, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_max, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_flag, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_pres, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_arg, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_arg, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_lex, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows_sum, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows_sum, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows_min, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows_max, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows_flag, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows_pres, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows_arg, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows_arg, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows_lex, 128), jnp.float32),
    ]

    call = pl.pallas_call(
        functools.partial(_kernel, body, len(weights), len(out_shape)),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((n_cols, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * sum(int(np.prod(w.shape)) for w in weights),
            bytes_accessed=n_pad * n_cols * 4, transcendentals=0),
        interpret=interpret,
    )
    import jax as _jax

    return _jax.jit(lambda xc, *ws: call(xc, *ws))


def _two_sum(jnp, a, b, pin):
    s = pin(a + b)
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


@functools.lru_cache(maxsize=32)
def _fold_call(rows_sum, rows_min, rows_max, rows_flag, dist_shape=(),
               arg_shape=(), lex_shape=()):
    """Second (plain-XLA, pallas-free) jit: fold the 128 lane columns of
    each accumulator down to scalars per group slot. Sums fold through a
    compensation-carrying pairwise tree (f32 pair out; the final f64 fold
    happens host-side), min/max fold exactly; flags OR-fold; presence
    banks reduce to (dcount, dsum_lo7, dsum_hi) per DISTINCT slot (the
    int_agg.presence_reduce 7-bit split, lanes = value index). One jit per
    buffer geometry, one small device→host transfer for everything.

    ``dist_shape``: ((banks, v_dom, G), ...) static per-slot geometry.
    ``arg_shape``: ((is_min, G), ...) — arg_min/arg_max slots fold to the
    winning row id: lane extreme of the value accumulator, then the min
    row id among lanes attaining it (first-occurrence tie-break)."""
    import jax
    import jax.numpy as jnp

    def fold(sumbuf, compbuf, minbuf, maxbuf, flagbuf, presbuf,
             argsbuf, argrbuf, lexbuf):
        pred = flagbuf[0, 0] > -1.0  # runtime-true: pins the error terms
        # against XLA's algebraic simplifier (see mesh_plan._opaque_pin)

        def pin(x):
            return jnp.where(pred, x, jnp.float32(0.0))

        s, c = sumbuf, compbuf
        while s.shape[-1] > 1:
            h = s.shape[-1] // 2
            t, e = _two_sum(jnp, s[..., :h], s[..., h:], pin)
            s = t
            c = c[..., :h] + c[..., h:] + e
        dcounts, dlos, dhis = [], [], []
        row_off = 0
        for banks, v_dom, G, kind in dist_shape:
            lane = jnp.arange(128, dtype=jnp.int32)
            if kind == "mode":
                # unique-max selection over the count matrix: the mode's
                # value when exactly ONE value attains the max count per
                # group; a tie raises the per-group flag (host fallback
                # keeps the first-occurrence tie-break semantics)
                mcount = jnp.full((G,), -1.0, jnp.float32)
                for b in range(banks):
                    lo = (row_off + b) * G
                    mcount = jnp.maximum(
                        mcount, jnp.max(presbuf[lo:lo + G, :], axis=1))
                n_at = jnp.zeros((G,), jnp.float32)
                mval = jnp.zeros((G,), jnp.float32)
                for b in range(banks):
                    lo = (row_off + b) * G
                    cb = presbuf[lo:lo + G, :]
                    at = (cb == mcount[:, None]).astype(jnp.float32)
                    n_at = n_at + jnp.sum(at, axis=1)
                    val = (lane + jnp.int32(b * 128)).astype(jnp.float32)
                    mval = mval + jnp.sum(at * val[None, :], axis=1)
                row_off += banks
                dcounts.append(mcount)
                dlos.append(mval)       # value (valid when n_at == 1)
                dhis.append(n_at)       # tie count
                continue
            dc = jnp.zeros((G,), jnp.float32)
            dl = jnp.zeros((G,), jnp.float32)
            dh = jnp.zeros((G,), jnp.float32)
            for b in range(banks):
                lo = (row_off + b) * G
                pres = (presbuf[lo:lo + G, :] > 0).astype(jnp.float32)
                val = lane + jnp.int32(b * 128)
                lo7 = jnp.bitwise_and(val, 0x7F).astype(jnp.float32)
                hi7 = jnp.right_shift(val, 7).astype(jnp.float32)
                dc = dc + jnp.sum(pres, axis=1)
                dl = dl + jnp.sum(pres * lo7[None, :], axis=1)
                dh = dh + jnp.sum(pres * hi7[None, :], axis=1)
            row_off += banks
            dcounts.append(dc)
            dlos.append(dl)
            dhis.append(dh)
        lex_words = []
        for li_, (lex_min_, G) in enumerate(lex_shape):
            base_l = 4 * li_ * G
            red = jnp.min if lex_min_ else jnp.max
            fillw = jnp.float32((1 << 17) if lex_min_ else -1.0)
            sel = None
            outw = []
            for j in range(4):
                wb = lexbuf[base_l + j * G:base_l + (j + 1) * G, :]
                if sel is not None:
                    wb = jnp.where(sel, wb, fillw)
                w_g = red(wb, axis=1)
                upd = wb == w_g[:, None]
                sel = upd if sel is None else (sel & upd)
                outw.append(w_g)
            lex_words.append(outw)
        arg_rids = []
        for ai_, (is_min_, G) in enumerate(arg_shape):
            sb = argsbuf[ai_ * G:(ai_ + 1) * G, :]
            rb = argrbuf[ai_ * G:(ai_ + 1) * G, :]
            s_g = (jnp.min if is_min_ else jnp.max)(sb, axis=1)
            r_g = jnp.min(jnp.where(sb == s_g[:, None], rb,
                                    jnp.float32(_BIG)), axis=1)
            arg_rids.append(r_g)
        return (s[..., 0], c[..., 0], jnp.min(minbuf, axis=1),
                jnp.max(maxbuf, axis=1), jnp.max(flagbuf, axis=1),
                dcounts, dlos, dhis, arg_rids, lex_words)

    return jax.jit(fold)


def execute_fused_plan(conn, *, plan_key, col_arrays, col_keys, weights,
                       where_fn, key_fns, strides, n_groups, sum_fns,
                       min_fns, max_fns, n, interpret, dist_fns=(),
                       arg_specs=(), lex_specs=(), xc_dev=None):
    """Upload (cached), run the kernel jit + fold jit, return host arrays:

    dict(count [G], sums [(s, c) f32 pairs per slot], mins [M][G],
         maxs [X][G], kmins/kmaxs [K][G] f32, fracs [K] bool,
         dcounts/dlos/dhis [D][G], dbads [D] bool)
    or None on any failure (caller falls back to the XLA program).
    """
    import jax
    import jax.numpy as jnp

    G = int(n_groups)
    tile = pick_tile(G)
    S, M, X, K = len(sum_fns), len(min_fns), len(max_fns), len(key_fns)
    D = len(dist_fns)
    dist_shape = tuple(
        ((int(v) + 127) // 128, int(v), G,
         rest[0] if rest else "dist")
        for _fn, v, *rest in dist_fns)
    arg_shape = tuple((bool(m), G) for _fn, m in arg_specs)
    lex_shape = tuple((bool(m), G) for _bk, m in lex_specs)

    if xc_dev is not None:
        # per-query view of the shared per-connection table block
        # (sql/device_plan.get_table_block) — zero host transfer
        xc = xc_dev
        n_pad = int(xc.shape[1])
    else:
        n_pad = -(-n // tile) * tile
        # stacked feature-major block, cached per (column identities, pad)
        xc_cache = getattr(conn, "_pallas_xc_cache", None)
        if xc_cache is None:
            xc_cache = {}
            conn._pallas_xc_cache = xc_cache
        xc_key = (tuple(id(a) for a in col_arrays), n_pad)
        cached_xc = xc_cache.get(xc_key)
        if cached_xc is None:
            host = np.zeros((len(col_arrays), n_pad), np.float32)
            for i, a in enumerate(col_arrays):
                host[i, :n] = np.asarray(a, np.float32)
            xc = jnp.asarray(host)
            if len(xc_cache) >= 8:
                xc_cache.pop(next(iter(xc_cache)))
            # the VALUE pins the source arrays: id()-keyed entries would
            # otherwise serve a stale block after allocator id reuse
            xc_cache[xc_key] = (tuple(col_arrays), xc)
        else:
            xc = cached_xc[1]

    cache = getattr(conn, "_device_plan_cache", None)
    if cache is None:
        cache = {}
        conn._device_plan_cache = cache
    # Composed mode (default): ONE jit wraps the pallas_call + the lane
    # fold — a single dispatch round-trip per query (measured 28.6 vs
    # 33 ms split on the tunnel; one fewer launch anywhere). The remote
    # Mosaic compiler has historically stalled on pallas-composed
    # programs (CLAUDE.md); INFERA_PALLAS_SQL_SPLIT=1 reverts to two
    # jits if a deployment hits that.
    split = os.environ.get("INFERA_PALLAS_SQL_SPLIT") == "1"
    rows_sum = (1 + S) * G
    rows_min = max((M + K) * G, 8)
    rows_max = max((X + K) * G, 8)
    full_key = ("pallas", plan_key, tile, split, n_pad)
    # a plan whose kernel failed once (e.g. a Mosaic compile rejection at
    # this geometry) must NOT re-pay the failing compile on every
    # execution — the round-5 TPU session measured 14 s/query re-failing
    # at G=1800. Blacklist by plan key; the XLA program serves instead.
    failed = getattr(conn, "_pallas_failed_plans", None)
    if failed is None:
        failed = set()
        conn._pallas_failed_plans = failed
    if full_key in failed:
        return None
    compiled = cache.get(full_key)
    if compiled is None:
        kernel = build_fused_plan_call(
            col_keys=col_keys, weights=weights, where_fn=where_fn,
            key_fns=key_fns, strides=strides, n_groups=G, sum_fns=sum_fns,
            min_fns=min_fns, max_fns=max_fns, n_valid=n, n_pad=n_pad,
            tile=tile, interpret=interpret, dist_fns=dist_fns,
            arg_specs=arg_specs, lex_specs=lex_specs)
        if split:
            compiled = kernel
        else:
            fold0 = _fold_call(rows_sum, rows_min, rows_max, K + 1 + D,
                               dist_shape, arg_shape, lex_shape)
            compiled = jax.jit(lambda xcx, *ws: fold0(*kernel(xcx, *ws)))
        if len(cache) >= 16:
            cache.pop(next(iter(cache)))
        cache[full_key] = compiled

    w_dev = [jnp.asarray(w) for w in weights]
    try:
        if split:
            bufs = compiled(xc, *w_dev)
            fold = _fold_call(rows_sum, rows_min, rows_max, K + 1 + D,
                              dist_shape, arg_shape, lex_shape)
            (s_f, c_f, min_f, max_f, flag_f, dc_f, dl_f, dh_f, ar_f,
             lx_f) = jax.device_get(fold(*bufs))
        else:
            (s_f, c_f, min_f, max_f, flag_f, dc_f, dl_f, dh_f, ar_f,
             lx_f) = jax.device_get(compiled(xc, *w_dev))
    except Exception:
        failed.add(full_key)
        if len(failed) > 64:
            failed.pop()
        return None

    if float(flag_f[K]) > 0.0:
        return None  # |key| beyond f32 int-exactness → XLA program
    out = {
        "count": np.asarray(s_f[:G], np.float64)
        + np.asarray(c_f[:G], np.float64),
        "sums": [(s_f[(1 + i) * G:(2 + i) * G], c_f[(1 + i) * G:(2 + i) * G])
                 for i in range(S)],
        "mins": [min_f[i * G:(i + 1) * G] for i in range(M)],
        "maxs": [max_f[i * G:(i + 1) * G] for i in range(X)],
        "kmins": [min_f[(M + i) * G:(M + i + 1) * G] for i in range(K)],
        "kmaxs": [max_f[(X + i) * G:(X + i + 1) * G] for i in range(K)],
        "fracs": [bool(flag_f[i] > 0.0) for i in range(K)],
        "dcounts": [np.asarray(dc_f[i]) for i in range(D)],
        "dlos": [np.asarray(dl_f[i]) for i in range(D)],
        "dhis": [np.asarray(dh_f[i]) for i in range(D)],
        "dbads": [bool(flag_f[K + 1 + i] > 0.0) for i in range(D)],
        "argrids": [np.asarray(ar_f[i]) for i in range(len(arg_specs))],
        "lexwords": [[np.asarray(w) for w in lx_f[i]]
                     for i in range(len(lex_specs))],
    }
    return out


def execute_fused_join_plan(conn, *, plan_key, col_keys, fact_cols,
                            dim_cols, lookup, fact_key_name, kmax_dim,
                            weights, where_fn, key_fns, strides, n_groups,
                            sum_fns, min_fns, max_fns, n, interpret,
                            fact_block=None):
    """Pallas lowering for the fact→dimension join plans (BASELINE config
    3): ONE composed jit runs the XLA join prologue (dense key lookup +
    dim-column gathers), stacks the feature-major block ON DEVICE, and
    feeds the same columnar kernel the single-table plans use — the
    joined relation never exists, and the whole query is one dispatch.

    - ``col_keys``: kernel row order; names resolve against ``fact_cols``
      (host Columns), ``dim_cols`` ("__dim__."-prefixed host Columns), or
      the literal "__matched__" row the prologue computes.
    - INNER joins only: the caller folds ``__matched__`` into where_fn.
    Returns the same host dict as execute_fused_plan, or None.
    """
    import jax
    import jax.numpy as jnp

    G = int(n_groups)
    tile = pick_tile(G)
    n_pad = -(-n // tile) * tile
    S, M, X, K = len(sum_fns), len(min_fns), len(max_fns), len(key_fns)
    rows_sum = (1 + S) * G
    rows_min = max((M + K) * G, 8)
    rows_max = max((X + K) * G, 8)

    fact_names = sorted(fact_cols)
    dim_names = sorted(dim_cols)
    nf = len(fact_names)

    cache = getattr(conn, "_device_plan_cache", None)
    if cache is None:
        cache = {}
        conn._device_plan_cache = cache
    # INFERA_PALLAS_SQL_SPLIT=1 keeps the pallas_call in its own jit (the
    # remote Mosaic compose-stall escape hatch — same contract as
    # execute_fused_plan): prologue and fold become separate dispatches.
    split = os.environ.get("INFERA_PALLAS_SQL_SPLIT") == "1"
    full_key = ("pallas_join", plan_key, tile, split)
    compiled = cache.get(full_key)
    if compiled is None:
        kernel = build_fused_plan_call(
            col_keys=col_keys, weights=weights, where_fn=where_fn,
            key_fns=key_fns, strides=strides, n_groups=G, sum_fns=sum_fns,
            min_fns=min_fns, max_fns=max_fns, n_valid=n, n_pad=n_pad,
            tile=tile, interpret=interpret)
        fold0 = _fold_call(rows_sum, rows_min, rows_max, K + 1)

        def prologue(lookup_d, *arrs):
            fact = dict(zip(fact_names, arrs[:nf]))
            dims = dict(zip(dim_names, arrs[nf:nf + len(dim_names)]))
            fk = jnp.asarray(fact[fact_key_name], jnp.int32)
            in_range = (fk >= 0) & (fk <= kmax_dim)
            ridx_raw = lookup_d[jnp.clip(fk, 0, kmax_dim)]
            matched = in_range & (ridx_raw >= 0)
            ridx = jnp.where(matched, ridx_raw, 0)
            rows = []
            for key in col_keys:
                if key == "__matched__":
                    rows.append(matched.astype(jnp.float32))
                elif key in dims:
                    rows.append(jnp.take(
                        jnp.asarray(dims[key], jnp.float32), ridx, axis=0))
                else:
                    rows.append(jnp.asarray(fact[key], jnp.float32))
            xc = jnp.stack(rows)
            if n_pad > n:
                xc = jnp.pad(xc, ((0, 0), (0, n_pad - n)))
            return xc

        if split:
            pro_jit = jax.jit(prologue)

            def compiled(lookup_d, *arrs):
                ws = arrs[nf + len(dim_names):]
                xc = pro_jit(lookup_d, *arrs[:nf + len(dim_names)])
                return fold0(*kernel(xc, *ws))
        else:
            def run(lookup_d, *arrs):
                ws = arrs[nf + len(dim_names):]
                xc = prologue(lookup_d, *arrs[:nf + len(dim_names)])
                return fold0(*kernel(xc, *ws))

            compiled = jax.jit(run)
        if len(cache) >= 16:
            cache.pop(next(iter(cache)))
        cache[full_key] = compiled

    from ..sql.device_plan import device_column_array

    try:
        args = ([device_column_array(fact_cols[k], key=k,
                                     block=fact_block, n=n)
                 for k in fact_names]
                + [device_column_array(dim_cols[k]) for k in dim_names]
                + [jnp.asarray(w) for w in weights])
        (s_f, c_f, min_f, max_f, flag_f, _dc, _dl, _dh, _ar,
         _lx) = jax.device_get(compiled(jnp.asarray(lookup), *args))
    except Exception:
        return None

    if float(flag_f[K]) > 0.0:
        return None
    return {
        "count": np.asarray(s_f[:G], np.float64)
        + np.asarray(c_f[:G], np.float64),
        "sums": [(s_f[(1 + i) * G:(2 + i) * G], c_f[(1 + i) * G:(2 + i) * G])
                 for i in range(S)],
        "mins": [min_f[i * G:(i + 1) * G] for i in range(M)],
        "maxs": [max_f[i * G:(i + 1) * G] for i in range(X)],
        "kmins": [min_f[(M + i) * G:(M + i + 1) * G] for i in range(K)],
        "kmaxs": [max_f[(X + i) * G:(X + i + 1) * G] for i in range(K)],
        "fracs": [bool(flag_f[i] > 0.0) for i in range(K)],
    }
