"""Profiling harness for the fused query kernel (ops/pallas_query.py).

Round-2 verdict: the driver metric sat at 5.1 ms/iter @1M rows with MFU 4.7%
and HBM 1.6% — bound by neither roofline, so the time was going somewhere
nobody had measured. This harness separates the candidate sinks on the
tunneled TPU platform:

  * ``iters``  — per-iteration time vs the number of queued dispatches per
    sync. bench.py historically amortized ONE device->host scalar readback
    (a ~36 ms tunnel round-trip, BASELINE.md) over only 10 iterations —
    a +3.6 ms/iter measurement artifact, not kernel time. If ms/iter falls
    as iters grows, the "overhead" was the sync RTT.
  * ``rows``   — total time vs row count at fixed iters. Fitting
    t = a + b*rows separates per-dispatch overhead (a) from real per-row
    kernel cost (b).
  * ``empty``  — a calibration kernel with the SAME grid/tile that only
    column-sums its input tile: the per-grid-step floor (DMA + step
    dispatch) with near-zero compute.
  * ``tiles``  — tile_n sweep under bf16 compute (halves VMEM, so 8192 and
    16384 row tiles fit where f32 OOM'd at 17.3 MB).
  * ``chain``  — K kernel applications chained through a scalar dependency
    inside ONE jit: pure device time, no per-dispatch cost at all.
    (CLAUDE.md notes composing pallas_call with other ops in one jit can
    stall the remote Mosaic compile — run last, under its own timeout.)

Each experiment prints one JSON line per measurement. Run ONE experiment per
process (the platform wants a single TPU process; the driver shell loops).

Usage: python -m infera_tpu.testing.profile_query <iters|rows|empty|tiles|chain>
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

IN_DIM, HIDDEN, OUT_DIM = 32, (128, 128), 16


def _params(seed=0):
    rng = np.random.default_rng(seed)
    dims = [IN_DIM, *HIDDEN, OUT_DIM]
    out = []
    for i in range(len(dims) - 1):
        w = (rng.standard_normal((dims[i], dims[i + 1])).astype(np.float32)
             * np.float32(1.0 / np.sqrt(dims[i])))
        b = rng.standard_normal(dims[i + 1]).astype(np.float32) * np.float32(0.1)
        out.append((w, b))
    return out


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def _setup(rows, dtype_name="bfloat16"):
    import jax
    import jax.numpy as jnp

    dtype = getattr(jnp, dtype_name)
    jparams = [(jnp.asarray(w), jnp.asarray(b)) for w, b in _params()]
    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (rows, IN_DIM),
                          jnp.float32).astype(dtype))
    return jax, jnp, jparams, x


def _time_queued(jnp, fn, x, iters):
    """Queue `iters` async dispatches, then force a device→host readback of
    a chained scalar (np.asarray). block_until_ready alone can return early
    on the tunneled platform even for chained out-of-jit reductions
    (CLAUDE.md timing trap; observed again on tiny-output kernels in the
    round-3 "variants" run), but a host readback cannot lie — the bytes
    must arrive. The readback RTT amortizes over `iters`."""
    np.asarray(jnp.sum(fn(x)[0]))  # compile + warm
    np.asarray(jnp.sum(fn(x)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    np.asarray(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / iters


def exp_iters(rows=1 << 20):
    import jax

    from infera_tpu.ops.pallas_query import fused_mlp_query

    jax_, jnp, jparams, x = _setup(rows)
    fn = jax.jit(functools.partial(
        fused_mlp_query, jparams, tile_n=4096,
        compute_dtype=jnp.bfloat16))
    for iters in (1, 5, 10, 50, 200):
        dt = _time_queued(jnp, fn, x, iters)
        _emit(exp="iters", iters=iters, rows=rows, ms_per_iter=dt * 1e3,
              rows_per_s=rows / dt)


def exp_rows():
    import jax

    from infera_tpu.ops.pallas_query import fused_mlp_query

    jnp = None
    for rows in (1 << 18, 1 << 20, 1 << 22, 1 << 23):
        jax_, jnp, jparams, x = _setup(rows)
        fn = jax.jit(functools.partial(
            fused_mlp_query, jparams, tile_n=4096,
            compute_dtype=jnp.bfloat16))
        dt = _time_queued(jnp, fn, x, 50)
        _emit(exp="rows", rows=rows, ms=dt * 1e3, rows_per_s=rows / dt)


def exp_empty(rows=1 << 20, tile_n=4096):
    """Same grid shape as the real kernel, near-zero compute: one column
    reduction per tile into a revisited accumulator block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:, :] += jnp.sum(x_ref[:].astype(jnp.float32), axis=0,
                                 keepdims=True)

    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (rows, IN_DIM),
                          jnp.float32).astype(jnp.bfloat16))
    fn = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(rows // tile_n,),
        in_specs=[pl.BlockSpec((tile_n, IN_DIM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, IN_DIM), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, IN_DIM), jnp.float32),
    )(x))
    jnp.sum(fn(x)).block_until_ready()
    jnp.sum(fn(x)).block_until_ready()
    for iters in (10, 50):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        jnp.sum(out).block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        _emit(exp="empty", rows=rows, tile_n=tile_n, iters=iters,
              ms_per_iter=dt * 1e3,
              us_per_grid_step=dt * 1e6 / (rows // tile_n))


def exp_tiles(rows=1 << 20):
    import jax

    from infera_tpu.ops.pallas_query import fused_mlp_query

    jax_, jnp, jparams, x = _setup(rows)
    for tile_n in (4096, 8192, 16384, 32768):
        try:
            fn = jax.jit(functools.partial(
                fused_mlp_query, jparams, tile_n=tile_n,
                compute_dtype=jnp.bfloat16))
            dt = _time_queued(jnp, fn, x, 50)
            _emit(exp="tiles", tile_n=tile_n, rows=rows, ms_per_iter=dt * 1e3,
                  rows_per_s=rows / dt)
        except Exception as e:  # VMEM OOM etc.
            _emit(exp="tiles", tile_n=tile_n, rows=rows,
                  error=f"{type(e).__name__}: {e}"[:200])


def exp_chain(rows=1 << 20, k=20):
    """K kernel calls chained through a data dependency in ONE jit —
    measures pure device time with zero per-dispatch overhead."""
    import jax
    import jax.numpy as jnp

    from infera_tpu.ops.pallas_query import fused_mlp_query

    jax_, jnp_, jparams, x = _setup(rows)

    @jax.jit
    def chained(x):
        def body(c, _):
            counts, sums = fused_mlp_query(jparams, x + c * 0,
                                           tile_n=4096,
                                           compute_dtype=jnp.bfloat16)
            return jnp.sum(counts).astype(x.dtype) * 1e-12, (counts[0], sums[0])
        c, outs = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=k)
        return c, outs

    jnp.sum(chained(x)[0]).block_until_ready()
    t0 = time.perf_counter()
    out = chained(x)
    jnp.sum(out[0]).block_until_ready()
    dt = (time.perf_counter() - t0) / k
    _emit(exp="chain", rows=rows, k=k, ms_per_iter=dt * 1e3,
          rows_per_s=rows / dt)


def exp_variants(rows=1 << 20, tile_n=4096):
    """Decompose the 2.7 ms kernel time: scan-only → +L1 → +all matmuls →
    +filter/aggregate tail without argmax → full kernel. Each variant is its
    own pallas_call in its own jit, timed with the trusted queued-dispatch
    method (iters=100 amortizes the sync RTT to ~0.3 ms/iter)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jparams = [(jnp.asarray(w, jnp.bfloat16), jnp.asarray(b, jnp.float32))
               for w, b in _params()]
    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (rows, IN_DIM),
                          jnp.float32).astype(jnp.bfloat16))

    def make(variant):
        ws = [w for w, _ in jparams]
        bs = [b.reshape(1, -1) for _, b in jparams]

        def kernel(x_ref, *refs):
            acc_ref = refs[-1]

            @pl.when(pl.program_id(0) == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
            h = x_ref[:]
            if variant == "scan":
                acc_ref[:, :IN_DIM] += jnp.sum(h.astype(jnp.float32), axis=0,
                                               keepdims=True)
                return
            n_mm = {"mm1": 1, "mm_all": 3, "tail_nomax": 3, "full": 3}[variant]
            for li in range(n_mm):
                w = refs[2 * li][:]
                b = refs[2 * li + 1][:]
                h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b[0, :]
                if li < n_mm - 1:
                    h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
            if variant in ("mm1", "mm_all"):
                acc_ref[:, : h.shape[1]] += jnp.sum(h, axis=0, keepdims=True)
                return
            if variant == "tail_nomax":
                # aggregate tail with max+compare instead of argmax
                mx = jnp.max(h, axis=-1, keepdims=True)
                onehot = (h == mx).astype(jnp.float32)
            else:
                pred = jnp.argmax(h, axis=-1)
                onehot = (jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
                          == pred[:, None]).astype(jnp.float32)
            sel = (h[:, 0] > 0.0).astype(jnp.float32)
            acc_ref[:, :OUT_DIM] += jnp.sum(
                onehot * sel[:, None], axis=0, keepdims=True)[:, :OUT_DIM]
            acc_ref[:, OUT_DIM:2 * OUT_DIM] += jnp.sum(
                onehot * (h[:, 0] * sel)[:, None], axis=0,
                keepdims=True)[:, :OUT_DIM]

        n_mm = {"scan": 0, "mm1": 1, "mm_all": 3, "tail_nomax": 3,
                "full": 3}[variant]
        specs = [pl.BlockSpec((tile_n, IN_DIM), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
        args = []
        for li in range(n_mm):
            specs.append(pl.BlockSpec(ws[li].shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
            specs.append(pl.BlockSpec(bs[li].shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
            args.extend([ws[li], bs[li]])

        def fn(x):
            return pl.pallas_call(
                kernel,
                grid=(rows // tile_n,),
                in_specs=specs,
                out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            )(x, *args)
        return jax.jit(fn), args

    # calibration op with a known cost: [4096,4096]² bf16 matmul =
    # 137 GFLOP ≈ 0.7 ms at the 197-TFLOPS peak. If the harness reports
    # far below that, the timing is lying and the run is invalid.
    a = jax.block_until_ready(jax.random.normal(
        jax.random.PRNGKey(2), (4096, 4096), jnp.float32).astype(jnp.bfloat16))
    mm = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32))
    dt = _time_queued(jnp, lambda a_, f=mm: (f(a_),), a, 50)
    _emit(exp="variants", variant="calib_matmul4096", ms_per_iter=dt * 1e3,
          expected_ms_floor=0.7)

    for variant in ("scan", "mm1", "mm_all", "tail_nomax", "full"):
        try:
            fn, _ = make(variant)
            dt = _time_queued(jnp, lambda x, f=fn: (f(x),), x, 100)
            _emit(exp="variants", variant=variant, rows=rows,
                  ms_per_iter=dt * 1e3, rows_per_s=rows / dt)
        except Exception as e:
            _emit(exp="variants", variant=variant,
                  error=f"{type(e).__name__}: {e}"[:160])


def exp_col(rows=1 << 20):
    """The feature-major (columnar) kernel across lane-tile sizes, vs the
    row-major kernel at its best tile — the round-3 layout fix."""
    import jax

    from infera_tpu.ops.pallas_query import (fused_mlp_query,
                                             fused_mlp_query_columnar)

    jax_, jnp, jparams, x = _setup(rows, "float32")
    xc = jax.block_until_ready(x.T.astype(jnp.bfloat16))
    x_bf = jax.block_until_ready(x.astype(jnp.bfloat16))
    fn_row = jax.jit(functools.partial(
        fused_mlp_query, jparams, tile_n=4096, compute_dtype=jnp.bfloat16))
    dt = _time_queued(jnp, fn_row, x_bf, 100)
    _emit(exp="col", variant="row_major_4096", ms_per_iter=dt * 1e3,
          rows_per_s=rows / dt)
    for tile in (4096, 8192, 16384, 32768):
        try:
            fn = jax.jit(functools.partial(
                fused_mlp_query_columnar, jparams, tile_n=tile,
                compute_dtype=jnp.bfloat16))
            dt = _time_queued(jnp, fn, xc, 100)
            _emit(exp="col", variant=f"columnar_{tile}", ms_per_iter=dt * 1e3,
                  rows_per_s=rows / dt)
        except Exception as e:
            _emit(exp="col", variant=f"columnar_{tile}",
                  error=f"{type(e).__name__}: {e}"[:160])


EXPS = {"iters": exp_iters, "rows": exp_rows, "empty": exp_empty,
        "tiles": exp_tiles, "chain": exp_chain, "variants": exp_variants,
        "col": exp_col}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "iters"
    t0 = time.perf_counter()
    EXPS[name]()
    _emit(exp=name, done=True, wall_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
