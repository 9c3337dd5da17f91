"""Benchmark suite: the five BASELINE.json configs.

1. linear.onnx predict over a 3-col float table (single-chip parity case)
2. MLP classifier: batched predict over a 1M-row table + filter + hash
   aggregate on predictions
3. multi-output model predictions joined back to the source table (hash join)
4. GBT tree-ensemble + autoloaded multi-model registry, concurrent queries
5. partitioned table: distributed shuffle + skewed hash join + batched
   inference over the dp mesh (run on the virtual mesh when only one real
   chip exists)

Each config reports rows/s; run via ``python -m infera_tpu.testing.benchmarks``
or through bench.py (which emits the driver's one-line JSON).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np


@dataclass
class BenchResult:
    name: str
    rows_per_s: float
    rows: int
    seconds: float
    detail: str = ""


# TPU v5e (per-chip) roofline constants for speed-of-light reporting
V5E_PEAK_BF16_FLOPS = 394e12
V5E_PEAK_F32_FLOPS = 98.5e12  # bf16/4 (f32 via MXU passes)
V5E_HBM_BYTES_PER_S = 819e9


def roofline(flops: int, bytes_moved: int, seconds: float,
             f32: bool = True) -> str:
    """Fraction of chip speed-of-light achieved: max of compute-bound and
    memory-bound utilization (SURVEY.md §7.2 M6)."""
    peak = V5E_PEAK_F32_FLOPS if f32 else V5E_PEAK_BF16_FLOPS
    compute_frac = (flops / seconds) / peak if seconds > 0 else 0.0
    mem_frac = (bytes_moved / seconds) / V5E_HBM_BYTES_PER_S if seconds > 0 else 0.0
    bound = "compute" if compute_frac >= mem_frac else "memory"
    return (f"SOL: {max(compute_frac, mem_frac) * 100:.1f}% ({bound}-bound; "
            f"{flops / seconds / 1e12:.2f} TFLOP/s, "
            f"{bytes_moved / seconds / 1e9:.1f} GB/s)")


def _sync(out):
    """Force completion: on the tunneled platform block_until_ready on a
    jit result can return without waiting (CLAUDE.md timing trap) — chain
    an out-of-jit reduction and block on the scalar instead."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            jnp.sum(leaf).block_until_ready()
            return
    jax.block_until_ready(out)


def _time(fn, iters=3, warmup=1):
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_config1_linear(rows: int = 1_000_000) -> BenchResult:
    """linear.onnx semantics: y = 2x1 - x2 + 0.5x3 + 0.25 over a float table."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, 3)), jnp.float32)
    w = jnp.asarray([[2.0], [-1.0], [0.5]], jnp.float32)
    b = jnp.asarray([0.25], jnp.float32)

    @jax.jit
    def q(x):
        return jnp.dot(x, w, preferred_element_type=jnp.float32) + b

    dt = _time(lambda: q(x))
    return BenchResult("config1_linear_predict", rows / dt, rows, dt)


def bench_config2_mlp(rows: int = 1 << 20, use_pallas: bool = True) -> BenchResult:
    """MLP predict + filter + hash aggregate, fused on device.

    Round 5: the whole query runs through the columnar fused kernel
    (scan → MLP → filter → grouped aggregate in ONE pallas grid pass,
    the driver bench's flagship path) instead of composing the MLP
    kernel with an XLA scatter tail — the scatter tail alone cost ~17 ms
    of the old 28 ms at 1M rows."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas_query import fused_mlp_query_columnar

    rng = np.random.default_rng(0)
    in_dim, hidden, out_dim = 32, (128, 128), 16
    dims = [in_dim, *hidden, out_dim]
    params = []
    for i in range(len(dims) - 1):
        params.append((
            jnp.asarray(rng.standard_normal((dims[i], dims[i + 1])), jnp.float32)
            * np.float32(1 / np.sqrt(dims[i])),
            jnp.asarray(rng.standard_normal(dims[i + 1]), jnp.float32) * 0.1,
        ))
    x = jnp.asarray(rng.standard_normal((rows, in_dim)), jnp.float32)

    tile = 16384
    pallas_ok = use_pallas and rows % tile == 0 and \
        jax.default_backend() not in ("cpu", "gpu")

    if pallas_ok:
        xc = jax.block_until_ready(x.T.astype(jnp.bfloat16))
        q = jax.jit(lambda a: fused_mlp_query_columnar(
            params, a, tile_n=tile, compute_dtype=jnp.bfloat16))
        arg = xc
    else:
        def mlp_xla(x):
            h = x
            for i, (w, b) in enumerate(params):
                h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
                if i < len(params) - 1:
                    h = jax.nn.relu(h)
            return h

        @jax.jit
        def q(x):
            h = mlp_xla(x)
            pred = jnp.argmax(h, axis=-1).astype(jnp.int32)
            sel = h[:, 0] > 0.0
            w_sel = sel.astype(jnp.float32)
            counts = jax.ops.segment_sum(w_sel, pred, num_segments=out_dim)
            sums = jax.ops.segment_sum(h[:, 0] * w_sel, pred,
                                       num_segments=out_dim)
            return counts, sums

        arg = x

    dt = _time(lambda: q(arg))
    flops = 2 * rows * sum(d1 * d2 for d1, d2 in zip(dims[:-1], dims[1:]))
    bytes_moved = (rows * in_dim * 2 if pallas_ok
                   else rows * (in_dim + 2 * sum(hidden) + out_dim) * 4)
    return BenchResult(
        "config2_mlp_filter_agg", rows / dt, rows, dt,
        detail=("pallas-query-fused" if pallas_ok else "xla") + " | " +
               roofline(flops, bytes_moved, dt),
    )


def bench_config3_join(rows: int = 1_000_000) -> BenchResult:
    """Multi-output predictions joined back to the source table: on-device
    sort-based inner join on row keys."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.permutation(rows).astype(np.int32))
    x = jnp.asarray(rng.standard_normal((rows, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    payload = jnp.asarray(rng.standard_normal(rows), jnp.float32)

    @jax.jit
    def q(keys, x, payload):
        scores = jnp.dot(x, w, preferred_element_type=jnp.float32)
        # join scores (keyed by keys) back to source rows (same key space):
        # sort both sides by key and merge — 1:1 keys here
        order_l = jnp.argsort(keys)
        order_r = jnp.argsort(keys)
        joined = scores[order_r][jnp.argsort(order_l)]  # align to left order
        return jnp.sum(joined[:, 0] * payload)

    dt = _time(lambda: q(keys, x, payload))
    return BenchResult("config3_multioutput_join", rows / dt, rows, dt)


def bench_config4_gbt(rows: int = 262_144) -> BenchResult:
    """Tree-ensemble (GBT) inference through the ONNX engine."""
    import jax

    from ..onnx import builder, compile_model_bytes

    model = compile_model_bytes(
        builder.gbt_regressor_model(n_features=16, n_trees=64, depth=6).serialize(),
        "gbt_bench",
    )
    rng = np.random.default_rng(0)
    # HBM-resident input (as mid-pipeline in the query engine): re-uploading
    # 16 MB per iteration over the tunneled platform costs ~0.5 s and would
    # measure the tunnel, not the chip
    x = jax.device_put(rng.standard_normal((rows, 16)).astype(np.float32))

    def q():
        return model.run(x)[0]

    dt = _time(q)
    return BenchResult("config4_gbt_predict", rows / dt, rows, dt)


def bench_config5_distributed(rows_per_dev: int = 65_536,
                              n_devices: int | None = None) -> BenchResult:
    """Distributed shuffle + skewed keys + batched inference on the mesh."""
    import jax

    from ..parallel.mesh import make_mesh
    from ..parallel.pipeline import example_inputs, make_distributed_query_step

    mesh = make_mesh(n_devices)
    ndev = mesh.shape["dp"]
    rows = rows_per_dev * ndev
    step = make_distributed_query_step(mesh, n_groups=64, cap=rows_per_dev)
    params, x, keys = example_inputs(mesh, rows, in_dim=32, out_dim=16,
                                     n_groups=64)

    def q():
        return step(params, x, keys)

    dt = _time(q)
    return BenchResult(
        f"config5_distributed_{ndev}dev", rows / dt, rows, dt,
        detail=f"{ndev} devices",
    )


def bench_scaling(rows_per_dev: int = 32_768, device_counts=(1, 2, 4, 8)) -> list:
    """Scaling-efficiency harness (BASELINE.md target metric): run the
    distributed query step at several dp sizes with FIXED rows/device (weak
    scaling) and report efficiency = T(1) / T(n).

    On the single-real-chip environment this runs on the virtual CPU mesh —
    it validates the mechanism and the collective overhead profile, not TPU
    wall-clock; on a real pod slice the same harness measures ICI scaling.
    """
    import jax

    from ..parallel.mesh import make_mesh
    from ..parallel.pipeline import example_inputs, make_distributed_query_step

    results = []
    t1 = None
    for ndev in device_counts:
        if ndev > len(jax.devices()) and ndev > len(jax.devices("cpu")):
            break
        mesh = make_mesh(ndev)
        rows = rows_per_dev * ndev
        step = make_distributed_query_step(mesh, n_groups=64, cap=rows_per_dev)
        params, x, keys = example_inputs(mesh, rows, in_dim=32, out_dim=16,
                                         n_groups=64)
        dt = _time(lambda: step(params, x, keys))
        if t1 is None:
            t1 = dt
        eff = t1 / dt
        results.append(BenchResult(
            f"scaling_dp{ndev}", rows / dt, rows, dt,
            detail=f"weak-scaling efficiency {eff:.2f}",
        ))
    return results


ALL_BENCHMARKS = {
    "config1": bench_config1_linear,
    "config2": bench_config2_mlp,
    "config3": bench_config3_join,
    "config4": bench_config4_gbt,
    "config5": bench_config5_distributed,
    "scaling": bench_scaling,
}


def main(argv=None):
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    names = [a for a in argv if not a.startswith("-")] or list(ALL_BENCHMARKS)
    for name in names:
        fn = ALL_BENCHMARKS[name]
        out = fn()
        for res in out if isinstance(out, list) else [out]:
            print(f"{res.name}: {res.rows_per_s:,.0f} rows/s "
                  f"({res.rows:,} rows, {res.seconds * 1e3:.2f} ms/iter) {res.detail}")


if __name__ == "__main__":
    main()
