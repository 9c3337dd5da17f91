"""Benchmark driver: batched-inference query throughput on one chip.

Workload = BASELINE.json config 2: MLP-classifier batched predict over a
1M-row table with filter + hash aggregate on the predictions, fused on the
TPU. The MLP runs through the Pallas fused kernel (whole layer stack per
VMEM-resident row tile — see infera_tpu/ops/pallas_mlp.py) with an XLA
fallback. The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is measured against an in-process torch-CPU implementation
of the same query — a stand-in for the reference's tract-CPU execution model
(single-process CPU inference, SURVEY.md §6).

Input rows are generated on-device (the table is HBM-resident, as it would
be mid-pipeline in the query engine); timing excludes compilation. The TPU
attempt runs in a subprocess with a timeout because the tunneled platform's
first compile can take minutes (see CLAUDE.md); the child emits a JSON line
after every improving implementation so a timed-out run still yields the
XLA number.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rows/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

IN_DIM, HIDDEN, OUT_DIM = 32, (128, 128), 16


def _build_params(seed=0):
    rng = np.random.default_rng(seed)
    dims = [IN_DIM, *HIDDEN, OUT_DIM]
    params = []
    for i in range(len(dims) - 1):
        w = (rng.standard_normal((dims[i], dims[i + 1])).astype(np.float32)
             * np.float32(1.0 / np.sqrt(dims[i])))
        b = rng.standard_normal(dims[i + 1]).astype(np.float32) * np.float32(0.1)
        params.append((w, b))
    return params


# Roofline constants for MFU / HBM%% reporting (v5e defaults; override for
# other chips). MFU is reported against the bf16 MXU peak.
PEAK_TFLOPS = float(os.environ.get("INFERA_TPU_PEAK_TFLOPS", "197"))
HBM_GBS = float(os.environ.get("INFERA_TPU_HBM_GBS", "819"))


def _sync(out):
    """Force real completion: on the tunneled platform block_until_ready on
    a jit result can return early (CLAUDE.md timing trap) — chain an
    out-of-jit scalar reduction and block on that instead."""
    import jax.numpy as jnp

    jnp.sum(out[0]).block_until_ready()


def bench_tpu(params, rows, iters=200, use_pallas=True):
    import jax
    import jax.numpy as jnp

    # NOTE: jax_compilation_cache_dir is deliberately NOT enabled here — on
    # the tunneled remote-compile TPU platform, persisting executables makes
    # every compile ~100x slower (serialization over the tunnel).
    print(f"devices: {jax.devices()}", file=sys.stderr)
    jparams = [(jnp.asarray(w), jnp.asarray(b)) for w, b in params]
    t0 = time.perf_counter()
    x = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1), (rows, IN_DIM), jnp.float32)
    )
    print(f"on-device data gen: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    model_flops = 2 * rows * sum(w.shape[0] * w.shape[1] for w, _ in params)

    def mlp_xla(x):
        h = x
        for i, (w, b) in enumerate(jparams):
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if i < len(jparams) - 1:
                h = jax.nn.relu(h)
        return h

    def query_tail(h):
        pred = jnp.argmax(h, axis=-1).astype(jnp.int32)
        sel = h[:, 0] > 0.0
        w_sel = sel.astype(jnp.float32)
        counts = jax.ops.segment_sum(w_sel, pred, num_segments=OUT_DIM)
        sums = jax.ops.segment_sum(h[:, 0] * w_sel, pred, num_segments=OUT_DIM)
        return counts, sums

    # XLA path first: fast, reliable compile → a number is guaranteed even
    # if the run is killed during the slower Pallas compile. The child
    # prints a JSON line after EVERY improvement, so a parent that times us
    # out mid-Pallas still salvages the best number so far from partial
    # stdout. Pallas variants are ordered by expected throughput: bf16 with
    # a bf16-stored table (half the HBM scan traffic), bf16 compute over an
    # f32 table, then the f32 parity kernel.
    impls = [("xla", jax.jit(lambda x: query_tail(mlp_xla(x))), x)]
    if use_pallas and rows % 4096 == 0:
        from infera_tpu.ops.pallas_query import (
            fused_mlp_query, fused_mlp_query_columnar,
            fused_mlp_query_columnar_int8, quantize_mlp_static)

        # Columnar (feature-major) kernel first: [d, N] blocks are
        # lane-dense, which round-3 profiling showed is worth ~3x over the
        # row-major layout (scan 1.17→~0.1 ms, tail 1.22→~0.15 ms @1M).
        # [d, N] is the engine's native table layout (stacked columns).
        xc_bf16 = jax.block_until_ready(x.T.astype(jnp.bfloat16))
        impls.append(("pallas_col_bf16_io", jax.jit(
            lambda x: fused_mlp_query_columnar(jparams, x, tile_n=16384,
                                               compute_dtype=jnp.bfloat16)),
            xc_bf16))
        # int8 columnar (VERDICT r3 item 4): static-calibrated int8 table
        # (half the bf16 scan bytes) + int8 MXU matmuls (2x the bf16 issue
        # rate on v5e) with in-VMEM requantization between layers
        # calibration sample generated HOST-side: np.asarray of a device
        # array costs a tunnel readback (CLAUDE.md); the scales only need
        # representative magnitudes, so a same-distribution host sample
        # calibrates equivalently
        x_host = np.random.default_rng(7).standard_normal(
            (1 << 14, IN_DIM)).astype(np.float32)
        # shift-only int8 (round 5): power-of-two scales turn the requant
        # epilogue into integer shifts — the f32 epilogue cost that kept
        # plain int8 behind bf16 (BASELINE r4). Gated on the measured
        # class-flip rate vs f32; a refused model skips the variant.
        from infera_tpu.ops.pallas_query import (
            fused_mlp_query_columnar_int8_shift, quantize_mlp_shift)

        shift_cal = quantize_mlp_shift(params, x_host, max_flip_rate=0.04)
        if shift_cal is not None:
            qp_s, s0_s, flip = shift_cal
            print(f"int8-shift calibration: class-flip rate vs f32 = "
                  f"{flip:.4f} (gate 0.04; plain int8 measures ~0.027 "
                  f"on this model)", file=sys.stderr)
            xq_s = jax.block_until_ready(jnp.clip(
                jnp.rint(x.T / s0_s), -127, 127).astype(jnp.int8))
            impls.append(("pallas_col_int8_shift", jax.jit(
                lambda x: fused_mlp_query_columnar_int8_shift(
                    qp_s, x, tile_n=16384)), xq_s))
        else:
            print("int8-shift calibration REFUSED (class-flip gate)",
                  file=sys.stderr)
        qparams, s0 = quantize_mlp_static(params, x_host)
        xq = jax.block_until_ready(jnp.clip(
            jnp.rint(x.T / s0), -127, 127).astype(jnp.int8))
        impls.append(("pallas_col_int8", jax.jit(
            lambda x: fused_mlp_query_columnar_int8(qparams, x,
                                                    tile_n=16384)), xq))
        x_bf16 = jax.block_until_ready(x.astype(jnp.bfloat16))
        impls.append(("pallas_bf16_io", jax.jit(
            lambda x: fused_mlp_query(jparams, x, tile_n=4096,
                                      compute_dtype=jnp.bfloat16)), x_bf16))
        impls.append(("pallas_bf16", jax.jit(
            lambda x: fused_mlp_query(jparams, x, tile_n=4096,
                                      compute_dtype=jnp.bfloat16)), x))
        impls.append(("pallas_f32", jax.jit(
            lambda x: fused_mlp_query(jparams, x, tile_n=4096)), x))

    best = None
    for name, fn, inp in impls:
        try:
            t0 = time.perf_counter()
            _sync(fn(inp))
            print(f"{name} first call (compile): {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            _sync(fn(inp))
            # Steady state at iters=200: one host sync per timed window costs
            # a full tunnel round-trip (~26-30 ms measured by
            # testing/profile_query.py exp "iters"); at the old iters=10 that
            # baked +2.6 ms/iter of pure measurement artifact into the metric
            # (BENCH_r02's 5.1 ms/iter was really ~2.7 ms of kernel).
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(inp)
            _sync(out)
            dt = (time.perf_counter() - t0) / iters
            rps = rows / dt
            bytes_in = inp.size * inp.dtype.itemsize
            mfu = model_flops / dt / (PEAK_TFLOPS * 1e12)
            hbm = bytes_in / dt / (HBM_GBS * 1e9)
            print(f"{name}: {dt * 1e3:.3f} ms/iter = {rps:,.0f} rows/s "
                  f"(MFU {mfu * 100:.1f}%, HBM {hbm * 100:.1f}%)",
                  file=sys.stderr)
            if best is None or rps > best["rows_per_s"]:
                best = {"impl": name, "rows_per_s": rps,
                        "mfu": round(mfu, 4), "hbm_frac": round(hbm, 4)}
                print(json.dumps(best), flush=True)
        except Exception as e:  # pragma: no cover - pallas fallback
            print(f"{name} path failed: {type(e).__name__}: {e}", file=sys.stderr)
    if best is None:
        raise RuntimeError("no TPU implementation succeeded")
    return best


def bench_torch_cpu(params, rows, iters=2):
    import torch

    # Pin the thread count: BENCH_r01 vs r02 swung 4.5x (89k vs 398k rows/s)
    # because torch picked different thread counts on the shared 2-core box;
    # vs_baseline is only comparable across rounds with this fixed.
    torch.set_num_threads(int(os.environ.get("INFERA_BENCH_TORCH_THREADS", "2")))
    rng = np.random.default_rng(1)
    x = torch.from_numpy(rng.standard_normal((rows, IN_DIM)).astype(np.float32))
    tparams = [(torch.from_numpy(w), torch.from_numpy(b)) for w, b in params]

    def query(x):
        h = x
        for i, (w, b) in enumerate(tparams):
            h = h @ w + b
            if i < len(tparams) - 1:
                h = torch.relu(h)
        pred = h.argmax(dim=-1)
        sel = h[:, 0] > 0.0
        w_sel = sel.to(torch.float32)
        counts = torch.zeros(OUT_DIM).index_add_(0, pred, w_sel)
        sums = torch.zeros(OUT_DIM).index_add_(0, pred, h[:, 0] * w_sel)
        return counts, sums

    query(x)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = query(x)
    dt = time.perf_counter() - t0
    del out
    return rows * iters / dt


def _parse_rows(argv):
    rows = 1 << 20
    if "--quick" in argv:
        rows = 1 << 17
    for i, a in enumerate(argv):
        if a == "--rows" and i + 1 < len(argv):
            rows = int(argv[i + 1])
    return rows


def _child_main():
    """Subprocess entry: run the TPU measurement; bench_tpu prints a JSON
    line after each improving implementation."""
    rows = _parse_rows(sys.argv)
    use_pallas = os.environ.get("INFERA_BENCH_NO_PALLAS") != "1"
    params = _build_params()
    bench_tpu(params, rows, use_pallas=use_pallas)


def _run_tpu_subprocess(rows: int, timeout_s: int):
    """The tunneled platform's remote-compile queue has unbounded latency
    (observed 1.7s-∞ for identical programs); isolating the attempt in a
    subprocess lets the parent time out and retry smaller."""
    import subprocess

    cmd = [sys.executable, "-u", os.path.abspath(__file__), "--tpu-child",
           "--rows", str(rows)]
    def best_line(stdout: str):
        best = None
        for line in (stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    cand = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if best is None or cand.get("rows_per_s", 0) > best.get("rows_per_s", 0):
                    best = cand
        return best

    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        print(f"TPU attempt at {rows} rows timed out after {timeout_s}s",
              file=sys.stderr)
        err = e.stderr.decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        if err:  # show where the child was stuck (compile queue diagnosis)
            sys.stderr.write(err[-2000:])
        # salvage any result the child printed before the timeout (the XLA
        # number lands before the slower Pallas attempt)
        partial = e.stdout.decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        return best_line(partial)
    sys.stderr.write(res.stderr)
    result = best_line(res.stdout)
    if result is None:
        print(f"TPU attempt produced no result (exit {res.returncode})",
              file=sys.stderr)
    return result


def main():
    if "--tpu-child" in sys.argv:
        _child_main()
        return
    rows = _parse_rows(sys.argv)
    params = _build_params()

    result = _run_tpu_subprocess(rows, timeout_s=int(
        os.environ.get("INFERA_BENCH_TIMEOUT", "540")))
    if result is None:
        # the remote compile queue's latency is bursty (1.7s–10min for the
        # same program, CLAUDE.md) — one retry routinely succeeds
        result = _run_tpu_subprocess(rows, timeout_s=int(
            os.environ.get("INFERA_BENCH_TIMEOUT", "540")))
    if result is None and rows > (1 << 17):
        result = _run_tpu_subprocess(1 << 17, timeout_s=240)

    try:
        cpu_rows_s = bench_torch_cpu(params, min(rows, 1 << 20))
        print(f"torch-cpu baseline (2 threads pinned): {cpu_rows_s:,.0f} rows/s",
              file=sys.stderr)
    except Exception as e:
        print(f"torch baseline failed: {e}", file=sys.stderr)
        cpu_rows_s = None

    if result is not None:
        tpu_rows_s = result["rows_per_s"]
        vs_baseline = (tpu_rows_s / cpu_rows_s) if cpu_rows_s else 1.0
        out = {
            "metric": "mlp_batched_inference_query_rows_per_s_per_chip",
            "value": round(tpu_rows_s, 1),
            "unit": "rows/s",
            "vs_baseline": round(vs_baseline, 3),
        }
        for k in ("impl", "mfu", "hbm_frac"):
            if k in result:
                out[k] = result[k]
        if cpu_rows_s:
            # record the baseline itself: the shared 2-core box makes the
            # torch number swing run-to-run even with threads pinned, so
            # vs_baseline is only interpretable alongside these fields
            out["baseline_rows_per_s"] = round(cpu_rows_s, 1)
            out["baseline_torch_threads"] = int(
                os.environ.get("INFERA_BENCH_TORCH_THREADS", "2"))
        print(json.dumps(out))
        return
    # Last resort: the compile queue never returned. Report the same query
    # measured on the CPU backend of this engine so the driver records an
    # honest (clearly-flagged) number rather than nothing.
    print(json.dumps({
        "metric": "mlp_batched_inference_query_rows_per_s_per_chip",
        "value": round(cpu_rows_s or 0.0, 1),
        "unit": "rows/s",
        "vs_baseline": 1.0,
        "note": "tpu_compile_queue_timeout_cpu_fallback",
    }))


if __name__ == "__main__":
    main()
