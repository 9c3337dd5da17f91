"""Benchmark driver: batched-inference query throughput on one chip.

Workload = BASELINE.json config 2: MLP-classifier batched predict over a
1M-row table with filter + hash aggregate on the predictions, fused into one
XLA program on the TPU. The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is measured against an in-process torch-CPU implementation of
the same query — a stand-in for the reference's tract-CPU execution model
(single-process CPU inference, SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rows/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def _build_params(in_dim, hidden, out_dim, seed=0):
    rng = np.random.default_rng(seed)
    dims = [in_dim, *hidden, out_dim]
    params = []
    for i in range(len(dims) - 1):
        w = (rng.standard_normal((dims[i], dims[i + 1])).astype(np.float32)
             * np.float32(1.0 / np.sqrt(dims[i])))
        b = rng.standard_normal(dims[i + 1]).astype(np.float32) * np.float32(0.1)
        params.append((w, b))
    return params


def bench_tpu(params, x_np, iters=5, warmup=2):
    import jax
    import jax.numpy as jnp

    jparams = [(jnp.asarray(w), jnp.asarray(b)) for w, b in params]
    x = jnp.asarray(x_np)
    n_classes = params[-1][0].shape[1]

    @jax.jit
    def query(params, x):
        h = x
        for i, (w, b) in enumerate(params):
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if i < len(params) - 1:
                h = jax.nn.relu(h)
        pred = jnp.argmax(h, axis=-1).astype(jnp.int32)
        sel = h[:, 0] > 0.0  # filter
        w_sel = sel.astype(jnp.float32)
        counts = jax.ops.segment_sum(w_sel, pred, num_segments=n_classes)
        sums = jax.ops.segment_sum(h[:, 0] * w_sel, pred, num_segments=n_classes)
        return counts, sums

    for _ in range(warmup):
        jax.block_until_ready(query(jparams, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = query(jparams, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    rows_per_s = x_np.shape[0] * iters / dt
    return rows_per_s, out


def bench_torch_cpu(params, x_np, iters=2):
    import torch

    tparams = [(torch.from_numpy(w), torch.from_numpy(b)) for w, b in params]
    x = torch.from_numpy(x_np)
    n_classes = params[-1][0].shape[1]

    def query(x):
        h = x
        for i, (w, b) in enumerate(tparams):
            h = h @ w + b
            if i < len(tparams) - 1:
                h = torch.relu(h)
        pred = h.argmax(dim=-1)
        sel = h[:, 0] > 0.0
        w_sel = sel.to(torch.float32)
        counts = torch.zeros(n_classes).index_add_(0, pred, w_sel)
        sums = torch.zeros(n_classes).index_add_(0, pred, h[:, 0] * w_sel)
        return counts, sums

    query(x)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = query(x)
    dt = time.perf_counter() - t0
    del out
    return x_np.shape[0] * iters / dt


def main():
    rows = 1_000_000
    if "--quick" in sys.argv:
        rows = 100_000
    for i, a in enumerate(sys.argv):
        if a == "--rows" and i + 1 < len(sys.argv):
            rows = int(sys.argv[i + 1])

    in_dim, hidden, out_dim = 32, (128, 128), 16
    params = _build_params(in_dim, hidden, out_dim)
    rng = np.random.default_rng(1)
    x_np = rng.standard_normal((rows, in_dim)).astype(np.float32)

    tpu_rows_s, _ = bench_tpu(params, x_np)
    try:
        cpu_rows_s = bench_torch_cpu(params, x_np)
    except Exception as e:
        print(f"torch baseline failed: {e}", file=sys.stderr)
        cpu_rows_s = None

    vs_baseline = (tpu_rows_s / cpu_rows_s) if cpu_rows_s else 1.0
    print(json.dumps({
        "metric": "mlp_batched_inference_query_rows_per_s_per_chip",
        "value": round(tpu_rows_s, 1),
        "unit": "rows/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
