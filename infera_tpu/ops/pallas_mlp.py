"""Fused MLP inference Pallas kernel.

The hot operator of BASELINE.json configs 2/4 is a small-width MLP applied to
millions of rows. XLA executes each layer as a separate matmul, writing every
intermediate activation matrix ([N, hidden] f32) to HBM and reading it back —
for a 1M×(32→128→128→16) model that's ~1.5 GB of avoidable HBM traffic per
query, and the op is HBM-bound, not MXU-bound.

This kernel tiles the row dimension and runs the ENTIRE layer stack on one
row-tile while it is resident in VMEM: weights for all layers are loaded once
(they're small), each grid step streams one row-tile HBM→VMEM, applies every
matmul+bias+ReLU on the MXU/VPU, and writes only the final output. HBM
traffic drops to read(X) + write(Y).

Constraints: total weight bytes + 2 activation tiles must fit VMEM (~16 MB);
suitable for hidden widths up to ~2k at TILE_N=1024. Caller pads N to a
multiple of TILE_N (the engine's power-of-two bucketing already does this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_N = 1024


def _mlp_kernel(n_layers, final_softmax, x_ref, *refs):
    # refs: w0, b0, w1, b1, ..., out_ref
    out_ref = refs[-1]
    h = x_ref[:]
    for li in range(n_layers):
        w = refs[2 * li][:]
        b = refs[2 * li + 1][:]
        h = (
            jnp.dot(h, w, preferred_element_type=jnp.float32)
            + b[0, :]
        )
        if li < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    if final_softmax:
        h = jax.nn.softmax(h, axis=-1)
    out_ref[:] = h


def fused_mlp(params: list, x: jnp.ndarray, tile_n: int = DEFAULT_TILE_N,
              final_softmax: bool = False, interpret: bool = False) -> jnp.ndarray:
    """Run a ReLU MLP over x with one fused kernel.

    params: [(w, b), ...] with w [d_in, d_out] f32, b [d_out] f32.
    x: [N, d0] f32 with N % tile_n == 0 (pad first; see fused_mlp_padded).
    """
    n, d0 = x.shape
    assert n % tile_n == 0, f"rows {n} not a multiple of tile {tile_n}"
    n_layers = len(params)
    d_out = params[-1][0].shape[1]

    weight_specs = []
    weight_args = []
    for w, b in params:
        weight_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        weight_args.append(w)
        b2 = b.reshape(1, -1)
        weight_specs.append(pl.BlockSpec(b2.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        weight_args.append(b2)

    flops = 2 * n * sum(w.shape[0] * w.shape[1] for w, _ in params)
    bytes_accessed = x.size * 4 + n * d_out * 4 + sum(
        w.size * 4 + b.size * 4 for w, b in params
    )

    return pl.pallas_call(
        functools.partial(_mlp_kernel, n_layers, final_softmax),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, d0), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((tile_n, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x, *weight_args)


def fused_mlp_padded(params: list, x: jnp.ndarray,
                     tile_n: int = DEFAULT_TILE_N,
                     final_softmax: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """fused_mlp with automatic row padding/truncation."""
    n = x.shape[0]
    pad = (-n) % tile_n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    out = fused_mlp(params, x, tile_n, final_softmax, interpret)
    return out[:n] if pad else out


def vmem_fits(params: list, tile_n: int, d0: int) -> bool:
    """Rough VMEM budget check for the fused kernel."""
    weight_bytes = sum(w.size * 4 + b.size * 4 for w, b in params)
    widest = max([d0] + [w.shape[1] for w, _ in params])
    act_bytes = 2 * tile_n * widest * 4  # double-buffered activations
    return weight_bytes + act_bytes + tile_n * d0 * 4 * 2 < 12 * 1024 * 1024
