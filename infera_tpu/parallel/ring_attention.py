"""Ring attention: sequence-parallel exact attention over the ``mp`` axis.

The sequence shards across devices (each holds one contiguous chunk of
Q/K/V); K/V blocks rotate around the ring via `ppermute` while each device
folds every block into a numerically-stable online softmax (flash-attention
style running max / denominator / numerator). After ``mp`` ring steps every
query chunk has attended to the FULL sequence without any device ever
holding more than one K/V chunk — the memory per device is O(seq/mp), which
is the point of sequence parallelism for long contexts.

Exact (not approximate): the online-softmax recurrence reproduces dense
softmax(QKᵀ/√d)·V up to float reassociation. Supports causal masking via
global positions derived from each block's ring offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

_NEG = -1e30


def _ring_attention_local(q, k, v, *, n_dev: int, causal: bool,
                          axis_name: str = "mp"):
    """Per-device body (inside shard_map). q/k/v: [chunk, d] local shards."""
    chunk, d = q.shape
    scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(d))
    s = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    q_pos = s * chunk + jnp.arange(chunk)

    def step(carry, t):
        k_cur, v_cur, m, l, acc = carry
        # the K/V block now resident arrived from device (s - t) mod n_dev
        src = jnp.mod(s - t, n_dev)
        k_pos = src * chunk + jnp.arange(chunk)
        scores = jnp.dot(q, k_cur.T, precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32) * scale
        if causal:
            scores = jnp.where(k_pos[None, :] > q_pos[:, None], _NEG, scores)
        m_new = jnp.maximum(m, jnp.max(scores, axis=1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[:, None])
        l_new = l * corr + jnp.sum(p, axis=1)
        acc_new = acc * corr[:, None] + jnp.dot(
            p, v_cur, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m_new, l_new, acc_new), None

    init = (k, v,
            jnp.full((chunk,), _NEG, jnp.float32),
            jnp.zeros((chunk,), jnp.float32),
            jnp.zeros((chunk, d), jnp.float32))
    (k_f, v_f, m, l, acc), _ = jax.lax.scan(step, init, jnp.arange(n_dev))
    del k_f, v_f, m
    return acc / jnp.where(l == 0, 1.0, l)[:, None]


def make_ring_attention_step(mesh: Mesh, causal: bool = False):
    """jitted fn(q, k, v) -> out, all [seq, d] sharded over ``mp`` on the
    sequence axis (seq must divide by mesh.shape['mp'])."""
    n_dev = mesh.shape["mp"]

    fn = shard_map(
        lambda q, k, v: _ring_attention_local(
            q, k, v, n_dev=n_dev, causal=causal),
        mesh=mesh,
        in_specs=(P("mp", None), P("mp", None), P("mp", None)),
        out_specs=P("mp", None),
        check_vma=False,
    )
    return jax.jit(fn)
