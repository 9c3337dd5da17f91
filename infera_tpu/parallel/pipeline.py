"""Distributed query pipeline: the multi-chip execution path.

One jitted step covering BASELINE.json's north-star shape — scan →
batched-inference → filter → distributed shuffle → grouped aggregate — over
a (dp, mp) mesh. This is the TPU analog of a "training step" for this
framework: it exercises every distributed mechanism (sharded compute on the
dp axis, all_to_all exchange, psum reduction) in one compiled program.

Design (SURVEY.md §7.1 distributed layer):
- tables arrive hash-partitioned on the dp axis (row sharding);
- the inference operator runs data-parallel: batch dim sharded over dp, model
  weights replicated (a TP-sharded model would shard the same einsums on mp);
- the shuffle re-partitions rows by group key so each device owns a disjoint
  key range; the grouped aggregate is then purely local;
- a final psum produces global statistics.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .shuffle import _pack_buckets


def mlp_apply(params: list, x: jnp.ndarray) -> jnp.ndarray:
    """Replicated-weight MLP forward (the flagship inference operator)."""
    h = x
    for i, (w, b) in enumerate(params):
        h = jnp.dot(h, w, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32) + b
        if i < len(params) - 1:
            h = jax.nn.relu(h)
    return h


def mlp_apply_tp(params: list, x: jnp.ndarray, axis_name: str = "mp") -> jnp.ndarray:
    """Tensor-parallel 2-layer MLP block (Megatron layout) for models too
    large to replicate: layer-1 weights column-sharded over ``mp`` (each
    device computes a hidden slice, no comms), layer-2 weights row-sharded
    with one psum to reassemble the output. Runs inside shard_map; weights
    arrive pre-sharded (w1 [d_in, h/mp], w2 [h/mp, d_out])."""
    (w1, b1), (w2, b2) = params
    h = jax.nn.relu(
        jnp.dot(x, w1, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32) + b1
    )
    partial = jnp.dot(h, w2, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    out = jax.lax.psum(partial, axis_name)
    return out + b2


def make_tp_inference_step(mesh: Mesh):
    """jitted TP inference: x row-sharded on dp, weights sharded on mp."""
    fn = shard_map(
        lambda p, x: mlp_apply_tp(p, x),
        mesh=mesh,
        in_specs=(((P(None, "mp"), P("mp")), (P("mp", None), P())), P("dp", None)),
        out_specs=P("dp", None),
        check_vma=False,
    )
    return jax.jit(fn)


def make_pp_inference_step(mesh: Mesh, n_stages: int, n_micro: int):
    """GPipe-style pipeline-parallel inference over the ``mp`` axis.

    Each device owns ONE stage's weights (a [d, d] dense layer + relu,
    identical shapes so shard_map stays uniform); microbatches stream
    through the stages via `ppermute`, so at steady state every stage is
    busy on a different microbatch. `n_micro + n_stages - 1` ticks drain
    the pipeline; the last stage's outputs are psum-broadcast (it is the
    only contributor, so the sum IS the value).

    fn(stage_params, x) -> y with
      stage_params = (W [n_stages, d, d], B [n_stages, d]) sharded on mp
      x [n_micro, mb, d] replicated → y [n_micro, mb, d] replicated.
    """
    fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def local(stage_params, x):
        w, b = stage_params          # [1, d, d], [1, d] — this stage's slice
        w = w[0]
        b = b[0]
        s = jax.lax.axis_index("mp")
        mb, d = x.shape[1], x.shape[2]
        ticks = n_micro + n_stages - 1

        def tick(carry, t):
            act_recv, ys = carry
            inject = x[jnp.clip(t, 0, n_micro - 1)]
            act_in = jnp.where(s == 0, inject, act_recv)
            out = jax.nn.relu(
                jnp.dot(act_in, w, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32) + b)
            nxt = jax.lax.ppermute(out, "mp", fwd_perm)
            done_idx = t - (n_stages - 1)
            is_done = (s == n_stages - 1) & (done_idx >= 0)
            ys = jax.lax.cond(
                is_done,
                lambda ys: ys.at[jnp.clip(done_idx, 0, n_micro - 1)].set(out),
                lambda ys: ys,
                ys,
            )
            return (nxt, ys), None

        init = (jnp.zeros((mb, d), jnp.float32),
                jnp.zeros((n_micro, mb, d), jnp.float32))
        (_, ys), _ = jax.lax.scan(tick, init, jnp.arange(ticks))
        # only the last stage holds real outputs → psum broadcasts them
        return jax.lax.psum(
            jnp.where(s == n_stages - 1, ys, jnp.zeros_like(ys)), "mp")

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=((P("mp", None, None), P("mp", None)), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_ep_inference_step(mesh: Mesh, n_experts: int, cap: int):
    """Expert-parallel (MoE-style) inference over the ``mp`` axis.

    Expert weights live one-per-device; rows route to their expert via the
    same fixed-capacity bucket-pack + `all_to_all` exchange the distributed
    shuffle uses, each device applies its expert layer, and a reverse
    `all_to_all` returns results to the rows' home devices.

    fn(expert_w, expert_b, x, expert_id) -> y with
      expert_w [n_experts, d, d], expert_b [n_experts, d] sharded on mp;
      x [N, d], expert_id [N] sharded on mp (row sharding; `cap` bounds
      rows any single (src, expert) pair may exchange).
    """

    def local(ew, eb, x, eid):
        ew = ew[0]
        eb = eb[0]
        part = (eid % n_experts).astype(jnp.int32)
        packed, send_valid = _pack_buckets(part, [x], n_experts, cap)
        recv_valid = jax.lax.all_to_all(send_valid, "mp", 0, 0)
        recv_x = jax.lax.all_to_all(packed[0], "mp", 0, 0)
        flat = recv_x.reshape(-1, x.shape[1])
        y = jax.nn.relu(
            jnp.dot(flat, ew, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32) + eb)
        y = jnp.where(recv_valid.reshape(-1)[:, None], y, 0.0)
        # reverse exchange: results go back to the source device in the
        # same bucket slots, then unpack to original row order
        back = jax.lax.all_to_all(y.reshape(recv_x.shape), "mp", 0, 0)
        back_valid = jax.lax.all_to_all(recv_valid, "mp", 0, 0)
        # _pack_buckets places a row at (its partition, its stable rank
        # within that partition); recompute the rank to invert the packing
        rank = _bucket_slots(part, n_experts)
        slot = jnp.minimum(rank, cap - 1)
        out = back[part, slot]
        valid = back_valid[part, slot] & (rank < cap)
        routed = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), "mp")
        return jnp.where(valid[:, None], out, 0.0), routed

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("mp", None, None), P("mp", None), P("mp", None), P("mp")),
        out_specs=(P("mp", None), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _bucket_slots(part: jnp.ndarray, n_buckets: int) -> jnp.ndarray:
    """Slot index of each row within its destination bucket (stable order) —
    must mirror shuffle._pack_buckets' placement."""
    onehot = (part[:, None] == jnp.arange(n_buckets)[None, :]).astype(jnp.int32)
    pos = jnp.cumsum(onehot, axis=0) - onehot
    return jnp.take_along_axis(pos, part[:, None], axis=1)[:, 0]


def make_distributed_query_step(mesh: Mesh, n_groups: int, cap: int,
                                skew_split: bool = False,
                                hot_factor: float = 4.0):
    """Build the jitted distributed step.

    fn(params, x, keys) -> (group_sums[n_groups], group_counts[n_groups],
    total_selected) where:
      - x: [N, d] feature rows, row-sharded over dp
      - keys: [N] int32 group keys, row-sharded over dp
      - filter: rows whose class-0 score > median-ish threshold survive
      - shuffle: rows move to device (key % dp), then each device aggregates
        its own keys; outputs are replicated via psum.
    """
    ndev = mesh.shape["dp"]

    def local_step(params, x, keys):
        # 1. batched inference (dp-sharded batch, replicated weights)
        scores = mlp_apply(params, x)  # [n_local, out]
        pred = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        score0 = scores[:, 0]

        # 2. filter → selection mask (static shapes: mask, don't compact)
        sel = score0 > 0.0

        # 3. shuffle rows to the owner of their group key; optional
        # histogram-based hot-partition splitting (final psum merges the
        # split partials, so decomposable aggregates stay exact)
        part = (keys % ndev).astype(jnp.int32)
        if skew_split:
            from .shuffle import skew_split_partitions

            part = skew_split_partitions(part, ndev, "dp", hot_factor)
        payload = [
            keys.astype(jnp.int32),
            jnp.where(sel, score0, 0.0),
            sel.astype(jnp.float32),
        ]
        packed, send_valid = _pack_buckets(part, payload, ndev, cap)
        recv_valid = jax.lax.all_to_all(send_valid, "dp", 0, 0)
        recv = [jax.lax.all_to_all(b, "dp", 0, 0) for b in packed]
        rkeys = recv[0].reshape(-1)
        rscore = recv[1].reshape(-1)
        rsel = recv[2].reshape(-1)
        rvalid = recv_valid.reshape(-1)

        # 4. local grouped aggregate over owned keys (masked segment-sum)
        w = jnp.where(rvalid, rsel, 0.0)
        group = jnp.where(rvalid, rkeys % n_groups, 0)
        sums = jax.ops.segment_sum(rscore * w, group, num_segments=n_groups)
        counts = jax.ops.segment_sum(w, group, num_segments=n_groups)

        # 5. global reduction: each device owns disjoint keys, psum gathers
        sums = jax.lax.psum(sums, "dp")
        counts = jax.lax.psum(counts, "dp")
        total = jax.lax.psum(jnp.sum(sel.astype(jnp.float32)), "dp")
        del pred
        return sums, counts, total

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("dp", None), P("dp")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def example_inputs(mesh: Mesh, n_rows: int, in_dim: int, out_dim: int,
                   n_groups: int, seed: int = 0):
    """Sharded example inputs for the distributed step."""
    import numpy as np

    rng = np.random.default_rng(seed)
    hidden = 32
    params = [
        (jnp.asarray(rng.standard_normal((in_dim, hidden)), jnp.float32) * 0.3,
         jnp.zeros((hidden,), jnp.float32)),
        (jnp.asarray(rng.standard_normal((hidden, out_dim)), jnp.float32) * 0.3,
         jnp.zeros((out_dim,), jnp.float32)),
    ]
    x = jnp.asarray(rng.standard_normal((n_rows, in_dim)), jnp.float32)
    keys = jnp.asarray(rng.integers(0, n_groups, n_rows), jnp.int32)
    row = NamedSharding(mesh, P("dp"))
    row2 = NamedSharding(mesh, P("dp", None))
    x = jax.device_put(x, row2)
    keys = jax.device_put(keys, row)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    return params, x, keys
