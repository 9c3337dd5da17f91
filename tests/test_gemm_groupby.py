"""Direct coverage of ops/gemm_groupby.py: one-hot matmul segment
reductions vs numpy references, including padding edges, multi-slot
batching, masks, and the exact int32 hi/lo-split min/max."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infera_tpu.ops import gemm_groupby as GG


@pytest.mark.parametrize("n,G", [(1 << 17, 64), ((1 << 17) + 777, 13),
                                 (4096, 512)])
def test_segment_sum_matches_numpy(n, G):
    rng = np.random.default_rng(n % 97)
    keys = rng.integers(0, G, n).astype(np.int32)
    vals = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(GG.segment_sum(jnp, jax, jnp.asarray(vals),
                                    jnp.asarray(keys), G))
    want = np.zeros(G)
    np.add.at(want, keys, vals.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_segment_sum_multi_slot():
    rng = np.random.default_rng(0)
    n, G = 100000, 32
    keys = rng.integers(0, G, n).astype(np.int32)
    a = rng.standard_normal(n).astype(np.float32)
    outs = GG.segment_sum(jnp, jax, [jnp.asarray(a), jnp.asarray(a * 3)],
                          jnp.asarray(keys), G)
    w = np.zeros(G)
    np.add.at(w, keys, a.astype(np.float64))
    np.testing.assert_allclose(np.asarray(outs[0]), w, atol=5e-3)
    np.testing.assert_allclose(np.asarray(outs[1]), 3 * w, atol=2e-2)


def test_segment_minmax_with_masks_and_empty_groups():
    rng = np.random.default_rng(1)
    n, G = 50000, 16
    keys = rng.integers(0, G - 2, n).astype(np.int32)  # last 2 groups empty
    vals = rng.standard_normal(n).astype(np.float32)
    m = vals > 0.5
    (mns,), (mxs,) = GG.segment_minmax(jnp, jax, [jnp.asarray(vals)],
                                       jnp.asarray(keys), G,
                                       [jnp.asarray(m)])
    mns, mxs = np.asarray(mns), np.asarray(mxs)
    for g in range(G):
        sel = (keys == g) & m
        if sel.any():
            assert mns[g] == vals[sel].min()
            assert mxs[g] == vals[sel].max()
        else:
            assert mns[g] == np.inf and mxs[g] == -np.inf


def test_segment_minmax_int32_exact_beyond_f32():
    """Values above 2^24 (where an f32 reduction would round) stay exact
    through the hi/lo split."""
    rng = np.random.default_rng(2)
    n, G = 40000, 8
    keys = rng.integers(0, G, n).astype(np.int32)
    k = rng.integers(-(2**31), 2**31 - 1, n).astype(np.int32)
    # plant adjacent values that differ below f32 resolution at 2^30
    k[0], k[1] = 2**30 + 1, 2**30 + 2
    keys[0] = keys[1] = 0
    mn, mx = GG.segment_minmax_int32(jnp, jax, jnp.asarray(k),
                                     jnp.asarray(keys), G,
                                     jnp.asarray(np.ones(n, bool)))
    wmn = np.full(G, 2**31 - 1, np.int64)
    wmx = np.full(G, -(2**31), np.int64)
    np.minimum.at(wmn, keys, k.astype(np.int64))
    np.maximum.at(wmx, keys, k.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(mn, np.int64), wmn)
    np.testing.assert_array_equal(np.asarray(mx, np.int64), wmx)


def test_eligibility_bounds():
    assert GG.eligible(1 << 17, 512)
    assert not GG.eligible(1 << 17, 513)
    assert not GG.eligible((1 << 17) - 1, 8)
