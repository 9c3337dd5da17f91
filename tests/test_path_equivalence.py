"""Property tests: the device relational paths must agree with the host
paths on randomized inputs (the device dispatch is an optimization, never a
semantic change)."""

import numpy as np
import pytest

from infera_tpu.columnar import Column
from infera_tpu.columnar import types as T
from infera_tpu.ops.aggregate import group_ids_host
from infera_tpu.ops.device_groupby import group_ids_device
from infera_tpu.ops.device_join import inner_join_indices_device


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n,domain", [(100, 5), (1000, 100), (3000, 2)])
def test_groupby_paths_agree(seed, n, domain):
    rng = np.random.default_rng(seed)
    keys = rng.integers(-domain, domain, n).astype(np.int64)
    col = Column(keys, T.BIGINT)
    hg, hf = group_ids_host([col], n)
    dg, df = group_ids_device([col], n)
    # same partition of rows into groups (ids may be numbered differently)
    assert len(hf) == len(df)
    h_sets = {}
    d_sets = {}
    for i in range(n):
        h_sets.setdefault(hg[i], set()).add(i)
        d_sets.setdefault(dg[i], set()).add(i)
    assert sorted(map(frozenset, h_sets.values())) == sorted(map(frozenset, d_sets.values()))


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("nl,nr,domain", [(50, 70, 10), (500, 100, 600), (64, 64, 1)])
def test_join_paths_agree(seed, nl, nr, domain):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, domain, nl).astype(np.int64)
    rk = rng.integers(0, domain, nr).astype(np.int64)
    li, ri = inner_join_indices_device(lk, rk)
    got = sorted(zip(li.tolist(), ri.tolist()))
    want = sorted(
        (i, j) for i in range(nl) for j in range(nr) if lk[i] == rk[j]
    )
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_sort_paths_agree(seed):
    from infera_tpu.ops.sort import argsort_device

    rng = np.random.default_rng(seed)
    n = 500
    k1 = rng.integers(0, 50, n).astype(np.int64)
    k2 = rng.standard_normal(n).astype(np.float32)
    dev = argsort_device([k1, k2], [True, False], [False, False], [None, None])
    # stable reference via lexsort (last key primary)
    host = np.lexsort((-k2, k1))
    np.testing.assert_array_equal(
        np.stack([k1[dev], k2[dev]]), np.stack([k1[host], k2[host]])
    )


def test_group_keys_beyond_int32_do_not_merge():
    """Regression: int64 key encodings used to truncate to their low 32 bits
    on device transfer (x64 disabled), merging keys like the f64 bit
    patterns of 1.45 and 1.95."""
    from infera_tpu.columnar import Column
    from infera_tpu.columnar import types as T
    from infera_tpu.ops.device_groupby import group_ids_device

    vals = np.tile(np.array([1.45, 1.95, 0.2, 0.7], np.float64), 4096)
    col = Column(vals, T.DOUBLE)
    dense, firsts = group_ids_device([col], len(vals))
    assert len(firsts) == 4
    # rows with equal values share an id; distinct values never do
    for v in (1.45, 1.95, 0.2, 0.7):
        ids = set(dense[vals == v].tolist())
        assert len(ids) == 1
    assert len({dense[vals == v][0] for v in (1.45, 1.95, 0.2, 0.7)}) == 4


def test_join_keys_beyond_int32_do_not_collide():
    from infera_tpu.columnar import Column
    from infera_tpu.columnar import types as T
    from infera_tpu.ops.device_join import device_inner_join_indices

    # two BIGINT keys sharing low 32 bits
    base = np.int64(5) << 33
    lk = np.array([base + 7, 7, base + 7, 123], np.int64)
    rk = np.array([7, base + 7], np.int64)
    li, ri = device_inner_join_indices(
        [Column(lk, T.BIGINT)], [Column(rk, T.BIGINT)])
    pairs = sorted(zip(li.tolist(), ri.tolist()))
    assert pairs == [(0, 1), (1, 0), (2, 1)]


def test_device_order_by_wide_ints_exact():
    """Regression: device ORDER BY squeezed keys to f32 (exact only to
    2^24); wide ints now sort via 2^24-radix digit levels."""
    from infera_tpu.ops.sort import argsort_device

    rng = np.random.default_rng(0)
    keys = rng.integers(-2**52, 2**52, size=40000).astype(np.int64)
    keys[:100] = np.arange(100) + (1 << 40)  # adjacent wide values
    order = argsort_device([keys], [True], [False], [None])
    np.testing.assert_array_equal(keys[order], np.sort(keys, kind="stable"))


def test_device_order_by_f64_close_values():
    from infera_tpu.ops.sort import argsort_device

    keys = np.array([1.0 + 1e-9, 1.0, 1.0 + 2e-9, 0.5] * 10000, np.float64)
    order = argsort_device([keys], [True], [False], [None])
    np.testing.assert_array_equal(keys[order], np.sort(keys, kind="stable"))
