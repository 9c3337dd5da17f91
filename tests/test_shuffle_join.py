"""Big×big shuffle hash join (sql/shuffle_join_plan.py): fact×fact joins
with duplicate, skewed integer keys execute via per-key pre-aggregation —
exact counts/sums vs the host oracle, path=shuffle_join[_mesh], skew never
expands into pairs."""

import numpy as np
import pytest

from infera_tpu.sql import Connection

N = 1 << 16  # per side — big enough for the plan, small enough to oracle


def _mk(conn, skewed=False):
    # A: keys 0..199 uniform + (skewed) a hot key 7 taking ~30% of rows
    if skewed:
        conn.execute(
            f"create table fa as select case when x % 10 < 3 then 7 "
            f"else x % 200 end as k, x % 5 as g, (x % 40)::float / 4.0 as v "
            f"from range({N}) r(x)")
        conn.execute(
            f"create table fb as select case when x % 7 < 2 then 7 "
            f"else (x * 3) % 250 end as k, (x % 90)::float / 9.0 as w "
            f"from range({N}) r(x)")
    else:
        conn.execute(f"create table fa as select x % 200 as k, x % 5 as g, "
                     f"(x % 40)::float / 4.0 as v from range({N}) r(x)")
        conn.execute(f"create table fb as select (x * 3) % 250 as k, "
                     f"(x % 90)::float / 9.0 as w from range({N}) r(x)")


def _oracle(skewed=False):
    x = np.arange(N)
    if skewed:
        ka = np.where(x % 10 < 3, 7, x % 200)
        kb = np.where(x % 7 < 2, 7, (x * 3) % 250)
    else:
        ka = x % 200
        kb = (x * 3) % 250
    g = x % 5
    v = (x % 40).astype(np.float64) / 4.0
    w = (x % 90).astype(np.float64) / 9.0
    return ka, kb, g, v, w


def _b_per_key(kb, w, bmask=None):
    sel = np.ones(len(kb), bool) if bmask is None else bmask
    cnt = np.bincount(kb[sel], minlength=300).astype(np.int64)
    sw = np.zeros(300)
    np.add.at(sw, kb[sel], w[sel])
    mn = np.full(300, np.inf)
    np.minimum.at(mn, kb[sel], w[sel])
    mx = np.full(300, -np.inf)
    np.maximum.at(mx, kb[sel], w[sel])
    return cnt, sw, mn, mx


@pytest.mark.parametrize("skewed", [False, True])
def test_shuffle_join_grouped(skewed):
    conn = Connection()
    _mk(conn, skewed)
    q = ("select g, count(*) c, sum(v) sv, sum(w) sw, avg(w) aw, "
         "min(w) mnw, max(v) mxv from fa join fb on fa.k = fb.k "
         "group by g order by g")
    rows = conn.execute(q).rows
    assert conn._exec_path == "shuffle_join"
    ka, kb, g, v, w = _oracle(skewed)
    cnt, swk, mnk, mxk = _b_per_key(kb, w)
    assert len(rows) == 5
    for key, c, sv, sw, aw, mnw, mxv in rows:
        m = g == key
        pairs = int(cnt[ka[m]].sum())
        assert c == pairs  # EXACT pair count (limb-int path)
        assert sv == pytest.approx((v[m] * cnt[ka[m]]).sum(), rel=1e-6)
        assert sw == pytest.approx(swk[ka[m]].sum(), rel=1e-6)
        assert aw == pytest.approx(swk[ka[m]].sum() / pairs, rel=1e-6)
        live = m & (cnt[ka] > 0)
        assert mnw == pytest.approx(mnk[ka[live]].min())
        assert mxv == pytest.approx(v[live].max())


def test_shuffle_join_where_both_sides():
    conn = Connection()
    _mk(conn)
    q = ("select count(*) c, sum(v) sv, sum(w) sw from fa join fb "
         "on fa.k = fb.k where v > 2.0 and w < 8.0")
    rows = conn.execute(q).rows
    assert conn._exec_path == "shuffle_join"
    ka, kb, g, v, w = _oracle()
    am = v > 2.0
    cnt, swk, _, _ = _b_per_key(kb, w, w < 8.0)
    c, sv, sw = rows[0]
    assert c == int(cnt[ka[am]].sum())
    assert sv == pytest.approx((v[am] * cnt[ka[am]]).sum(), rel=1e-6)
    assert sw == pytest.approx(swk[ka[am]].sum(), rel=1e-6)


def test_shuffle_join_host_parity(monkeypatch):
    """Row-exact agreement with the host join on a small instance."""
    conn = Connection()
    _mk(conn)
    q = ("select g, count(*) c, sum(w) sw from fa join fb on fa.k = fb.k "
         "group by g order by g")
    rows = conn.execute(q).rows
    assert conn._exec_path == "shuffle_join"
    host = Connection()
    host.catalog = conn.catalog
    import infera_tpu.sql.shuffle_join_plan as sjp

    monkeypatch.setattr(sjp, "try_execute_shuffle_join",
                        lambda *a, **k: None)
    hrows = host.execute(q).rows
    assert host._exec_path != "shuffle_join"
    assert len(rows) == len(hrows)
    for a, b in zip(rows, hrows):
        assert a[0] == b[0] and a[1] == b[1]
        assert a[2] == pytest.approx(b[2], rel=1e-6)


def test_shuffle_join_mesh():
    """The same plan executes across the dp mesh: B pre-reduced per device
    before the all_to_all exchange, group partials psum over ICI."""
    conn = Connection()
    conn.set_mesh(8)
    _mk(conn, skewed=True)
    q = ("select g, count(*) c, sum(v) sv, sum(w) sw, min(w) mnw "
         "from fa join fb on fa.k = fb.k group by g order by g")
    rows = conn.execute(q).rows
    assert conn._exec_path == "shuffle_join_mesh"
    ka, kb, g, v, w = _oracle(skewed=True)
    cnt, swk, mnk, _ = _b_per_key(kb, w)
    for key, c, sv, sw, mnw in rows:
        m = g == key
        assert c == int(cnt[ka[m]].sum())
        assert sv == pytest.approx((v[m] * cnt[ka[m]]).sum(), rel=1e-6)
        assert sw == pytest.approx(swk[ka[m]].sum(), rel=1e-6)
        live = m & (cnt[ka] > 0)
        assert mnw == pytest.approx(mnk[ka[live]].min())


@pytest.mark.parametrize("meshed", [False, True])
def test_shuffle_join_mixed_side_product(meshed):
    """Round 5 (VERDICT r4 item 6): sum(f(a)*g(b)) decomposes through the
    per-key B partials — SUM_a f(a)*sumB_g[k(a)] — instead of declining to
    the host join. Exact vs the numpy pair oracle, both tiers."""
    conn = Connection()
    if meshed:
        conn.set_mesh(8)
    _mk(conn, skewed=True)
    ka, kb, g, v, w = _oracle(skewed=True)
    cnt, sw, _mn, _mx = _b_per_key(kb, w)
    want_path = "shuffle_join_mesh" if meshed else "shuffle_join"

    rows = conn.execute(
        "select sum(v * w), avg(v * w), count(*) from fa "
        "join fb on fa.k = fb.k").rows
    assert conn._exec_path == want_path
    pair_sum = float((v * sw[ka]).sum())
    pair_cnt = int(cnt[ka].sum())
    assert rows[0][2] == pair_cnt
    # f32 value/product pipeline: suite-standard 1e-6 relative bar
    assert rows[0][0] == pytest.approx(pair_sum, rel=1e-6)
    assert rows[0][1] == pytest.approx(pair_sum / pair_cnt, rel=1e-6)

    rows = conn.execute(
        "select g, sum(v * 2.0 * w) s, sum(v) sv from fa join fb "
        "on fa.k = fb.k group by g order by g").rows
    assert conn._exec_path == want_path
    for kg, s, sv in rows:
        m = g == kg
        assert s == pytest.approx(float((2.0 * v[m] * sw[ka[m]]).sum()),
                                  rel=1e-6)
        assert sv == pytest.approx(float((v[m] * cnt[ka[m]]).sum()),
                                   rel=1e-6)


def test_shuffle_join_ineligible_shapes():
    """Non-equi, DISTINCT, mixed-side WHERE, or small inputs stay on the
    host path with identical semantics."""
    conn = Connection()
    conn.execute("create table sa as select x % 5 as k, x as v "
                 "from range(100) r(x)")
    conn.execute("create table sb as select x % 5 as k, x as w "
                 "from range(100) r(x)")
    rows = conn.execute("select count(*) from sa join sb on sa.k = sb.k").rows
    assert conn._exec_path != "shuffle_join"  # too small
    assert rows[0][0] == 100 * 20
    _mk(conn)
    # mixed-side WHERE conjunct (v and w in one comparison) → host
    rows = conn.execute(
        "select count(*) from fa join fb on fa.k = fb.k "
        "where v + w > 100.0").rows
    assert conn._exec_path != "shuffle_join"


def test_count_nullable_arg_stays_off_shuffle_join():
    """Review r4: count(expr) only equals the pair count when the argument
    can never be NULL — a nullable argument must take the host join."""
    conn = Connection()
    conn.execute(f"create table na as select x % 50 as k from range({N}) r(x)")
    conn.execute(f"create table nb as select x % 50 as k, "
                 f"case when x % 2 = 0 then NULL else (x * 1.0)::float end "
                 f"as w from range(4096) r(x)")
    rows = conn.execute(
        "select count(w) from na join nb on na.k = nb.k").rows
    assert conn._exec_path != "shuffle_join"
    # host oracle: only non-NULL w pairs count
    per_key_nonnull = np.bincount((np.arange(4096) % 50)[
        np.arange(4096) % 2 == 1], minlength=50)
    ka = np.arange(N) % 50
    assert rows[0][0] == int(per_key_nonnull[ka].sum())


def test_zero_pair_join_renders_null():
    """Review r4: a join with no matching pairs returns NULL aggregates
    (not 0.0 / inf identities)."""
    conn = Connection()
    conn.execute(f"create table za as select x % 50 as k, "
                 f"(x * 1.0)::float as v from range({N}) r(x)")
    conn.execute(f"create table zb as select 1000 + x % 50 as k, "
                 f"(x * 2.0)::float as w from range({N}) r(x)")
    rows = conn.execute(
        "select count(*), sum(w), min(w), avg(w) from za join zb "
        "on za.k = zb.k").rows
    assert conn._exec_path == "shuffle_join"
    assert rows[0] == (0, None, None, None)
