"""Fused device SQL execution (device_plan): results must match the host
path exactly for eligible queries, and ineligible queries must fall back."""

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.sql import Connection
from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS


@pytest.fixture()
def conn_big(model_dir, clean_registry):
    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(
        f"create table big as select x % 7 as g, (x % 100)::float / 10.0 as f1, "
        f"((x + 3) % 50)::float / 5.0 as f2, ((x * 7) % 30)::float / 3.0 as f3 "
        f"from range({n}) r(x)"
    )
    it.load_model("linear", f"{model_dir}/linear.onnx")
    return conn, n


def _host_frame(n):
    x = np.arange(n, dtype=np.int64)
    g = x % 7
    f1 = (x % 100).astype(np.float32) / np.float32(10.0)
    f2 = ((x + 3) % 50).astype(np.float32) / np.float32(5.0)
    f3 = ((x * 7) % 30).astype(np.float32) / np.float32(3.0)
    return g, f1, f2, f3


def test_fused_global_aggregate_with_predict(conn_big):
    conn, n = conn_big
    rows = conn.execute(
        "select count(*), avg(infera_predict('linear', f1, f2, f3)), "
        "sum(f1) from big"
    ).rows
    g, f1, f2, f3 = _host_frame(n)
    pred = 2 * f1 - f2 + 0.5 * f3 + np.float32(0.25)
    assert rows[0][0] == n
    assert rows[0][1] == pytest.approx(float(pred.mean()), rel=1e-4)
    assert rows[0][2] == pytest.approx(float(f1.sum()), rel=1e-4)


def test_fused_filtered_groupby_predict(conn_big):
    conn, n = conn_big
    rows = conn.execute(
        "select g, count(*) c, avg(infera_predict('linear', f1, f2, f3)) p "
        "from big where f1 > 5.0 group by g order by g"
    ).rows
    g, f1, f2, f3 = _host_frame(n)
    pred = 2 * f1 - f2 + 0.5 * f3 + np.float32(0.25)
    sel = f1 > 5.0
    assert len(rows) == 7
    for key, c, p in rows:
        mask = sel & (g == key)
        assert c == int(mask.sum())
        assert p == pytest.approx(float(pred[mask].mean()), rel=1e-4)


def test_fused_min_max(conn_big):
    conn, n = conn_big
    rows = conn.execute("select min(f2), max(f3) from big where g = 3").rows
    g, f1, f2, f3 = _host_frame(n)
    mask = g == 3
    assert rows[0][0] == pytest.approx(float(f2[mask].min()))
    assert rows[0][1] == pytest.approx(float(f3[mask].max()))


def test_integer_sum_exact(conn_big):
    conn, n = conn_big
    # integer sums must be exact — since round 3 they fuse on device via
    # limb sums (sql/int_agg.py) instead of falling back to the host
    rows = conn.execute("select sum(g) from big").rows
    assert conn._exec_path.startswith("device_plan")
    g, *_ = _host_frame(n)
    assert rows[0][0] == int(g.sum())


def test_small_tables_stay_on_host(model_dir, clean_registry):
    conn = Connection()
    conn.execute("create table small as select 1.0::float f1 from range(10) r(x)")
    rows = conn.execute("select count(*), sum(f1) from small").rows
    assert rows[0] == (10, 10.0)


def test_fused_matches_volatile_semantics(conn_big):
    """After unload, a fused-eligible query must fail like the host path
    (the model is resolved per execution, never cached in a stale plan)."""
    conn, n = conn_big
    conn.execute("select avg(infera_predict('linear', f1, f2, f3)) from big")
    it.unload_model("linear")
    with pytest.raises(Exception) as ei:
        conn.execute("select avg(infera_predict('linear', f1, f2, f3)) from big")
    assert "Model not found: linear" in str(ei.value)


def test_explain_reports_fused_plan(conn_big):
    conn, n = conn_big
    rows = conn.execute(
        "explain select g, count(*), avg(infera_predict('linear', f1, f2, f3)) "
        "from big where f1 > 5.0 group by g"
    ).rows
    text = "\n".join(r[0] for r in rows)
    assert "fused device plan" in text
    assert "SCAN big" in text
    # integer sum over a plain column now fuses (exact limb sums, round 3)
    rows = conn.execute("explain select sum(g) from big").rows
    text = "\n".join(r[0] for r in rows)
    assert "fused device plan" in text
    # ... but integer EXPRESSIONS still need the host's exact arithmetic
    rows = conn.execute("explain select sum(g * 2) from big").rows
    text = "\n".join(r[0] for r in rows)
    assert "host/hybrid operators" in text


def test_fused_multikey_groupby(conn_big):
    """Two GROUP BY keys fuse via the mixed-radix combined key."""
    conn, n = conn_big
    conn.execute(f"create table mk as select x % 5 as g, x % 3 as h, "
                 f"(x % 100)::float / 10.0 as f1 from range({n}) r(x)")
    text = "\n".join(r[0] for r in conn.execute(
        "explain select g, h, count(*), avg(f1) from mk group by g, h").rows)
    assert "fused device plan" in text
    rows = conn.execute(
        "select g, h, count(*) c, avg(f1) a from mk group by g, h "
        "order by g, h").rows
    x = np.arange(n, dtype=np.int64)
    g, h = x % 5, x % 3
    f1 = (x % 100).astype(np.float32) / np.float32(10.0)
    assert len(rows) == 15
    for kg, kh, c, a in rows:
        m = (g == kg) & (h == kh)
        assert c == int(m.sum())
        assert a == pytest.approx(float(f1[m].mean()), rel=1e-4)


def test_fused_multikey_three_keys_with_predict(conn_big):
    conn, n = conn_big
    rows = conn.execute(
        "select g, count(*), avg(infera_predict('linear', f1, f2, f3)) "
        "from big where f2 < 8.0 group by g order by g").rows
    assert len(rows) == 7  # sanity that base fixture still works
    # c = (x // 8) % 4 spelled with float ops that stay integral (SQL '/'
    # is float division), so the fused plan's integer-key guard passes
    conn.execute(f"create table mk3 as select x % 4 as a, x % 2 as b, "
                 f"(x % 32 - x % 8) / 8 as c, (x % 100)::float / 10.0 as f1, "
                 f"((x + 3) % 50)::float / 5.0 as f2, "
                 f"((x * 7) % 30)::float / 3.0 as f3 from range({n}) r(x)")
    rows = conn.execute(
        "select a, b, c, count(*), avg(infera_predict('linear', f1, f2, f3)) "
        "from mk3 group by a, b, c order by a, b, c").rows
    x = np.arange(n, dtype=np.int64)
    a, b, cc = x % 4, x % 2, (x // 8) % 4
    f1 = (x % 100).astype(np.float32) / np.float32(10.0)
    f2 = ((x + 3) % 50).astype(np.float32) / np.float32(5.0)
    f3 = ((x * 7) % 30).astype(np.float32) / np.float32(3.0)
    pred = 2 * f1 - f2 + 0.5 * f3 + np.float32(0.25)
    assert len(rows) == 16
    for ka, kb, kc, cnt, p in rows:
        m = (a == ka) & (b == kb) & (cc == kc)
        assert cnt == int(m.sum())
        assert p == pytest.approx(float(pred[m].mean()), rel=1e-4)


def test_fused_predict_multi_list_element(conn_big, model_dir):
    """infera_predict_multi_list(...)[k] fuses as the model's k-th output
    column (identity model → [k]-th feature)."""
    conn, n = conn_big
    it.load_model("multi", f"{model_dir}/multi_output.onnx")
    text = "\n".join(r[0] for r in conn.execute(
        "explain select avg(infera_predict_multi_list('multi', f1, f2, f3, f1)[2]) "
        "from big").rows)
    assert "fused device plan" in text
    rows = conn.execute(
        "select avg(infera_predict_multi_list('multi', f1, f2, f3, f1)[2]), "
        "count(*) from big").rows
    _, f1, f2, f3 = _host_frame(n)
    assert rows[0][0] == pytest.approx(float(f2.mean()), rel=1e-4)
    assert rows[0][1] == n


def test_fractional_key_falls_back_to_host(conn_big):
    """Float GROUP BY keys with fractional values must keep host semantics
    (the device int bucketing would merge 1.2 and 1.7)."""
    conn, n = conn_big
    conn.execute(f"create table fk as select (x % 2)::float + 0.2 + (x % 4) / 2 * 0.5 "
                 f"as g, (x % 10)::float as f1 from range({n}) r(x)")
    rows = conn.execute(
        "select g, count(*) from fk group by g order by g").rows
    x = np.arange(n, dtype=np.int64)
    g = (x % 2).astype(np.float64) + 0.2 + (x % 4) / 2 * 0.5
    keys = sorted(set(np.round(g, 6)))
    assert len(rows) == len(keys)
    for (kg, c), want in zip(rows, keys):
        assert kg == pytest.approx(want, abs=1e-6)
        assert c == int((np.abs(g - want) < 1e-9).sum())


def _join_probe(monkeypatch):
    """Count fused-join-plan hits (non-None results)."""
    from infera_tpu.sql import device_join_plan

    calls = {"hits": 0}
    orig = device_join_plan.try_execute_join_on_device

    def probed(conn_, sel, analyze_only=False):
        res = orig(conn_, sel, analyze_only)
        if res is not None and not analyze_only:
            calls["hits"] += 1
        return res

    monkeypatch.setattr(device_join_plan, "try_execute_join_on_device", probed)
    return calls


def test_fused_join_aggregate(conn_big, model_dir, monkeypatch):
    """Fact-to-dimension join + grouped aggregate fuses into one program
    and matches the host join exactly (BASELINE config 3 shape)."""
    conn, n = conn_big
    calls = _join_probe(monkeypatch)
    conn.execute("create table dim as select x as k, (x * 2)::float as w, "
                 "x % 3 as cat from range(100) r(x)")
    conn.execute(f"create table fact as select x % 100 as k, x % 7 as g, "
                 f"(x % 40)::float / 4.0 as f1, ((x + 5) % 30)::float / 3.0 as f2, "
                 f"((x * 3) % 20)::float / 2.0 as f3 from range({n}) r(x)")
    q = ("select cat, count(*) c, sum(w) sw, "
         "avg(infera_predict('linear', f1, f2, f3)) p "
         "from fact join dim on fact.k = dim.k group by cat order by cat")
    rows = conn.execute(q).rows
    assert calls["hits"] == 1

    x = np.arange(n)
    k = x % 100
    g = x % 7
    f1 = (x % 40).astype(np.float32) / np.float32(4.0)
    f2 = ((x + 5) % 30).astype(np.float32) / np.float32(3.0)
    f3 = ((x * 3) % 20).astype(np.float32) / np.float32(2.0)
    pred = (2 * f1 - f2 + 0.5 * f3 + np.float32(0.25)).astype(np.float64)
    w = (k * 2).astype(np.float64)
    cat = k % 3
    assert len(rows) == 3
    for kc, c, sw, p in rows:
        m = cat == kc
        assert c == int(m.sum())
        assert sw == pytest.approx(float(w[m].sum()), rel=1e-6)
        assert p == pytest.approx(float(pred[m].mean()), rel=1e-5)


def test_fused_join_partial_match_and_where(conn_big, monkeypatch):
    """INNER semantics: fact rows without a dim match drop; WHERE composes
    with the join filter."""
    conn, n = conn_big
    calls = _join_probe(monkeypatch)
    conn.execute("create table dim2 as select x * 2 as k, (x)::float as w "
                 "from range(50) r(x)")  # only even keys 0..98
    conn.execute(f"create table fact2 as select x % 100 as k, "
                 f"(x % 10)::float as f from range({n}) r(x)")
    rows = conn.execute(
        "select count(*), sum(w), max(f) from fact2 join dim2 "
        "on fact2.k = dim2.k where f < 5.0").rows
    assert calls["hits"] == 1
    x = np.arange(n)
    k = x % 100
    f = (x % 10).astype(np.float64)
    m = (k % 2 == 0) & (f < 5.0)
    w = (k // 2).astype(np.float64)
    assert rows[0][0] == int(m.sum())
    assert rows[0][1] == pytest.approx(float(w[m].sum()), rel=1e-9)
    assert rows[0][2] == pytest.approx(float(f[m].max()))


def test_join_with_duplicate_dim_keys_host_path(conn_big, monkeypatch):
    """Duplicate dimension keys need row expansion — must stay on the host
    join and produce expanded rows."""
    conn, n = conn_big
    calls = _join_probe(monkeypatch)
    conn.execute("create table dup as select x % 10 as k, x as v "
                 "from range(20) r(x)")  # every key twice
    conn.execute(f"create table factd as select x % 10 as k from range({n}) r(x)")
    rows = conn.execute(
        "select count(*) from factd join dup on factd.k = dup.k").rows
    assert calls["hits"] == 0
    assert rows == [(2 * n,)]


def test_fused_having(conn_big):
    """HAVING predicates over aggregates filter fused group results; hidden
    HAVING-only aggregates compute on device."""
    conn, n = conn_big
    rows = conn.execute(
        "select g, count(*) c from big group by g "
        "having avg(f1) > 4.9 and count(*) > 10 order by g").rows
    g, f1, f2, f3 = _host_frame(n)
    want = []
    for key in range(7):
        m = g == key
        if f1[m].mean() > 4.9 and m.sum() > 10:
            want.append((key, int(m.sum())))
    assert rows == want
    assert len(want) > 0  # the predicate actually selects something

    # global aggregate + false HAVING → empty result
    rows = conn.execute(
        "select count(*) from big having count(*) < 0").rows
    assert rows == []
    # HAVING with bare column refs stays on the host path (same result)
    rows = conn.execute(
        "select g, count(*) from big group by g having g >= 5 order by g").rows
    assert [r[0] for r in rows] == [5, 6]


def test_join_int64_fact_keys_beyond_int32_host_path(conn_big, monkeypatch):
    """Fact keys outside int32 would alias mod 2^32 on device (x64 off):
    the fused join must bail to the host path, which answers exactly.
    Regression: 2^32+5 spuriously matched dim id 5 (ADVICE r1, high)."""
    conn, n = conn_big
    calls = _join_probe(monkeypatch)
    conn.execute("create table dimk as select x as k, (x)::float as w "
                 "from range(10) r(x)")
    big_key = (1 << 32) + 5
    conn.execute(
        f"create table factk as select case when x % 2 = 0 then {big_key} "
        f"else 5 end as k from range({n}) r(x)")
    rows = conn.execute(
        "select count(*) from factk join dimk on factk.k = dimk.k").rows
    assert calls["hits"] == 0
    assert rows == [(n // 2,)]


def test_groupby_int64_keys_beyond_int32_host_path(conn_big):
    """Two group keys equal mod 2^32 must stay distinct groups (the device
    collision guard compares post-truncation values, so the plan must bail
    host-side first). Regression: ADVICE r1, low."""
    conn, n = conn_big
    big_key = 1 << 32  # aliases with 0 under int32 truncation
    conn.execute(
        f"create table bigg as select case when x % 2 = 0 then {big_key} "
        f"else 0 end as g2 from range({n}) r(x)")
    rows = conn.execute(
        "select g2, count(*) from bigg group by g2 order by g2").rows
    assert rows == [(0, n // 2), (big_key, n // 2)]


def test_fused_int_sum_exact_single_device(conn_big):
    """Exact int64 SUM/AVG/MIN/MAX on the single-device path via
    (lo,hi)-word limb sums (sql/int_agg.py) — values past 2^53 where f64
    accumulation would round."""
    conn, n = conn_big
    base = (1 << 41) + 1
    conn.execute(
        f"create table widesd as select x % 3 as g, {base} + x as v, "
        f"-{base} - 3 * x as nv from range({n}) r(x)")
    rows = conn.execute(
        "select g, sum(v), avg(v), min(v), max(v), sum(nv), max(nv) "
        "from widesd group by g order by g").rows
    assert conn._exec_path.startswith("device_plan")
    g = np.arange(n) % 3
    for key, sv, av, mn, mx, snv, mxnv in rows:
        idx = np.flatnonzero(g == key)
        vs = [base + int(i) for i in idx]
        nvs = [-base - 3 * int(i) for i in idx]
        assert sv == sum(vs)
        assert av == pytest.approx(sum(vs) / len(vs), rel=1e-12)
        assert mn == min(vs) and mx == max(vs)
        assert snv == sum(nvs) and mxnv == max(nvs)


def test_fused_int_sum_overflow_raises_single_device(conn_big):
    conn, n = conn_big
    big = (1 << 62) // (n // 2)
    conn.execute(f"create table ovfsd as select {big} as v from range({n}) r(x)")
    with pytest.raises(Exception) as ei:
        conn.execute("select sum(v) from ovfsd")
    assert "Out of Range Error: overflow in SUM(BIGINT)" in str(ei.value)


def test_fused_stddev_variance_single_device(conn_big):
    conn, n = conn_big
    rows = conn.execute(
        "select g, stddev(f1), var_pop(f2), stddev_pop(f3) "
        "from big group by g order by g").rows
    assert conn._exec_path.startswith("device_plan")
    g, f1, f2, f3 = _host_frame(n)
    for key, sd, vp, sp in rows:
        m = g == key
        assert sd == pytest.approx(float(np.std(f1[m], ddof=1)), rel=1e-3)
        assert vp == pytest.approx(float(np.var(f2[m], ddof=0)), rel=1e-3)
        assert sp == pytest.approx(float(np.std(f3[m], ddof=0)), rel=1e-3)


def test_fused_stddev_single_row_group_falls_back(conn_big):
    """stddev over 1-row groups is NULL — the fused path must hand those to
    the host renderer instead of emitting 0."""
    conn, n = conn_big
    conn.execute(f"create table onerow as select x as g, x::float as f "
                 f"from range({n}) r(x)")
    rows = conn.execute(
        "select g, stddev(f) from onerow group by g order by g limit 3").rows
    assert conn._exec_path == "host"
    assert rows[0][1] is None


def test_fused_distinct_aggregates_single_device(conn_big):
    conn, n = conn_big
    conn.execute(f"create table ddsd as select x % 5 as g, (x * 13) % 41 as v "
                 f"from range({n}) r(x)")
    rows = conn.execute(
        "select g, count(distinct v), sum(distinct v), avg(distinct v) "
        "from ddsd group by g order by g").rows
    assert conn._exec_path.startswith("device_plan")
    x = np.arange(n, dtype=np.int64)
    g = x % 5
    v = (x * 13) % 41
    for key, c, s, a in rows:
        vals = np.unique(v[g == key])
        assert c == len(vals)
        assert s == int(vals.sum())
        assert a == pytest.approx(float(vals.mean()), rel=1e-9)


def test_fused_distinct_matches_host_path(conn_big):
    """Same DISTINCT query through the host path (small table) agrees."""
    conn, n = conn_big
    conn.execute(f"create table dd_dev as select x % 4 as g, x % 23 as v "
                 f"from range({n}) r(x)")
    conn.execute("create table dd_host as select * from dd_dev limit 1000")
    dev = conn.execute(
        "select g, count(distinct v), sum(distinct v) from dd_dev "
        "group by g order by g").rows
    assert conn._exec_path.startswith("device_plan")
    host = conn.execute(
        "select g, count(distinct v), sum(distinct v) from dd_host "
        "group by g order by g").rows
    assert conn._exec_path == "host"
    x = np.arange(1000, dtype=np.int64)
    for key, c, s in host:
        vals = np.unique((x % 23)[x % 4 == key])
        assert c == len(vals) and s == int(vals.sum())
    assert len(dev) == 4


def test_fused_min_max_distinct_insensitive(conn_big):
    conn, n = conn_big
    rows = conn.execute(
        "select min(distinct f1), max(distinct f2) from big").rows
    # min/max are distinct-insensitive → plain fused plan (the pallas
    # kernel when INFERA_PALLAS_SQL forces it)
    assert conn._exec_path in ("device_plan", "device_plan_pallas")
    g, f1, f2, f3 = _host_frame(n)
    assert rows[0][0] == pytest.approx(float(f1.min()))
    assert rows[0][1] == pytest.approx(float(f2.max()))


def test_fused_median_single_device(conn_big):
    """Sort-based per-group median on the fused device path (round-3):
    float and small-int columns, odd and even group sizes, with a filter."""
    conn, n = conn_big
    rows = conn.execute(
        "select g, median(f1), median(g) from big where f2 > 1.0 "
        "group by g order by g").rows
    assert conn._exec_path.startswith("device_plan")
    g, f1, f2, f3 = _host_frame(n)
    sel = f2 > 1.0
    assert len(rows) == 7
    for key, mf, mg in rows:
        m = sel & (g == key)
        assert mf == pytest.approx(float(np.median(f1[m].astype(np.float64))))
        assert mg == float(key)


def test_fused_median_matches_host(conn_big):
    conn, n = conn_big
    conn.execute(f"create table mt as select x % 3 as g, "
                 f"((x * 31) % 1000)::float / 8.0 as v from range({n}) r(x)")
    dev = conn.execute(
        "select g, median(v) from mt group by g order by g").rows
    assert conn._exec_path.startswith("device_plan")
    conn.execute("create table mt_small as select * from mt limit 999")
    host = conn.execute(
        "select g, median(v) from mt_small group by g order by g").rows
    assert conn._exec_path == "host"
    x = np.arange(n)
    v = ((x * 31) % 1000).astype(np.float64) / 8.0
    for key, mv in dev:
        assert mv == pytest.approx(float(np.median(v[x % 3 == key])))
    assert len(host) == 3


def test_fused_mode_single_device(conn_big):
    """Counts-matrix MODE with host tie-break semantics (max count, then
    earliest first occurrence)."""
    conn, n = conn_big
    conn.execute(f"create table mo as select x % 4 as g, "
                 f"case when x % 10 < 4 then 7 when x % 10 < 8 then 3 "
                 f"else x % 23 end as v from range({n}) r(x)")
    rows = conn.execute(
        "select g, mode(v) from mo group by g order by g").rows
    assert conn._exec_path.startswith("device_plan")
    x = np.arange(n)
    g = x % 4
    v = np.where(x % 10 < 4, 7, np.where(x % 10 < 8, 3, x % 23))
    from collections import Counter
    for key, mv in rows:
        vals = v[g == key]
        cnt = Counter(vals.tolist())
        best = max(cnt.items(),
                   key=lambda kv: (kv[1], -int(np.flatnonzero(vals == kv[0])[0])))[0]
        assert mv == best


def test_fused_left_join_aggregate(conn_big, monkeypatch):
    """LEFT joins fuse on the device with NULL-correct aggregate masking:
    unmatched fact rows survive, dim-sourced aggregate inputs skip them,
    coalesce launders dim NULLs, and avg divides by the non-NULL count."""
    conn, n = conn_big
    calls = _join_probe(monkeypatch)
    conn.execute("create table ldim as select x as k, (x * 2)::float as w "
                 "from range(100) r(x)")
    # fact keys 0..149: 100..149 have NO dim row → real outer NULLs
    conn.execute(f"create table lfact as select x % 150 as k, x % 7 as g, "
                 f"(x % 40)::float / 4.0 as v from range({n}) r(x)")
    q = ("select g, count(*) c, count(w) cw, sum(v) sv, sum(w) sw, "
         "avg(w) aw, min(w) mnw, max(w) mxw, "
         "sum(coalesce(w, -1.0)) sc from lfact left join ldim "
         "on lfact.k = ldim.k group by g order by g")
    rows = conn.execute(q).rows
    assert calls["hits"] == 1
    assert conn._exec_path == "device_join_plan"
    x = np.arange(n)
    k = x % 150
    g = x % 7
    v = (x % 40).astype(np.float64) / 4.0
    m = k < 100  # matched rows
    w = np.where(m, (k * 2).astype(np.float64), np.nan)
    for key, c, cw, sv, sw, aw, mnw, mxw, sc in rows:
        sel = g == key
        assert c == int(sel.sum())
        assert cw == int((sel & m).sum())
        assert sv == pytest.approx(v[sel].sum(), rel=1e-6)
        assert sw == pytest.approx(w[sel & m].sum(), rel=1e-6)
        assert aw == pytest.approx(w[sel & m].mean(), rel=1e-6)
        assert mnw == pytest.approx(w[sel & m].min())
        assert mxw == pytest.approx(w[sel & m].max())
        want_sc = w[sel & m].sum() + (-1.0) * int((sel & ~m).sum())
        assert sc == pytest.approx(want_sc, rel=1e-6)
    # parity: the host path computes the identical answer
    host = Connection()
    host.catalog = conn.catalog
    import infera_tpu.sql.device_join_plan as djp
    monkeypatch.setattr(djp, "try_execute_join_on_device",
                        lambda *a, **kw: None)
    hrows = host.execute(q).rows
    for a, b in zip(rows, hrows):
        assert a[0] == b[0] and a[1] == b[1] and a[2] == b[2]
        for x1, x2 in zip(a[3:], b[3:]):
            assert x1 == pytest.approx(x2, rel=1e-5)


def test_fused_right_join_and_where_guard(conn_big, monkeypatch):
    conn, n = conn_big
    calls = _join_probe(monkeypatch)
    conn.execute("create table rdim as select x as k, (x * 3)::float as w "
                 "from range(80) r(x)")
    conn.execute(f"create table rfact as select x % 120 as k, "
                 f"(x % 10)::float as v from range({n}) r(x)")
    # RIGHT join with the fact side on the right: fused
    rows = conn.execute(
        "select count(*) c, count(w) cw from rdim right join rfact "
        "on rdim.k = rfact.k").rows
    assert calls["hits"] == 1
    c, cw = rows[0]
    x = np.arange(n)
    assert c == n and cw == int((x % 120 < 80).sum())
    # WHERE over a dim column under an outer join → host path (3VL)
    rows = conn.execute(
        "select count(*) from rfact left join rdim on rfact.k = rdim.k "
        "where w > 10").rows
    assert calls["hits"] == 1  # unchanged — fell back
    assert rows[0][0] == int(((x % 120 < 80) & ((x % 120) * 3 > 10)).sum())


def test_fused_full_join_global_aggregate(conn_big, monkeypatch):
    """FULL joins fuse as device LEFT pass + host phantom-side combine:
    unmatched dim rows contribute rows with NULL fact columns."""
    conn, n = conn_big
    calls = _join_probe(monkeypatch)
    # dim keys 0..199; fact keys only 0..119 → 80 phantom dim rows
    conn.execute("create table fdim as select x as k, (x * 2)::float as w "
                 "from range(200) r(x)")
    conn.execute(f"create table ffact as select x % 120 as k, "
                 f"(x % 10)::float as v from range({n}) r(x)")
    q = ("select count(*) c, count(w) cw, count(v) cv, sum(v) sv, "
         "sum(w) sw, min(w) mnw, max(w) mxw from ffact full join fdim "
         "on ffact.k = fdim.k")
    rows = conn.execute(q).rows
    assert calls["hits"] == 1
    c, cw, cv, sv, sw, mnw, mxw = rows[0]
    x = np.arange(n)
    k = x % 120
    assert c == n + 80          # every fact row + 80 phantom dim rows
    assert cw == n + 80         # w is non-NULL on matched fact + phantoms
    assert cv == n              # v NULL on phantom rows
    assert sv == pytest.approx((x % 10).astype(np.float64).sum())
    want_sw = (k * 2).astype(np.float64).sum() + sum(
        i * 2.0 for i in range(120, 200))
    assert sw == pytest.approx(want_sw, rel=1e-6)
    assert mnw == 0.0 and mxw == 398.0
    # host parity
    host = Connection()
    host.catalog = conn.catalog
    import infera_tpu.sql.device_join_plan as djp
    monkeypatch.setattr(djp, "try_execute_join_on_device",
                        lambda *a, **kw: None)
    hrows = host.execute(q).rows
    for a, b in zip(rows[0], hrows[0]):
        assert a == pytest.approx(b, rel=1e-6)


def test_fused_quantile(conn_big, monkeypatch):
    """quantile_cont/disc ride the fused device plan via the median's
    one-sort machinery, matching numpy exactly."""
    conn, n = conn_big
    rows = conn.execute(
        "select g, quantile_cont(f1, 0.25) qc, quantile_disc(f1, 0.9) qd, "
        "median(f1) md from big group by g order by g").rows
    assert conn._exec_path.startswith("device_plan")
    x = np.arange(n)
    g = x % 7
    f1 = (x % 100).astype(np.float64) / 10.0
    for key, qc, qd, md in rows:
        vals = np.sort(f1[g == key])
        assert qc == pytest.approx(np.quantile(vals, 0.25), abs=1e-6)
        idx = max(int(np.ceil(0.9 * len(vals))) - 1, 0)
        # device carries values in f32; the discrete quantile is that
        # exact f32 element
        assert qd == pytest.approx(np.float32(vals[idx]), abs=0)
        assert md == pytest.approx(np.median(vals), abs=1e-6)
    # non-literal fraction → host path, same answer
    rows2 = conn.execute(
        "select quantile_cont(f1, 0.5 + 0.0) from big").rows
    assert rows2[0][0] == pytest.approx(np.quantile(f1, 0.5), abs=1e-6)


def test_fused_full_join_group_by(conn_big, monkeypatch):
    """FULL join + GROUP BY fuses (round-4, VERDICT r3 weak #3): device
    LEFT pass produces fact-keyed groups; phantom dim rows form a NULL-key
    group appended host-side."""
    conn, n = conn_big
    calls = _join_probe(monkeypatch)
    conn.execute("create table gdim as select x as k, (x * 2)::float as w "
                 "from range(200) r(x)")
    conn.execute(f"create table gfact as select x % 120 as k, x % 3 as g, "
                 f"(x % 10)::float as v from range({n}) r(x)")
    q = ("select g, count(*) c, count(w) cw, sum(w) sw, min(w) mnw "
         "from gfact full join gdim on gfact.k = gdim.k "
         "group by g order by g")
    rows = conn.execute(q).rows
    assert calls["hits"] == 1
    assert conn._exec_path.startswith("device_join_plan")
    x = np.arange(n)
    k = x % 120
    g = x % 3
    # host parity (the oracle): identical rows incl. the NULL-key group
    host = Connection()
    host.catalog = conn.catalog
    import infera_tpu.sql.device_join_plan as djp
    monkeypatch.setattr(djp, "try_execute_join_on_device",
                        lambda *a, **kw: None)
    hrows = host.execute(q).rows
    assert len(rows) == len(hrows) == 4  # g in {0,1,2} + NULL phantom group
    for a, b in zip(rows, hrows):
        assert a[0] == b[0]
        for x1, x2 in zip(a[1:], b[1:]):
            assert x1 == pytest.approx(x2, rel=1e-6)
    # sanity vs numpy: the NULL-key group holds the 80 phantom dim rows
    null_row = [r for r in rows if r[0] is None][0]
    assert null_row[1] == 80 and null_row[2] == 80
    assert null_row[3] == pytest.approx(sum(i * 2.0 for i in range(120, 200)))
    assert null_row[4] == 240.0
    for key in (0, 1, 2):
        row = [r for r in rows if r[0] == key][0]
        m = g == key
        assert row[1] == int(m.sum())
        assert row[3] == pytest.approx((k[m] * 2.0).sum(), rel=1e-6)


def test_fused_full_join_where(conn_big, monkeypatch):
    """FULL join + WHERE fuses: the predicate applies 3VL host-side on the
    phantom rows (NULL fact columns drop them; coalesce keeps them)."""
    conn, n = conn_big
    calls = _join_probe(monkeypatch)
    conn.execute("create table wdim as select x as k, (x * 2)::float as w "
                 "from range(200) r(x)")
    conn.execute(f"create table wfact as select x % 120 as k, "
                 f"(x % 10)::float as v from range({n}) r(x)")
    x = np.arange(n)
    # fact-column predicate: NULL on phantoms -> all 80 phantoms drop
    q1 = ("select count(*) c, count(w) cw from wfact full join wdim "
          "on wfact.k = wdim.k where v < 5")
    rows = conn.execute(q1).rows
    assert calls["hits"] == 1
    assert rows[0][0] == int((x % 10 < 5).sum())
    assert rows[0][1] == int(((x % 10 < 5) & (x % 120 < 120)).sum())
    # coalesce predicate keeps phantoms: coalesce(v, 99) >= 5
    q2 = ("select count(*) c from wfact full join wdim "
          "on wfact.k = wdim.k where coalesce(v, 99.0) >= 5")
    rows = conn.execute(q2).rows
    assert calls["hits"] == 2
    assert rows[0][0] == int((x % 10 >= 5).sum()) + 80
    # host parity for both
    host = Connection()
    host.catalog = conn.catalog
    import infera_tpu.sql.device_join_plan as djp
    monkeypatch.setattr(djp, "try_execute_join_on_device",
                        lambda *a, **kw: None)
    assert host.execute(q1).rows[0][0] == int((x % 10 < 5).sum())
    assert host.execute(q2).rows[0][0] == int((x % 10 >= 5).sum()) + 80
