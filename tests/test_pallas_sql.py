"""Pallas-lowered fused SQL plans (ops/pallas_sql.py + device_plan's
_PallasLowerer): forced on via INFERA_PALLAS_SQL=1 (interpret mode on the
CPU backend), results must match the host path exactly; ineligible shapes
fall back to the XLA program/host with identical answers."""

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.sql import Connection
from infera_tpu.sql.device_plan import MIN_DEVICE_ROWS


@pytest.fixture()
def pconn(model_dir, clean_registry, monkeypatch, tmp_path):
    monkeypatch.setenv("INFERA_PALLAS_SQL", "1")
    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(
        f"create table big as select x % 64 as g, x % 5 as h, "
        f"(x % 100)::float / 10.0 as f1, ((x + 3) % 50)::float / 5.0 as f2, "
        f"((x * 7) % 30)::float / 3.0 as f3, ((x * 11) % 90)::float / 9.0 "
        f"as f4 from range({n}) r(x)")
    from infera_tpu.onnx.builder import mlp_model

    p = tmp_path / "m.onnx"
    p.write_bytes(mlp_model(in_dim=4, hidden=(32,), out_dim=1).serialize())
    it.load_model("m", str(p))
    return conn, n


def _host_rows(conn, q, monkeypatch):
    host = Connection()
    host.catalog = conn.catalog
    import infera_tpu.sql.device_plan as dp

    monkeypatch.setattr(dp, "try_execute_on_device", lambda *a, **k: None)
    return host.execute(q).rows


def _assert_rows_close(rows, hrows, rel=1e-6):
    assert len(rows) == len(hrows)
    for a, b in zip(rows, hrows):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            if isinstance(y, float):
                assert x == pytest.approx(y, rel=rel, abs=1e-9)
            else:
                assert x == y


def test_pallas_flagship_query_parity(pconn, monkeypatch):
    """The BASELINE e2e query shape: predict + filter + grouped count/avg/
    sum runs through the kernel with host-exact results."""
    conn, n = pconn
    q = ("select g, count(*) c, avg(infera_predict('m', f1, f2, f3, f4)) p, "
         "sum(f1) s from big where f2 > 1.0 group by g order by g")
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    assert len(rows) == 64
    _assert_rows_close(rows, _host_rows(conn, q, monkeypatch))


def test_pallas_min_max_multikey_having(pconn, monkeypatch):
    conn, n = pconn
    q = ("select g, h, min(f1) mn, max(f2) mx, count(*) c from big "
         "group by g, h having count(*) > 10 order by g, h")
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    _assert_rows_close(rows, _host_rows(conn, q, monkeypatch))


def test_pallas_global_aggregate(pconn, monkeypatch):
    conn, n = pconn
    q = ("select count(*), sum(f1 * 2.0 + f3), min(f2 - f4), max(f2) "
         "from big where f1 > 3.0 and f3 < 8.0")
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    _assert_rows_close(rows, _host_rows(conn, q, monkeypatch))


def test_pallas_multi_list_extract(pconn, tmp_path, monkeypatch):
    """infera_predict_multi_list(...)[k] lowers to the in-kernel MLP's k-th
    output row."""
    conn, n = pconn
    from infera_tpu.onnx.builder import mlp_model

    p = tmp_path / "mc.onnx"
    p.write_bytes(mlp_model(in_dim=4, hidden=(16,), out_dim=3).serialize())
    it.load_model("mc", str(p))
    q = ("select g, avg(infera_predict_multi_list('mc', f1, f2, f3, f4)[2]) "
         "from big group by g order by g")
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    _assert_rows_close(rows, _host_rows(conn, q, monkeypatch), rel=1e-5)


def test_pallas_gbt_forest_in_kernel(pconn, tmp_path, monkeypatch):
    """VERDICT r4 item 1: a config-4-shaped GBT query (tree predict +
    filter + group agg) runs the strip-packed in-kernel GEMM forest
    (path=device_plan_pallas) with results exactly matching the XLA/host
    tiers."""
    conn, n = pconn
    from infera_tpu.onnx.builder import gbt_regressor_model

    p = tmp_path / "gbt.onnx"
    p.write_bytes(gbt_regressor_model(
        n_features=4, n_trees=12, depth=4, seed=7).serialize())
    it.load_model("gbt", str(p))
    q = ("select g, count(*) c, avg(infera_predict('gbt', f1, f2, f3, f4)) p,"
         " max(infera_predict('gbt', f1, f2, f3, f4)) mx from big "
         "where f1 > 1.0 group by g order by g")
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    assert len(rows) == 64
    _assert_rows_close(rows, _host_rows(conn, q, monkeypatch), rel=1e-5)


def test_pallas_gbt_where_filter_on_prediction(pconn, tmp_path, monkeypatch):
    """The tree forest also lowers inside the WHERE predicate (prediction
    thresholds — the benchmark's filter-on-score shape)."""
    conn, n = pconn
    from infera_tpu.onnx.builder import gbt_regressor_model

    p = tmp_path / "gbtw.onnx"
    p.write_bytes(gbt_regressor_model(
        n_features=4, n_trees=6, depth=3, seed=11).serialize())
    it.load_model("gbtw", str(p))
    q = ("select count(*), sum(f1) from big "
         "where infera_predict('gbtw', f1, f2, f3, f4) > 0.0")
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    _assert_rows_close(rows, _host_rows(conn, q, monkeypatch), rel=1e-5)


def test_pallas_gbt_classifier_in_kernel(pconn, tmp_path, monkeypatch):
    """Round 5: tree CLASSIFIERS lower in-kernel too — per-class base,
    first-tie argmax, and the int label map — matching the XLA/host
    executor's labels exactly."""
    conn, n = pconn
    from infera_tpu.onnx.builder import gbt_classifier_model

    p = tmp_path / "gbc.onnx"
    p.write_bytes(gbt_classifier_model(
        n_features=4, n_trees=8, depth=3, n_classes=3,
        labels=[7, 19, 42], seed=3).serialize())
    it.load_model("gbc", str(p))
    q = ("select g, count(*) c, avg(infera_predict('gbc', f1, f2, f3, f4))"
         " al, min(infera_predict('gbc', f1, f2, f3, f4)) ml from big "
         "group by g order by g")
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    _assert_rows_close(rows, _host_rows(conn, q, monkeypatch), rel=1e-6)
    # labels appear verbatim (7/19/42 via the one-hot label map)
    assert all(r[3] in (7.0, 19.0, 42.0) for r in rows)


def test_pallas_bf16_mlp_in_kernel(pconn, tmp_path, monkeypatch):
    """bf16-precision MLPs lower in-kernel with _policy_dot's bf16
    semantics (bf16 operands, f32 accumulation) instead of forcing XLA."""
    conn, n = pconn
    from infera_tpu.onnx.builder import mlp_model

    p = tmp_path / "mb.onnx"
    p.write_bytes(mlp_model(in_dim=4, hidden=(32,), out_dim=1).serialize())
    it.load_model("mb", str(p), precision="bf16")
    q = ("select g, avg(infera_predict('mb', f1, f2, f3, f4)) p from big "
         "group by g order by g")
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    # host reference runs the same bf16 policy through the ONNX executor
    _assert_rows_close(rows, _host_rows(conn, q, monkeypatch), rel=1e-5)


def test_pallas_int8_mlp_stays_on_xla(pconn, tmp_path, monkeypatch):
    conn, n = pconn
    from infera_tpu.onnx.builder import mlp_model

    p = tmp_path / "mi.onnx"
    p.write_bytes(mlp_model(in_dim=4, hidden=(32,), out_dim=1).serialize())
    it.load_model("mi", str(p), precision="int8")
    q = ("select g, avg(infera_predict('mi', f1, f2, f3, f4)) p from big "
         "group by g order by g")
    conn.execute(q)
    assert conn._exec_path == "device_plan"


def test_pallas_widened_aggregate_tail(pconn, monkeypatch):
    """Round-5 widening (VERDICT r4 item 2): exact-int64 limb sums, the
    variance family, count_if/bool_*/product, and DISTINCT presence all
    run IN the kernel now, host-exact."""
    conn, n = pconn
    # integer SUM → byte-limb rows in the kernel, exact int64
    rows = conn.execute("select g, sum(h) from big group by g order by g").rows
    assert conn._exec_path == "device_plan_pallas"
    x = np.arange(n)
    for key, s in rows:
        assert s == int((x % 5)[x % 64 == key].sum())
    q1 = ("select g, stddev(f1) sd, var_pop(f2) vp, count_if(f1 > 4.0) ci, "
          "bool_and(f1 >= 0.0) ba, bool_or(f2 > 9.0) bo, "
          "product(1.0 + f3 / 1000.0) pr, avg(h) ah "
          "from big group by g order by g")
    rows1 = conn.execute(q1).rows
    assert conn._exec_path == "device_plan_pallas"
    # DISTINCT presence family (run all device queries BEFORE _host_rows —
    # it monkeypatches the device path away for the rest of the test)
    q2 = ("select g, count(distinct h) cd, sum(distinct h) sd, "
          "avg(distinct h) ad from big group by g order by g")
    rows2 = conn.execute(q2).rows
    assert conn._exec_path == "device_plan_pallas"
    _assert_rows_close(rows1, _host_rows(conn, q1, monkeypatch), rel=1e-3)
    _assert_rows_close(rows2, _host_rows(conn, q2, monkeypatch))


def test_pallas_int_sum_overflow_and_bigvals(monkeypatch, model_dir,
                                             clean_registry):
    """Byte-limb kernel sums stay exact for values far beyond 2^24 and
    reproduce the host's SUM(BIGINT) overflow error."""
    monkeypatch.setenv("INFERA_PALLAS_SQL", "1")
    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    big = (1 << 44) + 7  # per-group totals ~2^57: exact past f64's 2^53
    conn.execute(f"create table bi as select x % 4 as g, "
                 f"{big} + x as v from range({n}) r(x)")
    rows = conn.execute("select g, sum(v) from bi group by g order by g").rows
    assert conn._exec_path == "device_plan_pallas"
    for key, s in rows:
        want = sum(big + i for i in range(n) if i % 4 == key)
        assert s == want
    # genuine int64 overflow raises the host's exact error (parity)
    from infera_tpu.errors import SqlError

    conn.execute(f"create table ov as select 1 as g, "
                 f"{(1 << 53) + 1} as v from range({n}) r(x)")
    with pytest.raises(SqlError, match="overflow in SUM"):
        conn.execute("select g, sum(v) from ov group by g")


def test_pallas_arg_min_max_in_kernel(pconn, monkeypatch):
    """Round 5: arg_min/arg_max winning row ids resolve IN the kernel
    (lexicographic value+rowid lane accumulators, first-occurrence
    tie-break); the host gathers the arg column — any return type."""
    conn, n = pconn
    conn.execute(f"create table sarg as select x % 16 as g, "
                 f"((x * 13) % 97)::float as v, 'n' || (x % 11) as nm, "
                 f"x % 23 as iv from range({n}) r(x)")
    qs = [
        "select g, arg_min(iv, v) am, arg_max(iv, v) ax from sarg "
        "group by g order by g",
        "select g, arg_max(nm, v) from sarg group by g order by g",
        "select arg_min(iv, v), arg_max(nm, v) from sarg where v > 5.0",
    ]
    got = []
    for q in qs:  # run all device queries BEFORE _host_rows disables them
        got.append(conn.execute(q).rows)
        assert conn._exec_path == "device_plan_pallas", q
    for q, rows in zip(qs, got):
        assert rows == _host_rows(conn, q, monkeypatch), q


def test_pallas_int64_min_max_in_kernel(pconn, monkeypatch):
    """Round 5: exact int64 MIN/MAX resolve in the kernel via a
    lexicographic 16-bit word cascade over the byte-limb rows — exact for
    the full int64 range, matching the XLA lex-word slots."""
    conn, n = pconn
    big = (1 << 44) + 5
    conn.execute(f"create table lx as select x % 16 as g, "
                 f"(case when x % 3 = 0 then -1 else 1 end) * "
                 f"({big} + x * 7) as v, x % 9 as sm from range({n}) r(x)")
    q = ("select g, min(v) mn, max(v) mx, min(sm) sn, max(sm) sx "
         "from lx group by g order by g")
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    assert rows == _host_rows(conn, q, monkeypatch)


def test_pallas_ineligible_falls_back(pconn, monkeypatch):
    """Sort-backed (median/quantile) families stay off the kernel —
    answered identically by the XLA program or host."""
    conn, n = pconn
    conn.execute("select g, median(f1) from big group by g")
    assert conn._exec_path == "device_plan"


def test_pallas_wide_int_column_guard(model_dir, clean_registry,
                                      monkeypatch):
    """Integer columns beyond the f32-exact range (2^24) must not ride the
    f32 block."""
    monkeypatch.setenv("INFERA_PALLAS_SQL", "1")
    conn = Connection()
    n = MIN_DEVICE_ROWS * 2
    conn.execute(f"create table wt as select x % 3 as g, "
                 f"(x % 7) * 10000000 as v, (x % 9)::float as f "
                 f"from range({n}) r(x)")
    rows = conn.execute(
        "select g, max(f + v * 0.0), count(*) from wt "
        "group by g order by g").rows
    # v (up to 6e7 > 2^24) disqualifies the pallas block
    assert conn._exec_path != "device_plan_pallas"
    assert len(rows) == 3


def test_shared_table_block_across_tiers(pconn):
    """VERDICT r4 item 3b: one stacked [C, n_pad] device block per table is
    the canonical upload all tiers key off — repeated calls return the SAME
    device array, per-query kernel views alias it when the query reads
    every block column, and float columns' per-column device arrays are
    slices of it (no duplicate host transfer)."""
    import jax.numpy as jnp

    from infera_tpu.sql.device_plan import (_block_view, device_column_array,
                                            get_table_block)

    conn, n = pconn
    table = conn.catalog.get("big")
    b1 = get_table_block(conn, table)
    b2 = get_table_block(conn, table)
    assert b1 is not None and b1[0] is b2[0]  # cached device block
    xc, rmap, n_pad = b1
    assert n_pad % 4096 == 0 and xc.shape[1] == n_pad
    # identity view for the full ordered column set
    idxs = tuple(range(int(xc.shape[0])))
    assert _block_view(conn, xc, idxs) is xc
    # float per-column arrays slice the block (values exact)
    key = next(k for k in rmap if k.endswith("f1"))
    col = table.columns[key]
    col._device_array = None
    dev = device_column_array(col, key=key, block=b1, n=n)
    assert dev.shape == (n,)
    np.testing.assert_array_equal(np.asarray(dev),
                                  np.asarray(col.data, np.float32))
    # both tiers answer identically on top of the shared block
    q = "select g, count(*), sum(f1) from big group by g order by g"
    rows_k = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    import os

    os.environ["INFERA_PALLAS_SQL"] = "0"
    try:
        rows_x = conn.execute(q).rows
        assert conn._exec_path == "device_plan"
    finally:
        os.environ["INFERA_PALLAS_SQL"] = "1"
    _assert_rows_close(rows_k, rows_x)


def test_pallas_knob_off(pconn):
    conn, n = pconn
    import os

    os.environ["INFERA_PALLAS_SQL"] = "0"
    try:
        conn.execute("select g, count(*) from big group by g")
        assert conn._exec_path == "device_plan"
    finally:
        os.environ["INFERA_PALLAS_SQL"] = "1"


def test_pallas_matches_sqllogic_tolerances(pconn, monkeypatch):
    """Compensated lane sums: a pathological cancellation column still
    folds to the host answer within f64-visible tolerance."""
    conn, n = pconn
    conn.execute(
        f"create table pc as select x % 4 as g, "
        f"case when x % 2 = 0 then 1000000.0 + (x % 13)::float "
        f"else -1000000.0 end as v from range({n}) r(x)")
    q = "select g, sum(v) from pc group by g order by g"
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    hrows = _host_rows(conn, q, monkeypatch)
    for a, b in zip(rows, hrows):
        assert a[0] == b[0]
        assert a[1] == pytest.approx(b[1], abs=0.5)


def test_pallas_inner_join_parity(pconn, monkeypatch, tmp_path):
    """INNER fact->dim joins ride the columnar kernel with an in-jit XLA
    gather prologue (path=device_join_plan_pallas), host-exact."""
    conn, n = pconn
    conn.execute(f"create table jfact as select x % 100 as k, x % 7 as jg, "
                 f"(x % 40)::float / 4.0 as v from range({n}) r(x)")
    conn.execute("create table jdim as select x as k, (x * 2)::float as w, "
                 "x % 3 as cat from range(100) r(x)")
    qs = [
        ("select cat, count(*) c, sum(w) sw, max(v) mx from jfact "
         "join jdim on jfact.k = jdim.k group by cat order by cat"),
        ("select count(*), sum(v * w), min(w) from jfact "
         "join jdim on jfact.k = jdim.k where v > 2.0"),
        ("select jg, avg(infera_predict('m', v, w, v, w)) from jfact "
         "join jdim on jfact.k = jdim.k group by jg order by jg"),
    ]
    import infera_tpu.sql.device_join_plan as djp

    for q in qs:
        rows = conn.execute(q).rows
        assert conn._exec_path == "device_join_plan_pallas", q
        host = Connection()
        host.catalog = conn.catalog
        with monkeypatch.context() as m:
            m.setattr(djp, "try_execute_join_on_device",
                      lambda *a, **k: None)
            hrows = host.execute(q).rows
        _assert_rows_close(rows, hrows, rel=1e-5)


def test_pallas_outer_join_in_kernel(pconn, monkeypatch):
    """Round 5 (VERDICT r4 item 3a): LEFT/RIGHT joins ride the kernel with
    matched-validity summand masking — counts, sums, avgs, and min/max
    over dim columns agree with the host join exactly."""
    conn, n = pconn
    conn.execute(f"create table ofact as select x % 150 as k, x % 6 as og, "
                 f"(x % 40)::float as v from range({n}) r(x)")
    conn.execute("create table odim as select x as k, (x * 2)::float as w "
                 "from range(100) r(x)")
    import infera_tpu.sql.device_join_plan as djp

    qs = [
        ("select count(*), count(w) from ofact left join odim "
         "on ofact.k = odim.k"),
        ("select og, count(*) c, sum(w) sw, avg(w) aw, sum(v) sv from "
         "ofact left join odim on ofact.k = odim.k group by og order by og"),
        ("select og, min(w), max(w), max(v) from ofact left join odim "
         "on ofact.k = odim.k group by og order by og"),
        ("select og, count(*), sum(w) from odim right join ofact "
         "on odim.k = ofact.k group by og order by og"),
        ("select og, count(*), sum(w), min(w) from ofact left join odim "
         "on ofact.k = odim.k where v > 3.0 group by og order by og"),
    ]
    for q in qs:
        rows = conn.execute(q).rows
        assert conn._exec_path == "device_join_plan_pallas", q
        host = Connection()
        host.catalog = conn.catalog
        with monkeypatch.context() as m:
            m.setattr(djp, "try_execute_join_on_device",
                      lambda *a, **k: None)
            hrows = host.execute(q).rows
        _assert_rows_close(rows, hrows, rel=1e-5)
    x = np.arange(n)
    rows = conn.execute("select count(*), count(w) from ofact left join "
                        "odim on ofact.k = odim.k").rows
    assert rows[0] == (n, int((x % 150 < 100).sum()))


def test_pallas_full_join_phantom_combine(pconn, monkeypatch):
    """FULL joins: kernel LEFT pass + host phantom rows for unmatched dim
    keys — identical to the host join."""
    conn, n = pconn
    conn.execute(f"create table ffact as select x % 80 as k, "
                 f"(x % 30)::float as v from range({n}) r(x)")
    conn.execute("create table fdim as select x as k, (x * 3)::float as w "
                 "from range(120) r(x)")  # keys 80..119 unmatched -> phantom
    import infera_tpu.sql.device_join_plan as djp

    for q in [
        ("select count(*) c, sum(v) sv, count(w) cw from ffact full join "
         "fdim on ffact.k = fdim.k"),
        ("select ffact.k fk, count(*) c, sum(w) sw from ffact full join "
         "fdim on ffact.k = fdim.k group by ffact.k order by fk"),
    ]:
        rows = conn.execute(q).rows
        assert conn._exec_path == "device_join_plan_pallas", q
        host = Connection()
        host.catalog = conn.catalog
        with monkeypatch.context() as m:
            m.setattr(djp, "try_execute_join_on_device",
                      lambda *a, **k: None)
            hrows = host.execute(q).rows
        _assert_rows_close(rows, hrows, rel=1e-5)


def test_pallas_mode_unique_max(pconn, monkeypatch):
    """Round 5: MODE resolves in the kernel when the max count is UNIQUE
    per live group (the counts matrix the DISTINCT machinery already
    accumulates); a tied max falls through to the XLA program whose
    first-seen matrix carries the host's tie-break."""
    conn, n = pconn
    conn.execute(f"create table mu as select x % 4 as mg, "
                 f"((x % 12) * (x % 5)) % 9 as v from range({n}) r(x)")
    q = "select mg, mode(v) m, count(*) c from mu group by mg order by mg"
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan_pallas"
    assert rows == _host_rows(conn, q, monkeypatch)


def test_pallas_mode_tie_falls_to_xla(pconn, monkeypatch):
    conn, n = pconn
    conn.execute(f"create table mtie as select x % 4 as mg, x % 5 as v "
                 f"from range({n}) r(x)")
    q = "select mg, mode(v) from mtie group by mg order by mg"
    rows = conn.execute(q).rows
    assert conn._exec_path == "device_plan"  # XLA first-seen tie-break
    assert rows == _host_rows(conn, q, monkeypatch)
