"""Concurrency stress test — parity with the reference's tier-3 suite
(/root/reference/test/concurrency/test_concurrency.py: 8 threads × 10
iterations of load/predict/unload on a shared engine, zero errors, empty
registry at exit; BASELINE.md concurrency envelope)."""

import threading

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.registry import MODELS, RwLock


def test_rwlock_many_readers_one_writer():
    lock = RwLock()
    state = {"v": 0, "bad": False}
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            with lock.read():
                v = state["v"]
                if v % 2 != 0:
                    state["bad"] = True

    def writer():
        for _ in range(200):
            with lock.write():
                state["v"] += 1  # transiently odd inside the lock
                state["v"] += 1

    readers = [threading.Thread(target=reader) for _ in range(4)]
    for t in readers:
        t.start()
    w = threading.Thread(target=writer)
    w.start()
    w.join()
    stop.set()
    for t in readers:
        t.join()
    assert not state["bad"]
    assert state["v"] == 400


def test_concurrent_load_predict_unload(model_dir, clean_registry):
    """8 threads × 10 iterations, matching the reference envelope."""
    n_threads, n_iters = 8, 10
    errors: list = []

    def worker(tid: int):
        name = f"linear_t{tid}"
        try:
            for i in range(n_iters):
                it.load_model(name, f"{model_dir}/linear.onnx")
                res = it.predict(name, [[1.0, 2.0, 3.0]])
                if abs(float(res.data[0]) - 1.75) > 1e-5:
                    raise AssertionError(f"bad result {res.data[0]}")
                it.unload_model(name)
        except Exception as e:  # noqa: BLE001 - collect everything
            errors.append((tid, repr(e)))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert errors == []
    # registry empty at exit (test_concurrency.py:25-26 semantics)
    assert len(MODELS) == 0


def test_concurrent_shared_model_predict(model_dir, clean_registry):
    """Many readers predicting on ONE shared model while another thread
    loads/unloads different names — exercises the RwLock read path."""
    it.load_model("shared", f"{model_dir}/linear.onnx")
    errors: list = []
    x = np.random.default_rng(0).standard_normal((64, 3)).astype(np.float32)
    expected = x @ np.array([2.0, -1.0, 0.5], np.float32) + 0.25

    def predictor():
        try:
            for _ in range(20):
                res = it.predict("shared", x)
                np.testing.assert_allclose(res.data, expected, rtol=1e-5, atol=1e-5)
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    def churner():
        try:
            for i in range(20):
                it.load_model(f"tmp_{i % 3}", f"{model_dir}/multi_output.onnx")
                it.unload_model(f"tmp_{i % 3}")
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    threads = [threading.Thread(target=predictor) for _ in range(4)]
    threads.append(threading.Thread(target=churner))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert it.is_model_loaded("shared")


def test_concurrent_sql_queries_across_models(model_dir, clean_registry):
    """config-4's registry envelope: multiple threads issue SQL queries
    against DIFFERENT models concurrently through separate connections
    (shared process registry), with zero errors and consistent results."""
    import threading

    import infera_tpu as it
    from infera_tpu.onnx import builder, proto
    from infera_tpu.sql import Connection

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        proto.save_model_file(
            builder.gbt_regressor_model(n_features=3, n_trees=4, depth=3,
                                        seed=1), f"{d}/gbt.onnx")
        it.load_model("linear", f"{model_dir}/linear.onnx")
        it.load_model("gbt", f"{d}/gbt.onnx")

        errors = []
        results = {"linear": set(), "gbt": set()}
        lock = threading.Lock()

        def worker(model, idx):
            try:
                conn = Connection()
                conn.execute("create table t as select (x % 10)::float as a, "
                             "((x + 1) % 10)::float as b, "
                             "((x + 2) % 10)::float as c from range(2000) r(x)")
                for _ in range(5):
                    rows = conn.execute(
                        f"select round(sum(infera_predict('{model}', a, b, c)), 3) "
                        f"from t").rows
                    with lock:
                        results[model].add(rows[0][0])
            except Exception as e:  # pragma: no cover
                errors.append((model, idx, repr(e)))

        threads = [threading.Thread(target=worker,
                                    args=("linear" if i % 2 == 0 else "gbt", i))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        # every thread/iteration saw the same answer per model (volatile
        # functions, but the data and model are fixed)
        assert len(results["linear"]) == 1
        assert len(results["gbt"]) == 1
