"""Control-plane tests: replicated registry ops and stateless partition
recovery with fault injection (SURVEY.md §5 failure-detection tier)."""

import numpy as np
import pytest

import infera_tpu as it
from infera_tpu.parallel.distributed import (
    PartitionFailure,
    ReplicatedModelOps,
    run_partitions_with_retry,
)


def test_replicated_ops_apply_locally(model_dir, clean_registry):
    ops = ReplicatedModelOps()
    ops.load("m", f"{model_dir}/linear.onnx")
    assert it.is_model_loaded("m")
    ops.unload("m")
    assert not it.is_model_loaded("m")
    out = ops.autoload(model_dir)
    assert "linear" in out
    assert ops.applied[0][0] == "load"


def test_partition_retry_recovers_from_transient_faults(model_dir, clean_registry):
    it.load_model("linear", f"{model_dir}/linear.onnx")
    x = np.random.default_rng(0).standard_normal((32, 3)).astype(np.float32)
    parts = np.array_split(x, 4)
    killed = set()

    def fault_hook(p, attempt):
        # kill worker for partition 2 on its first attempt only
        if p == 2 and attempt == 1 and p not in killed:
            killed.add(p)
            raise ConnectionResetError("worker lost mid-shuffle")

    def run_part(p):
        return it.predict("linear", parts[p]).data

    results = run_partitions_with_retry(run_part, 4, fault_hook=fault_hook)
    got = np.concatenate(results)
    expected = x @ np.array([2.0, -1.0, 0.5], np.float32) + 0.25
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
    assert killed == {2}


def test_partition_retry_exhausts(model_dir, clean_registry):
    def always_fail(p):
        raise OSError("host unreachable")

    with pytest.raises(PartitionFailure) as ei:
        run_partitions_with_retry(always_fail, 2, max_attempts=2)
    assert ei.value.partition == 0


def test_engine_errors_not_retried(model_dir, clean_registry):
    """Deterministic engine errors must fail fast, not burn retries."""
    from infera_tpu.errors import ModelNotFound

    attempts = []

    def run_part(p):
        attempts.append(p)
        return it.predict("missing_model", [[1.0]])

    with pytest.raises(ModelNotFound):
        run_partitions_with_retry(run_part, 2, max_attempts=5)
    assert attempts == [0]


def test_heartbeat_detects_and_recovers():
    import time as _time

    from infera_tpu.parallel.distributed import Heartbeat

    dead_events = []
    hb = Heartbeat(deadline_s=0.2, interval_s=0.05,
                   on_dead=dead_events.append)
    with hb:
        hb.beat("w0")
        hb.beat("w1")
        # w1 keeps beating; w0 goes silent
        for _ in range(8):
            _time.sleep(0.05)
            hb.beat("w1")
        assert "w0" in hb.dead_workers()
        assert "w1" not in hb.dead_workers()
        assert dead_events == ["w0"]
        # w0 comes back
        hb.beat("w0")
        assert "w0" not in hb.dead_workers()


def test_roofline_formatting():
    from infera_tpu.testing.benchmarks import roofline

    out = roofline(flops=98.5e12, bytes_moved=0, seconds=1.0)
    assert "100.0%" in out and "compute-bound" in out
    out = roofline(flops=0, bytes_moved=819e9 // 2, seconds=1.0)
    assert "50.0%" in out and "memory-bound" in out
