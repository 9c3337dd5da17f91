"""True multi-process distributed tier: two OS processes form a jax
process group over localhost (Gloo CPU collectives) and exercise the
replicated registry control plane plus a cross-process psum — the closest
single-machine analog of a multi-host pod slice (SURVEY.md §2.4)."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    model_dir = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    import numpy as np
    import infera_tpu as it
    from infera_tpu.parallel.distributed import ReplicatedModelOps

    # SPMD statement stream: both hosts load the same model; the control
    # plane broadcasts host0's op and verifies agreement
    ops = ReplicatedModelOps()
    ops.load("m", f"{model_dir}/linear.onnx")
    res = it.predict("m", [[1.0, 2.0, 3.0]])
    assert abs(float(res.data[0]) - 1.75) < 1e-5, res.data

    # cross-process collective over the global 2-device mesh
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.asarray(jax.devices()).reshape(2)
    mesh = Mesh(devs, ("dp",))
    local = jnp.asarray([float(pid + 1)])
    arr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P("dp")),
        [jax.device_put(local, jax.local_devices()[0])])
    total = jax.jit(lambda a: jnp.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    # fully replicated output: every process reads its addressable replica
    val = float(np.asarray(total.addressable_data(0)))
    assert abs(val - 3.0) < 1e-6, val  # 1 + 2 across processes

    ops.unload("m")
    assert not it.is_model_loaded("m")
    print(f"proc{pid} OK", flush=True)
""")


def test_two_process_group(tmp_path, model_dir):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"  # axon sitecustomize registers the TPU
    # plugin whenever PALLAS_AXON_POOL_IPS is set, so strip tunnel vars
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers need single-device CPU each
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(worker_py), str(i), str(port), model_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    codes = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outputs.append(out)
        codes.append(p.returncode)
    assert codes == [0, 0], "\n".join(outputs)
    assert "proc0 OK" in outputs[0]
    assert "proc1 OK" in outputs[1]


PIPELINE_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from infera_tpu.parallel.pipeline import make_distributed_query_step

    ndev = 4  # 2 processes x 2 local devices
    rows_per_dev, in_dim, out_dim, n_groups = 16, 8, 4, 8
    n = rows_per_dev * ndev
    mesh = Mesh(np.asarray(jax.devices()).reshape(ndev, 1), ("dp", "mp"))

    rng = np.random.default_rng(0)  # same seed everywhere -> same globals
    x_all = rng.standard_normal((n, in_dim)).astype(np.float32)
    keys_all = rng.integers(0, n_groups, n).astype(np.int32)
    params = [
        (jnp.asarray(rng.standard_normal((in_dim, 16)), jnp.float32) * 0.3,
         jnp.zeros((16,), jnp.float32)),
        (jnp.asarray(rng.standard_normal((16, out_dim)), jnp.float32) * 0.3,
         jnp.zeros((out_dim,), jnp.float32)),
    ]

    def to_global(host_np, spec):
        sharding = NamedSharding(mesh, spec)
        shards = []
        for d, idx in sharding.addressable_devices_indices_map((n,) + host_np.shape[1:]).items():
            shards.append(jax.device_put(host_np[idx], d))
        return jax.make_array_from_single_device_arrays(
            host_np.shape, sharding, shards)

    x = to_global(x_all, P("dp", None))
    keys = to_global(keys_all, P("dp"))

    step = make_distributed_query_step(mesh, n_groups=n_groups,
                                       cap=rows_per_dev)
    sums, counts, total = jax.block_until_ready(step(params, x, keys))
    sums = np.asarray(sums.addressable_data(0))
    counts = np.asarray(counts.addressable_data(0))

    # reference on host
    h = x_all
    for i, (w, b) in enumerate(params):
        h = h @ np.asarray(w) + np.asarray(b)
        if i < len(params) - 1:
            h = np.maximum(h, 0)
    sel = h[:, 0] > 0
    exp_s = np.zeros(n_groups); exp_c = np.zeros(n_groups)
    np.add.at(exp_s, keys_all % n_groups, np.where(sel, h[:, 0], 0.0))
    np.add.at(exp_c, keys_all % n_groups, sel.astype(np.float64))
    assert np.allclose(counts, exp_c, atol=1e-5), (counts, exp_c)
    assert np.allclose(sums, exp_s, rtol=1e-4, atol=1e-4)
    print(f"proc{pid} PIPELINE OK", flush=True)
""")


def test_two_process_distributed_pipeline(tmp_path):
    """The full distributed query step — sharded inference, all_to_all
    shuffle, psum — executed across TWO OS processes (4 global devices)."""
    worker_py = tmp_path / "pipeline_worker.py"
    worker_py.write_text(PIPELINE_WORKER)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"  # axon sitecustomize registers the TPU
    # plugin whenever PALLAS_AXON_POOL_IPS is set, so strip tunnel vars
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(worker_py), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs, codes = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outputs.append(out)
        codes.append(p.returncode)
    assert codes == [0, 0], "\n".join(outputs)
    assert all("PIPELINE OK" in o for o in outputs)


SQL_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]; model_dir = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    import numpy as np
    import infera_tpu as it
    from infera_tpu.parallel.distributed import ReplicatedModelOps
    from infera_tpu.sql import Connection

    # registry broadcast: host0's load op replays on every process
    ops = ReplicatedModelOps()
    ops.load("linear", f"{model_dir}/linear.onnx")
    assert it.is_model_loaded("linear")

    # SPMD statement stream: both processes execute the same statements over
    # a GLOBAL 8-device mesh (4 local devices each); columns upload as
    # process-local shards, the group table all_gathers back replicated
    conn = Connection()
    conn.set_mesh(8)
    n = (1 << 15) + 13
    conn.execute(
        f"create table big as select x % 7 as g, 2199023255553 + x as v, "
        f"(x % 100)::float / 10.0 as f1, ((x + 3) % 50)::float / 5.0 as f2, "
        f"((x * 7) % 30)::float / 3.0 as f3 from range({n}) r(x)")
    rows = conn.execute(
        "select g, count(*) c, sum(v) s, "
        "avg(infera_predict('linear', f1, f2, f3)) p, stddev(f1) sd "
        "from big where f1 > 2.0 group by g order by g").rows
    assert conn._exec_path == "device_plan_mesh", conn._exec_path

    x = np.arange(n, dtype=np.int64)
    g = x % 7
    f1 = (x % 100).astype(np.float32) / np.float32(10.0)
    f2 = ((x + 3) % 50).astype(np.float32) / np.float32(5.0)
    f3 = ((x * 7) % 30).astype(np.float32) / np.float32(3.0)
    pred = 2 * f1 - f2 + 0.5 * f3 + np.float32(0.25)
    sel = f1 > 2.0
    assert len(rows) == 7, rows
    for key, c, s, p, sd in rows:
        m = sel & (g == key)
        assert c == int(m.sum())
        assert s == sum(2199023255553 + int(i) for i in x[m])  # exact int64
        assert abs(p - float(pred[m].mean())) < 1e-3 * abs(p)
        assert abs(sd - float(np.std(f1[m], ddof=1))) < 1e-3 * sd

    # round-4 tiers across REAL process boundaries: outer join with
    # matched-validity partials, median via bitwise bisection (psum inside
    # fori_loop), and the pre-aggregated shuffle join
    conn.execute("create table dim as select x as k, (x * 2)::float as w "
                 "from range(60) r(x)")
    conn.execute(f"create table fact as select x % 100 as k, "
                 f"(x % 40)::float / 4.0 as fv from range({n}) r(x)")
    orows = conn.execute(
        "select count(*) c, count(w) cw, avg(w) aw from fact "
        "left join dim on fact.k = dim.k").rows
    assert conn._exec_path == "device_join_plan_mesh", conn._exec_path
    ks = x % 100
    mm = ks < 60
    assert orows[0][0] == n and orows[0][1] == int(mm.sum())
    assert abs(orows[0][2] - float((ks[mm] * 2.0).mean())) < 1e-5

    mrows = conn.execute("select median(fv) from fact").rows
    assert conn._exec_path == "device_plan_mesh", conn._exec_path
    assert abs(mrows[0][0] - float(np.median((x % 40) / 4.0))) < 1e-6

    conn.execute(f"create table fb as select (x * 3) % 120 as k, "
                 f"(x % 90)::float / 9.0 as w from range({n}) r(x)")
    srows = conn.execute("select count(*) c, sum(w) sw from fact "
                         "join fb on fact.k = fb.k").rows
    assert conn._exec_path == "shuffle_join_mesh", conn._exec_path
    kb = (x * 3) % 120
    cntb = np.bincount(kb, minlength=128)
    swb = np.zeros(128)
    np.add.at(swb, kb, (x % 90) / 9.0)
    assert srows[0][0] == int(cntb[ks].sum())
    assert abs(srows[0][1] - float(swb[ks].sum())) <= \
        1e-6 * abs(float(swb[ks].sum()))

    # volatile semantics still hold across the process group
    ops.unload("linear")
    assert not it.is_model_loaded("linear")
    print(f"proc{pid} SQL OK", flush=True)
""")


def test_two_process_sql_query(tmp_path, model_dir):
    """SURVEY §7.2 M5 / round-2 verdict item 2: a Connection.execute
    aggregate (incl. infera_predict, exact int64 SUM, stddev) executes
    across TWO jax.distributed OS processes over a global 8-device mesh and
    matches the host answer on both."""
    worker_py = tmp_path / "sql_worker.py"
    worker_py.write_text(SQL_WORKER)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(worker_py), str(i), str(port), model_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs, codes = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outputs.append(out)
        codes.append(p.returncode)
    assert codes == [0, 0], "\n".join(outputs)
    assert all("SQL OK" in o for o in outputs)
