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
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
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
