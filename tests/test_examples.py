"""The docs/examples walkthroughs must stay runnable."""

import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "docs" / "examples").glob("e*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path, tmp_path):
    import os

    env = dict(os.environ)
    env["INFERA_CACHE_DIR"] = str(tmp_path / "cache")
    repo_root = str(pathlib.Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # examples must not hit the TPU: force (not setdefault) because the
    # ambient environment exports JAX_PLATFORMS=axon for the tunneled chip.
    # The tunnel's sitecustomize registers the axon PJRT plugin whenever
    # PALLAS_AXON_POOL_IPS is set — even under JAX_PLATFORMS=cpu — so strip
    # the tunnel variables entirely (remote compiles can hang for minutes).
    env["JAX_PLATFORMS"] = "cpu"
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(k)
    if "xla_force_host_platform_device_count" not in env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()
    res = subprocess.run([sys.executable, str(path)], capture_output=True,
                         text=True, timeout=300, env=env)
    assert res.returncode == 0, f"{path.name} failed:\n{res.stderr[-2000:]}"
    assert res.stdout.strip(), f"{path.name} produced no output"
