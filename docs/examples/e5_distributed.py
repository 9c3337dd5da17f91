"""Distributed execution on a virtual 8-device mesh: sharded batched
inference + the all_to_all shuffle query step. Run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
(or on a real TPU slice)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import tempfile

import jax
import numpy as np

import infera_tpu as it
from infera_tpu.onnx.builder import write_reference_test_models
from infera_tpu.parallel import make_mesh
from infera_tpu.registry import MODELS

print("devices:", len(jax.devices()))
mesh = make_mesh(len(jax.devices()))
with tempfile.TemporaryDirectory() as models:
    write_reference_test_models(models)
    it.load_model("linear", f"{models}/linear.onnx")
    model = MODELS.get("linear")
    rows = 8 * 1024
    x = np.tile(np.array([[1.0, 2.0, 3.0]], np.float32), (rows, 1))
    out = model.run_data_parallel(mesh, x)[0]
    print("data-parallel predict:", np.asarray(out)[:2].reshape(-1), "...")
