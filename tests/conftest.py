"""Test configuration: force an 8-device virtual CPU platform so sharding /
multi-chip tests run anywhere (SURVEY.md §4 "simulated first" tier), and give
every test an isolated cache dir.

The XLA flag must be set before jax initializes its backends; the platform
override must beat the environment's JAX_PLATFORMS (the TPU tunnel platform is
slow to compile, ~10-40s per jit — unusable for a 100+ case unit suite).
"""

import os

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import tempfile  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture()
def isolated_cache(monkeypatch):
    """Point INFERA_CACHE_DIR at a fresh temp dir and reset the config
    singleton so the test sees it."""
    from infera_tpu import config as config_mod

    with tempfile.TemporaryDirectory() as d:
        monkeypatch.setenv("INFERA_CACHE_DIR", d)
        config_mod.reset_config_for_tests()
        yield d
        config_mod.reset_config_for_tests()


@pytest.fixture()
def clean_registry():
    """Empty model registry before and after a test."""
    from infera_tpu.registry import MODELS

    MODELS.clear()
    yield MODELS
    MODELS.clear()


@pytest.fixture(scope="session")
def model_dir(tmp_path_factory):
    """Directory with the synthesized reference-parity test models."""
    from infera_tpu.onnx.builder import write_reference_test_models

    d = tmp_path_factory.mktemp("models")
    write_reference_test_models(str(d))
    return str(d)
