"""Config-parsing parity tests (config.rs:209-271 inline suite) and the
13-function API surface (lib.rs inline FFI tests' semantics)."""

import json
import os

import pytest

import infera_tpu as it
from infera_tpu import config as config_mod
from infera_tpu.config import EvictionPolicy, LogLevel


@pytest.fixture(autouse=True)
def reset_cfg():
    config_mod.reset_config_for_tests()
    yield
    config_mod.reset_config_for_tests()


def test_defaults(monkeypatch):
    for var in ("INFERA_CACHE_DIR", "INFERA_CACHE_SIZE_LIMIT", "INFERA_VERBOSE",
                "INFERA_HTTP_TIMEOUT", "INFERA_HTTP_RETRY_ATTEMPTS",
                "INFERA_HTTP_RETRY_DELAY", "INFERA_CACHE_EVICTION",
                "INFERA_LOG_LEVEL"):
        monkeypatch.delenv(var, raising=False)
    config_mod.reset_config_for_tests()
    cfg = config_mod.get_config()
    assert cfg.cache_size_limit == 1 << 30
    assert cfg.http_timeout_s == 30
    assert cfg.http_retry_attempts == 3
    assert cfg.http_retry_delay_ms == 1000
    assert cfg.eviction_policy == EvictionPolicy.LRU
    assert cfg.log_level == LogLevel.WARN
    assert cfg.cache_dir.name == "infera_cache"


def test_invalid_values_fall_back(monkeypatch):
    # invalid values silently fall back to defaults (config.rs:101-176)
    monkeypatch.setenv("INFERA_CACHE_SIZE_LIMIT", "not_a_number")
    monkeypatch.setenv("INFERA_HTTP_TIMEOUT", "??")
    monkeypatch.setenv("INFERA_CACHE_EVICTION", "bogus")
    monkeypatch.setenv("INFERA_LOG_LEVEL", "bogus")
    config_mod.reset_config_for_tests()
    cfg = config_mod.get_config()
    assert cfg.cache_size_limit == 1 << 30
    assert cfg.http_timeout_s == 30
    assert cfg.eviction_policy == EvictionPolicy.LRU
    assert cfg.log_level == LogLevel.WARN


def test_custom_values(monkeypatch):
    monkeypatch.setenv("INFERA_CACHE_SIZE_LIMIT", "12345")
    monkeypatch.setenv("INFERA_HTTP_TIMEOUT", "60")
    monkeypatch.setenv("INFERA_HTTP_RETRY_ATTEMPTS", "5")
    monkeypatch.setenv("INFERA_HTTP_RETRY_DELAY", "2000")
    monkeypatch.setenv("INFERA_CACHE_EVICTION", "lfu")
    monkeypatch.setenv("INFERA_LOG_LEVEL", "debug")
    config_mod.reset_config_for_tests()
    cfg = config_mod.get_config()
    assert cfg.cache_size_limit == 12345
    assert cfg.http_timeout_s == 60
    assert cfg.http_retry_attempts == 5
    assert cfg.http_retry_delay_ms == 2000
    assert cfg.eviction_policy == EvictionPolicy.LFU
    assert cfg.log_level == LogLevel.DEBUG


def test_verbose_alias(monkeypatch):
    monkeypatch.delenv("INFERA_LOG_LEVEL", raising=False)
    monkeypatch.setenv("INFERA_VERBOSE", "1")
    config_mod.reset_config_for_tests()
    assert config_mod.get_config().log_level == LogLevel.DEBUG


# --- API surface ----------------------------------------------------------

def test_get_version_json(isolated_cache):
    v = json.loads(it.get_version())
    assert v["version"] == it.VERSION
    assert v["onnx_backend"] == "jax-xla"
    assert "model_cache_dir" in v


def test_loaded_models_json(model_dir, clean_registry):
    assert it.get_loaded_models() == "[]"
    it.load_model("m1", f"{model_dir}/linear.onnx")
    models = json.loads(it.get_loaded_models())
    assert models == ["m1"]
    assert it.is_model_loaded("m1")
    assert not it.is_model_loaded("m")  # substring probe quotes the name
    assert it.unload_model("m1") is True
    assert it.unload_model("m1") is False


def test_autoload_dir(model_dir, clean_registry):
    out = json.loads(it.set_autoload_dir(model_dir))
    assert sorted(out["loaded"]) == ["linear", "multi_output"]
    assert out["errors"] == []
    assert it.is_model_loaded("linear") and it.is_model_loaded("multi_output")


def test_autoload_missing_dir(clean_registry):
    out = json.loads(it.set_autoload_dir("/definitely/not/here"))
    assert "error" in out
    assert out["error"].startswith("IO error:")


def test_autoload_invalid_model(tmp_path, clean_registry):
    (tmp_path / "broken.onnx").write_bytes(b"\xff\xff\xffnot-a-model")
    (tmp_path / "notes.txt").write_text("ignored")
    out = json.loads(it.set_autoload_dir(str(tmp_path)))
    assert out["loaded"] == []
    assert len(out["errors"]) == 1
    assert out["errors"][0]["file"].endswith("broken.onnx")
    assert "ONNX error" in out["errors"][0]["error"]


def test_infera_platform_env_selects_backend():
    """INFERA_PLATFORM routes the whole engine onto a chosen jax backend
    (the 'GPU support' portability knob — validated here with cpu)."""
    import subprocess
    import sys

    code = (
        "import os\n"
        "os.environ['INFERA_PLATFORM'] = 'cpu'\n"
        "import infera_tpu\n"
        "import jax\n"
        "print([d.platform for d in jax.devices()])\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=120)
    assert res.returncode == 0, res.stderr
    assert "cpu" in res.stdout
