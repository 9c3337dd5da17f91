"""Opt-in LIVE-network tier (VERDICT r3 missing #3): the reference's
test_advanced_features.test:47-56 downloads real models from GitHub raw and
HuggingFace; the offline suite replays it against a local fixture server
(test_reference_suite.py). This tier exercises the REAL hosts — redirects,
TLS, genuine ETag revalidation through cache.py — and is excluded by
default (``addopts = -m 'not network'``): run ``pytest -m network``.
Auto-skips when the network is unreachable (zero-egress CI)."""

import socket

import pytest

import infera_tpu as it

# the exact URLs the reference's sqllogictest pulls
# (/root/reference/test/sql/test_advanced_features.test:47-56)
GITHUB_LINEAR = ("https://raw.githubusercontent.com/CogitatorTech/"
                 "infera/main/test/models/linear.onnx")
HF_MOBILENET = ("https://huggingface.co/qualcomm/MobileNet-v2/resolve/"
                "main/MobileNet-v2.onnx")


def _online(host: str, port: int = 443, timeout: float = 5.0) -> bool:
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.network


@pytest.mark.skipif(not _online("raw.githubusercontent.com"),
                    reason="no network (github unreachable)")
def test_github_raw_download_and_revalidate(isolated_cache, clean_registry):
    """Real TLS + redirect handling + disk cache + 304 revalidation
    against GitHub raw."""
    from infera_tpu.cache import cache_stats

    assert it.load_model("linear_net", GITHUB_LINEAR)
    out = it.predict("linear_net", [[1.0, 2.0, 3.0]])
    assert abs(float(out.data[0]) - 1.75) < 1e-5  # the reference anchor
    st = cache_stats()
    assert st["file_count"] >= 1 and st["total_size_bytes"] > 0
    # second load: the ETag sidecar drives a conditional GET; a 304 (or a
    # changed-ETag redownload) must still yield a working model
    assert it.unload_model("linear_net")
    assert it.load_model("linear_net", GITHUB_LINEAR)
    out = it.predict("linear_net", [[1.0, 2.0, 3.0]])
    assert abs(float(out.data[0]) - 1.75) < 1e-5
    it.unload_model("linear_net")


@pytest.mark.skipif(not _online("huggingface.co"),
                    reason="no network (huggingface unreachable)")
def test_huggingface_blob_inference(isolated_cache, clean_registry):
    """The reference's mobilenet blob case against the real HF host
    (resolve/ URLs redirect to the CDN): 602,112-byte zero blob =
    1x224x224x3 f32 (SURVEY.md §6 anchor)."""
    import numpy as np

    assert it.load_model("mobilenet", HF_MOBILENET)
    blob = np.zeros(1 * 224 * 224 * 3, np.float32).tobytes()
    assert len(blob) == 602112
    out = it.predict_from_blob("mobilenet", blob)
    assert out.data.size >= 1000  # imagenet logits
    it.unload_model("mobilenet")
