"""HTTP model cache tests — port of the reference's fake-server test pattern
(/root/reference/infera/src/http.rs:337-628: mockito + tiny_http fixtures):
ETag 304 revalidation, changed-ETag redownload, no-ETag fast path, 500
errors with retries, short-body (Content-Length mismatch) failure, and the
no-partial-file invariant after every failure."""

import http.server
import threading

import pytest

from infera_tpu import cache
from infera_tpu.errors import HttpRequestError


class _Handler(http.server.BaseHTTPRequestHandler):
    # class-level behavior knobs, reset per fixture
    body = b"onnx-bytes-v1"
    etag = None
    status = 200
    truncate = False
    requests: list = []

    def do_GET(self):
        cls = type(self)
        cls.requests.append(dict(self.headers))
        if cls.etag and self.headers.get("If-None-Match") == cls.etag:
            self.send_response(304)
            self.end_headers()
            return
        if cls.status != 200:
            self.send_response(cls.status)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        if cls.etag:
            self.send_header("ETag", cls.etag)
        body = cls.body
        declared = len(body) + (100 if cls.truncate else 0)
        self.send_header("Content-Length", str(declared))
        self.end_headers()
        try:
            self.wfile.write(body)
            if cls.truncate:
                self.wfile.flush()
                self.connection.close()
        except (BrokenPipeError, ConnectionResetError):
            pass

    def log_message(self, *args):
        pass


@pytest.fixture()
def server(isolated_cache, monkeypatch):
    monkeypatch.setenv("INFERA_HTTP_RETRY_ATTEMPTS", "2")
    monkeypatch.setenv("INFERA_HTTP_RETRY_DELAY", "10")
    from infera_tpu import config as config_mod

    config_mod.reset_config_for_tests()
    _Handler.body = b"onnx-bytes-v1"
    _Handler.etag = None
    _Handler.status = 200
    _Handler.truncate = False
    _Handler.requests = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    config_mod.reset_config_for_tests()


def _no_partial_files():
    d = cache.cache_dir()
    if not d.exists():
        return True
    return not any(p.name.endswith(".part") for p in d.iterdir())


def test_download_and_cache_hit(server):
    p1 = cache.handle_remote_model(f"{server}/model.onnx")
    assert p1.read_bytes() == b"onnx-bytes-v1"
    n_after_first = len(_Handler.requests)
    # no etag → fast path, no second request
    p2 = cache.handle_remote_model(f"{server}/model.onnx")
    assert p2 == p1
    assert len(_Handler.requests) == n_after_first
    assert _no_partial_files()


def test_etag_revalidation_304(server):
    _Handler.etag = '"v1"'
    url = f"{server}/m.onnx"
    p1 = cache.handle_remote_model(url)
    assert p1.with_suffix(".etag").read_text() == '"v1"'
    n = len(_Handler.requests)
    p2 = cache.handle_remote_model(url)  # conditional GET → 304
    assert p2 == p1
    assert len(_Handler.requests) == n + 1
    assert _Handler.requests[-1].get("If-None-Match") == '"v1"'
    assert _no_partial_files()


def test_etag_changed_redownload(server):
    _Handler.etag = '"v1"'
    url = f"{server}/m.onnx"
    cache.handle_remote_model(url)
    # server now serves different content under a new etag
    _Handler.etag = '"v2"'
    _Handler.body = b"onnx-bytes-v2"
    p = cache.handle_remote_model(url)
    assert p.read_bytes() == b"onnx-bytes-v2"
    assert p.with_suffix(".etag").read_text() == '"v2"'
    assert _no_partial_files()


def test_http_500_fails_with_retries(server):
    _Handler.status = 500
    with pytest.raises(HttpRequestError) as ei:
        cache.handle_remote_model(f"{server}/bad.onnx")
    assert "500" in str(ei.value)
    assert len(_Handler.requests) == 2  # retry attempts honored
    assert _no_partial_files()


def test_short_body_fails_no_partial(server):
    _Handler.truncate = True
    with pytest.raises(HttpRequestError):
        cache.handle_remote_model(f"{server}/trunc.onnx")
    assert _no_partial_files()


def test_lru_eviction(server, monkeypatch):
    import os
    import time

    from infera_tpu import config as config_mod

    monkeypatch.setenv("INFERA_CACHE_SIZE_LIMIT", "40")
    config_mod.reset_config_for_tests()
    _Handler.body = b"x" * 20
    p1 = cache.handle_remote_model(f"{server}/a.onnx")
    time.sleep(0.05)
    os.utime(p1)  # make a.onnx more recent... actually touch sets now
    p2 = cache.handle_remote_model(f"{server}/b.onnx")
    time.sleep(0.05)
    # backdate p1 so it is the LRU victim
    old = time.time() - 1000
    os.utime(p1, (old, old))
    p3 = cache.handle_remote_model(f"{server}/c.onnx")
    assert p3.exists() and p2.exists()
    assert not p1.exists()  # evicted
    info = cache.get_cache_info()
    assert '"file_count":2' in info


def test_clear_cache(server):
    cache.handle_remote_model(f"{server}/a.onnx")
    assert any(cache.cache_dir().iterdir())
    cache.clear_cache()
    assert not any(cache.cache_dir().iterdir())
