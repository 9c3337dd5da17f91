"""Remote-model integration through the SQL surface — the offline analog of
the reference's network-tier test_advanced_features.test: load a model over
HTTP (served locally), predict, verify cache state, blob inference."""

import http.server
import threading

import numpy as np
import pytest

from infera_tpu.onnx import builder
from infera_tpu.sql import Connection
from infera_tpu.testing.sqllogic import SqlLogicRunner


@pytest.fixture()
def model_server(isolated_cache, clean_registry):
    model_bytes = builder.linear_model().serialize()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("ETag", '"linear-v1"')
            self.send_header("Content-Length", str(len(model_bytes)))
            self.end_headers()
            self.wfile.write(model_bytes)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_remote_load_predict_cache_sql(model_server):
    conn = Connection()
    url = f"{model_server}/models/linear.onnx"
    r = conn.execute(f"select infera_load_model('remote_linear', '{url}')")
    assert r.rows == [(True,)]
    r = conn.execute("select infera_predict('remote_linear', 1.0, 2.0, 3.0)")
    assert abs(r.rows[0][0] - 1.75) < 1e-5
    # the download landed in the cache
    info = conn.execute("select infera_get_cache_info()").rows[0][0]
    assert '"file_count":1' in info
    # second load revalidates via ETag and reuses the cached file
    r = conn.execute(f"select infera_load_model('remote_linear2', '{url}')")
    assert r.rows == [(True,)]
    info = conn.execute("select infera_get_cache_info()").rows[0][0]
    assert '"file_count":1' in info
    # blob path against the remote-loaded model
    blob = np.array([1.0, 2.0, 3.0], "<f4").tobytes()
    hexed = "".join(f"\\x{b:02X}" for b in blob)
    r = conn.execute(
        f"select infera_predict_from_blob('remote_linear', '{hexed}'::blob)"
    )
    assert abs(r.rows[0][0][0] - 1.75) < 1e-5
    conn.execute("select infera_clear_cache()")
    info = conn.execute("select infera_get_cache_info()").rows[0][0]
    assert '"file_count":0' in info


def test_remote_model_sqllogic_script(model_server):
    script = """
statement ok
select infera_load_model('rl', '${URL}/m.onnx')

query I
select abs(infera_predict('rl', 1.0, 2.0, 3.0) - 1.75) < 1e-5
----
true

query I
select infera_is_model_loaded('rl')
----
true

statement ok
select infera_unload_model('rl')
"""
    runner = SqlLogicRunner(Connection(), substitutions={"URL": model_server})
    result = runner.run_text(script)
    assert result.passed, [r.message for r in result.failures()]
