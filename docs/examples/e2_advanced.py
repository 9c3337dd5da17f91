"""Advanced features: blob inference, autoload, cache management, multi-output
models (analog of the reference's e2 walkthrough)."""

import tempfile

import numpy as np

from infera_tpu.onnx.builder import write_reference_test_models
from infera_tpu.sql import Connection

with tempfile.TemporaryDirectory() as models:
    write_reference_test_models(models)
    conn = Connection()

    # autoload a directory of models
    print(conn.execute(f"select infera_set_autoload_dir('{models}')").rows)
    print(conn.execute("select infera_get_loaded_models()").rows)

    # blob inference: raw little-endian f32 bytes
    blob = np.array([1.0, 2.0, 3.0], "<f4").tobytes()
    hexed = "".join(f"\\x{b:02X}" for b in blob)
    print(conn.execute(
        f"select infera_predict_from_blob('linear', '{hexed}'::blob)"
    ).rows)

    # multi-output model forms
    print(conn.execute(
        "select infera_predict_multi('multi_output', 1.0, 2.0, 3.0, 4.0)"
    ).rows)
    print(conn.execute(
        "select infera_predict_multi_list('multi_output', 1.0, 2.0, 3.0, 4.0)"
    ).rows)

    # cache introspection
    print(conn.execute("select infera_get_cache_info()").rows)
    print(conn.execute("select infera_clear_cache()").rows)
