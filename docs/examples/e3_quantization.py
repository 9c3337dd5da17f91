"""Quantized model loading: bf16 and int8 weight paths (an extension over
the reference — its ROADMAP quantization item is unchecked)."""

import tempfile

import numpy as np

from infera_tpu.onnx import builder, proto
from infera_tpu.sql import Connection

with tempfile.TemporaryDirectory() as d:
    path = f"{d}/mlp.onnx"
    proto.save_model_file(
        builder.mlp_model(in_dim=8, hidden=(32,), out_dim=4, softmax=False),
        path)
    conn = Connection()
    conn.execute(f"select infera_load_model('mlp_f32', '{path}')")
    conn.execute(f"select infera_load_model('mlp_int8', '{path}', 'int8')")
    print(conn.execute("select infera_get_model_info('mlp_int8')").rows[0][0])

    args = ", ".join(str(0.1 * (i + 1)) for i in range(8))
    for name in ("mlp_f32", "mlp_int8"):
        rows = conn.execute(
            f"select infera_predict_multi_list('{name}', {args})").rows
        print(name, [round(v, 4) for v in rows[0][0]])
