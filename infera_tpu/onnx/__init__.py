"""ONNX subsystem: dependency-free protobuf codec, JAX op lowerings, and the
XLA graph executor (replaces the reference's tract pipeline,
/root/reference/infera/src/engine.rs)."""

from . import (builder, control_flow, ml_ops, ops, ops_extra,  # noqa: F401
               proto, rnn_ops, sequence_ops, signal_vision_ops)
from .executor import (  # noqa: F401
    CompiledOnnxModel,
    compile_model_bytes,
    compile_model_file,
    shape_rows_cols,
)
