"""infera_tpu — a TPU-native, from-scratch vectorized query + in-database ML
inference engine covering the capabilities of CogitatorTech/infera (a DuckDB
extension running ONNX inference in SQL; see /root/repo/SURVEY.md).

Layers (mirroring SURVEY.md §1's layer map, re-designed for TPU):

- ``infera_tpu.sql``      — SQL surface: parser/planner/executor with the 13
                            ``infera_*`` scalar functions (ref L4/L3)
- ``infera_tpu.api``      — the 13-function public API (ref L2 C ABI)
- ``infera_tpu.engine``   — batched inference engine (ref L1)
- ``infera_tpu.onnx``     — ONNX codec + JAX/XLA executor (ref: tract)
- ``infera_tpu.columnar`` — columnar RecordBatch of device arrays (ref: DuckDB
                            DataChunk)
- ``infera_tpu.ops``      — relational operators (filter/aggregate/join/sort)
- ``infera_tpu.parallel`` — mesh, sharding, distributed shuffle
- ``infera_tpu.cache`` / ``config`` / ``errors`` / ``log`` — support services
  (ref L0)
"""

import os as _os

if _os.environ.get("INFERA_PLATFORM"):
    # Backend selection (reference ROADMAP "GPU support"): the compute path
    # is pure JAX/XLA, so the same engine targets tpu/gpu/cpu — set
    # INFERA_PLATFORM before first use (maps to jax_platforms). TPU-only
    # Pallas kernels are probe-selected vs XLA per model at first execution
    # (INFERA_PALLAS_MLP=1/0 forces) and always fall back to XLA.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["INFERA_PLATFORM"])
    except Exception:  # jax already initialized — leave its backend alone
        pass

from .api import (  # noqa: F401
    clear_cache,
    get_cache_info,
    get_loaded_models,
    get_model_info,
    get_version,
    is_model_loaded,
    load_model,
    predict,
    predict_from_blob,
    set_autoload_dir,
    unload_all_models,
    unload_model,
)
from .engine import InferenceResult  # noqa: F401
from .errors import InferaError  # noqa: F401
from .version import VERSION  # noqa: F401

__version__ = VERSION
