"""ONNX graph → XLA executor.

Replaces the reference's tract compile/run pipeline
(/root/reference/infera/src/engine.rs:48-55 ``into_optimized().into_runnable()``,
:144 ``model.run``). Design differences, TPU-first:

- The whole graph traces into ONE jitted XLA computation (fused by XLA onto
  MXU/VPU) instead of an interpreted operator plan.
- Executables are cached per concrete input shape; callers bucket batch sizes
  to keep the cache small (SURVEY.md §7.3 static-shape strategy).
- Values produced only from initializers/Constants are folded to host numpy at
  trace time so shape-carrying inputs (Reshape targets, Slice indices) are
  static for XLA.
- Unlike tract plans, batch size is free: a model exported with fixed batch 1
  runs any row count (fixes the reference's unchecked ROADMAP §1 item
  "Automatic batch splitting for models with a fixed batch size").
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import OnnxError
from . import proto
from .ops import get_impl


VALID_PRECISIONS = ("f32", "bf16", "int8")


class _Ctx:
    """Per-trace context handed to op impls for static-value resolution and
    the model's matmul precision policy (f32 parity / bf16 / int8)."""

    def __init__(self, values: dict, matmul_precision: str = "f32"):
        self._values = values
        self.matmul_precision = matmul_precision

    def as_static(self, value):
        """Return a numpy array if the value is statically known, else None."""
        if isinstance(value, str):
            value = self._values.get(value)
        if isinstance(value, np.ndarray):
            return value
        if np.isscalar(value):
            return np.asarray(value)
        return None

    def run_subgraph(self, graph, inputs: list) -> list:
        """Execute a nested GraphProto (If branch, Loop/Scan body) with ONNX
        outer-scope capture: names not bound by the subgraph resolve against
        this context's values. ``inputs`` bind positionally to graph.inputs.

        The reference inherits this from tract's full opset
        (/root/reference/infera/src/engine.rs:49-55); here the subgraph
        traces into the same XLA computation as its parent."""
        values = dict(self._values)
        for name, t in graph.initializers.items():
            values[name] = np.asarray(t.array)
        for vi, arr in zip(graph.inputs, inputs):
            values[vi.name] = arr
        child = _Ctx(values, self.matmul_precision)
        return _run_nodes(graph, values, child)


def _toposort(graph: proto.Graph, extra_available: set | None = None) -> list:
    """Topologically order nodes (ONNX graphs are usually ordered, but not
    guaranteed). ``extra_available`` marks names resolvable from an outer
    scope (subgraph execution)."""
    produced = set(graph.initializers)
    produced.update(v.name for v in graph.inputs)
    produced.add("")  # optional inputs
    if extra_available:
        produced.update(extra_available)
    remaining = list(graph.nodes)
    ordered = []
    while remaining:
        progressed = False
        next_remaining = []
        for n in remaining:
            if all(i in produced for i in n.inputs):
                ordered.append(n)
                produced.update(n.outputs)
                progressed = True
            else:
                next_remaining.append(n)
        remaining = next_remaining
        if not progressed:
            missing = {i for n in remaining for i in n.inputs if i not in produced}
            raise OnnxError(f"graph has unresolvable inputs: {sorted(missing)[:5]}")
    return ordered


def _run_nodes(graph: proto.Graph, values: dict, ctx: "_Ctx",
               ordered: list | None = None) -> list:
    """Execute graph nodes against ``values`` (mutated in place); returns the
    graph's declared outputs. Shared by top-level tracing and subgraph
    execution (If/Loop/Scan bodies).

    Static fold note: if every input is host numpy and the op is pure
    shape/const manipulation, results stay numpy automatically (jnp ops on
    numpy return jnp; only ops that return numpy themselves — Shape /
    Constant / Range — keep values static)."""
    if ordered is None:
        ordered = _toposort(graph, extra_available=set(values))
    for node in ordered:
        impl = get_impl(node.domain, node.op_type)
        inputs = [values[i] if i else None for i in node.inputs]
        outputs = impl(node, inputs, ctx)
        for out_name, out_val in zip(node.outputs, outputs):
            if out_name:
                values[out_name] = out_val
    outs = []
    for v in graph.outputs:
        if v.name not in values:
            raise OnnxError(f"subgraph '{graph.name}' missing output '{v.name}'")
        outs.append(values[v.name])
    return outs


class CompiledOnnxModel:
    """A loaded ONNX model with shape metadata and a per-shape jit cache.

    Shape metadata mirrors engine.rs:64-73: dims are ints with -1 for
    dynamic/symbolic dims; input_shape/output_shape are the first graph
    input/output (the reference only reads fact 0).
    """

    def __init__(self, model: proto.Model, name: str, precision: str = "f32"):
        if precision not in VALID_PRECISIONS:
            raise OnnxError(
                f"unsupported precision '{precision}' "
                f"(expected one of {', '.join(VALID_PRECISIONS)})")
        self.precision = precision
        self.name = name
        self.model = model
        self.graph = model.graph
        self.nodes = _toposort(model.graph)
        # Graph inputs that are NOT initializers are runtime inputs.
        self.runtime_inputs = [
            v for v in self.graph.inputs if v.name not in self.graph.initializers
        ]
        if not self.runtime_inputs:
            raise OnnxError(f"model '{name}' has no runtime inputs")
        self.input_shape: list[int] = [
            int(d) if d is not None and d > 0 else -1
            for d in self.runtime_inputs[0].shape
        ]
        out0 = self.graph.outputs[0] if self.graph.outputs else None
        if out0 is not None and out0.has_shape and out0.shape:
            self.output_shape = [int(d) if d and d > 0 else -1 for d in out0.shape]
        else:
            self.output_shape = self._infer_output_shape()
        self._jit_cache: dict = {}
        self._cache_lock = threading.Lock()
        # MLP pattern plan for the fused Pallas kernel (None if no match)
        from .fusion import detect_mlp

        try:
            self.mlp_plan = detect_mlp(model.graph)
        except Exception:  # detection is best-effort
            self.mlp_plan = None

    # -- tracing ----------------------------------------------------------

    def _run_graph(self, *args):
        """Execute the graph given positional runtime inputs (traced)."""
        values: dict = {}
        for name, t in self.graph.initializers.items():
            values[name] = np.asarray(t.array)
        for vi, arr in zip(self.runtime_inputs, args):
            values[vi.name] = arr
        ctx = _Ctx(values, self.precision)
        # propagate the eager-calibration flag: ops record per-node
        # activation scales only when the CTX carries it (reading it off
        # the model object left the static int8 path dead — round-3 fix)
        ctx._calibrating = getattr(self, "_calibrating", False)
        _run_nodes(self.graph, values, ctx, self.nodes)
        outs = []
        for v in self.graph.outputs:
            if v.name not in values:
                raise OnnxError(f"model '{self.name}' missing output '{v.name}'")
            val = values[v.name]
            if isinstance(val, tuple):
                # sequence values are trace-time containers; a sequence
                # GRAPH OUTPUT has no tensor shape to marshal
                raise OnnxError(
                    f"model '{self.name}' output '{v.name}' is a sequence; "
                    f"concat it (ConcatFromSequence) to a tensor output")
            outs.append(jnp.asarray(val))
        return outs

    def _infer_output_shape(self) -> list[int]:
        """Trace with the declared input shape (dyn dims → 1) to get the
        output rank/shape; dims tied to the batch are reported as -1."""
        shapes = []
        for vi in self.runtime_inputs:
            s = [int(d) if d and d > 0 else 1 for d in (vi.shape or [1])]
            shapes.append(tuple(s))
        try:
            out = jax.eval_shape(
                self._run_graph,
                *[jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes],
            )
            return [int(d) for d in out[0].shape]
        except Exception as e:  # pragma: no cover - surfaced as OnnxError
            raise OnnxError(f"shape inference failed for '{self.name}': {e}")

    # -- execution --------------------------------------------------------

    # Bound on retained executables per model: power-of-two batch bucketing
    # keeps the practical population tiny, but an adversarial mix of shapes
    # must not grow memory without limit.
    MAX_CACHED_EXECUTABLES = 32

    def executable_for(self, shapes: tuple, dtypes: tuple):
        """Return a jitted callable for the given concrete input shapes."""
        key = (shapes, dtypes)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        with self._cache_lock:
            fn = self._jit_cache.get(key)
            if fn is None:
                if len(self._jit_cache) >= self.MAX_CACHED_EXECUTABLES:
                    # drop the oldest entry (dict preserves insertion order)
                    self._jit_cache.pop(next(iter(self._jit_cache)))
                fn = jax.jit(self._run_graph)
                self._jit_cache[key] = fn
        return fn

    def run_data_parallel(self, mesh, *arrays) -> list:
        """Run with the batch dimension sharded over the mesh's dp axis —
        multi-chip data-parallel inference for any loaded model (weights are
        replicated; TP-sharding of large weights rides the mp axis via the
        parallel.pipeline paths). Rows must divide the dp size."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        key = ("dp", id(mesh)) + tuple(tuple(a.shape) for a in arrays)
        fn = self._jit_cache.get(key)
        if fn is None:
            with self._cache_lock:
                fn = self._jit_cache.get(key)
                if fn is None:
                    in_shardings = tuple(
                        NamedSharding(mesh, P("dp", *([None] * (a.ndim - 1))))
                        for a in arrays
                    )
                    fn = jax.jit(self._run_graph, in_shardings=in_shardings)
                    if len(self._jit_cache) >= self.MAX_CACHED_EXECUTABLES:
                        self._jit_cache.pop(next(iter(self._jit_cache)))
                    self._jit_cache[key] = fn
        try:
            return fn(*arrays)
        except OnnxError:
            raise
        except Exception as e:
            raise OnnxError(str(e))

    def calibrate_int8(self, sample_arrays) -> None:
        """Record static per-tensor activation scales from a calibration
        sample (round-3): one eager f32 pass through the graph stores
        max|activation|/127 on each matmul node, after which int8 inference
        quantizes with trace-time-constant scales — no per-row max/divide,
        dequant folded into the per-channel weight scales. Reference parity
        note: quantization is an unchecked ROADMAP item there
        (/root/reference/ROADMAP.md); this is the static-calibration design
        its "Model quantization" row describes."""
        if self.precision != "int8" or getattr(self, "_int8_calibrated", False):
            return
        with self._cache_lock:
            if getattr(self, "_int8_calibrated", False):
                return
            sample = []
            for a in sample_arrays:
                a = np.asarray(a)
                if a.ndim and a.shape[0] > 4096:
                    a = a[:4096]  # a slice calibrates as well as the batch
                sample.append(a)
            self._calibrating = True
            try:
                self._run_graph(*sample)
            except Exception:
                pass  # dynamic per-row fallback stays available and correct
            finally:
                self._calibrating = False
            self._int8_calibrated = True

    def run(self, *arrays) -> list:
        """Run the model on device arrays / numpy arrays; returns jnp arrays."""
        if self.precision == "int8" and not getattr(self, "_int8_calibrated",
                                                    False):
            # first execution doubles as the calibration sample
            self.calibrate_int8(arrays)
        if (len(arrays) == 1 and self.mlp_plan is not None
                and self.precision == "int8"):
            from .fusion import maybe_run_int8_fused

            # pass the array as-is: np.asarray of a device array would
            # pull it to the host (a full-tensor round trip per call)
            fused = maybe_run_int8_fused(self, arrays[0])
            if fused is not None:
                return [fused]
        if len(arrays) == 1 and self.mlp_plan is not None and self.precision == "f32":
            from .fusion import maybe_run_fused

            a0 = np.asarray(arrays[0])

            def xla_fn(a):
                fn = self.executable_for((tuple(a.shape),),
                                         (str(np.asarray(a).dtype),))
                return fn(a)[0]

            fused = maybe_run_fused(self, a0, xla_fn=xla_fn)
            if fused is not None:
                return [fused]
        shapes = tuple(tuple(a.shape) for a in arrays)
        dtypes = tuple(str(np.asarray(a).dtype) if isinstance(a, np.ndarray) else str(a.dtype) for a in arrays)
        fn = self.executable_for(shapes, dtypes)
        try:
            return fn(*arrays)
        except OnnxError:
            raise
        except Exception as e:
            raise OnnxError(str(e))


def compile_model_file(path, name: str, precision: str = "f32") -> CompiledOnnxModel:
    try:
        model = proto.load_model_file(path)
    except FileNotFoundError as e:
        raise OnnxError(str(e))
    except (proto.WireError, OSError, ValueError) as e:
        raise OnnxError(str(e))
    return CompiledOnnxModel(model, name, precision)


def compile_model_bytes(data: bytes, name: str, precision: str = "f32") -> CompiledOnnxModel:
    try:
        model = proto.load_model_bytes(data)
    except (proto.WireError, ValueError) as e:
        raise OnnxError(str(e))
    return CompiledOnnxModel(model, name, precision)


def shape_rows_cols(shape) -> tuple[int, int]:
    """Flatten a tensor shape to (rows, cols) — parity with
    engine.rs:19-29: scalar→(1,1), 1-D→(n,1), N-D→(d0, prod(d1..))."""
    shape = list(shape)
    if len(shape) == 0:
        return (1, 1)
    if len(shape) == 1:
        return (shape[0], 1)
    cols = 1
    for d in shape[1:]:
        cols *= d
    return (shape[0], max(cols, 1))
