"""Graph pattern fusion: recognize MLP-shaped ONNX graphs and route them
through the fused Pallas kernel.

Detection walks the graph for the exact chain
``X → (MatMul|Gemm)(+bias) → Relu → ... → (MatMul|Gemm)(+bias) [→ Softmax] → Y``
with all weights as initializers. Matched models carry a ``mlp_params`` plan;
the engine uses the VMEM-resident fused kernel
(infera_tpu.ops.pallas_mlp) when running on TPU with INFERA_PALLAS_MLP=1 —
opt-in because the tunneled dev platform's Mosaic compiles are slow
(BASELINE.md); on a directly-attached TPU it is the better default.
"""

from __future__ import annotations

import os

import numpy as np

from . import proto


def detect_mlp(graph: proto.Graph):
    """Return (params [(w, b), ...], final_softmax) or None."""
    runtime_inputs = [v.name for v in graph.inputs
                      if v.name not in graph.initializers]
    if len(runtime_inputs) != 1 or len(graph.outputs) != 1:
        return None
    # consumer map: value name → list of consuming nodes
    consumers: dict = {}
    for node in graph.nodes:
        for i in node.inputs:
            consumers.setdefault(i, []).append(node)

    def only_consumer(name):
        c = consumers.get(name, [])
        return c[0] if len(c) == 1 else None

    def init_array(name):
        t = graph.initializers.get(name)
        return None if t is None else np.asarray(t.array)

    params = []
    cur = runtime_inputs[0]
    out_name = graph.outputs[0].name
    final_softmax = False
    while True:
        node = only_consumer(cur)
        if node is None:
            return None
        if node.op_type in ("MatMul", "Gemm"):
            if node.op_type == "Gemm" and (
                node.attr("transA", 0) or node.attr("alpha", 1.0) != 1.0
                or node.attr("beta", 1.0) != 1.0
            ):
                return None
            w = init_array(node.inputs[1])
            if w is None or w.ndim != 2:
                return None
            if node.op_type == "Gemm" and node.attr("transB", 0):
                w = w.T
            b = None
            nxt = node.outputs[0]
            if node.op_type == "Gemm" and len(node.inputs) > 2:
                b = init_array(node.inputs[2])
            else:
                add = only_consumer(nxt)
                if add is not None and add.op_type == "Add":
                    cand = (init_array(add.inputs[1])
                            if add.inputs[0] == nxt else init_array(add.inputs[0]))
                    if cand is not None and cand.ndim == 1:
                        b = cand
                        nxt = add.outputs[0]
            if b is None:
                b = np.zeros(w.shape[1], np.float32)
            if b.shape != (w.shape[1],):
                return None
            params.append((w.astype(np.float32), b.astype(np.float32)))
            cur = nxt
        elif node.op_type == "Relu":
            if not params:
                return None
            cur = node.outputs[0]
        elif node.op_type == "Softmax":
            if node.attr("axis", -1) not in (-1, 1):
                return None
            final_softmax = True
            cur = node.outputs[0]
            break
        elif node.op_type == "Identity":
            cur = node.outputs[0]
        else:
            return None
        if cur == out_name:
            break
    if cur != out_name or not params:
        return None
    # activations between layers must be Relu (already enforced by the walk:
    # anything else bailed out)
    return params, final_softmax


def pallas_mlp_enabled() -> bool:
    return os.environ.get("INFERA_PALLAS_MLP") == "1"


def maybe_run_fused(model, arr):
    """Run via the fused kernel when the model matched and it's enabled.
    Returns the output array or None (caller falls back to the XLA path)."""
    plan = getattr(model, "mlp_plan", None)
    if plan is None or not pallas_mlp_enabled():
        return None
    if arr.ndim != 2 or arr.shape[1] != plan[0][0][0].shape[0]:
        return None
    import jax.numpy as jnp

    from ..ops.pallas_mlp import fused_mlp_padded, vmem_fits

    params, final_softmax = plan
    if not vmem_fits(params, 1024, arr.shape[1]):
        return None
    jparams = [(jnp.asarray(w), jnp.asarray(b)) for w, b in params]
    return fused_mlp_padded(jparams, jnp.asarray(arr),
                            final_softmax=final_softmax)
