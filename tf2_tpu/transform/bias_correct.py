"""Post-quantization bias correction (SURVEY.md §8 hard-part 3's accuracy
recipe; the DFQ/AdaRound-family trick: quantization error has a nonzero
per-channel mean, and folding that mean into the requant bias removes a
systematic output shift at zero runtime cost).

Method (teacher-forced, one pass over the calibration set):
for each qconv2d/qdense node in topological order,
    x_fp  = the FOLDED-FP32 graph's input activation for that layer
    x_q   = quantize(x_fp, s_in)                # the runtime's true input
    y_q   = dequant(acc(x_q) * es + eb)         # pre-activation, no relu
    y_fp  = the FP32 layer's pre-activation output
    eb   += mean_over(batch, spatial)(y_fp - y_q) / s_out   # per channel

The correction lands in the artifact's existing ``.eb`` vectors — the
runtime/kernels are untouched and the artifact format is unchanged.
"""
from __future__ import annotations

from typing import Iterable, Mapping

import numpy as np


def _fp_name(q_input: str) -> str:
    """Map a quantized-graph input value name to its folded-graph analog:
    inserted quantize nodes are named '<orig>__q'."""
    return q_input[:-3] if q_input.endswith("__q") else q_input


def bias_correct(art, folded_graph, folded_params: Mapping,
                 batches: Iterable[dict]) -> int:
    """Mutates ``art.params`` eff-bias vectors in place; returns the number
    of corrected layers."""
    import jax
    import jax.numpy as jnp

    from ..graph.execute import execute
    from ..graph.ir import Node
    from ..kernels import dispatch

    batches = list(batches)
    if not batches:
        return 0
    fp_fn = jax.jit(execute(folded_graph, intermediates=True))

    # pre-activation fp values: for a fused-relu q-node named after the
    # relu, the conv/dense node's own (pre-relu) value is what we diff
    relu_src = {}
    for n in folded_graph.nodes:
        if n.op == "relu":
            relu_src[n.name] = n.inputs[0]

    qparams = {k: jnp.asarray(v) for k, v in art.params.items()}
    corrected = 0
    # accumulate means over all calibration batches
    for node in art.graph.nodes:
        if node.op not in ("qconv2d", "qdense"):
            continue
        s_in = float(node.attrs["in_scale"])
        s_out = float(node.attrs["out_scale"])
        fp_in_name = _fp_name(node.inputs[0])
        fp_out_name = relu_src.get(node.name, node.name)
        # pre-activation variant of the node (relu off)
        pre = Node(node.name, node.op, node.inputs, node.params,
                   dict(node.attrs, relu=False))
        impl = (dispatch.qconv2d if node.op == "qconv2d" else dispatch.qdense)
        err_sum = None
        count = 0
        for batch in batches:
            _, env = fp_fn(folded_params, **batch)
            env = {**batch, **env}
            x_fp = env[fp_in_name]
            y_fp = np.asarray(env[fp_out_name], np.float64)
            x_q = jnp.clip(jnp.round(x_fp / s_in), -127, 127
                           ).astype(jnp.int8)
            args = [x_q]
            if len(node.inputs) > 1:
                # residual-folded qdense (QuantSpec.fold_residual): the
                # node's fp output is the ADD's output, so the teacher-
                # forced replay must include the quantized residual —
                # omitting it would fold the whole residual mean into eb
                s_r = float(node.attrs["radd_scale"]) * s_out
                r_fp = env[_fp_name(node.inputs[1])]
                args.append(jnp.clip(jnp.round(r_fp / s_r), -127, 127
                                     ).astype(jnp.int8))
            prev = dispatch._USE_PALLAS
            dispatch.set_use_pallas(False)
            try:
                y_q = np.asarray(impl(pre, qparams, *args), np.float64) * s_out
            finally:
                dispatch.set_use_pallas(prev)
            diff = (y_fp - y_q).reshape(-1, y_fp.shape[-1])
            err_sum = diff.sum(0) if err_sum is None else err_sum + diff.sum(0)
            count += diff.shape[0]
        if count == 0:
            continue
        mean_err = err_sum / count                      # per out-channel
        eb_name = node.params[2]
        eb = np.asarray(art.params[eb_name], np.float64)
        art.params[eb_name] = (eb + mean_err / s_out).astype(np.float32)
        qparams[eb_name] = jnp.asarray(art.params[eb_name])
        corrected += 1
    return corrected
