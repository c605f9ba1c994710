"""Activation shape inference for IR graphs (shared by the autotuner,
the engine's predecode planner and the roofline analyzer).

Uses jax.eval_shape over the executor with intermediates tapped — abstract
evaluation only, no FLOPs, no device. The jnp reference path is forced so
no Pallas lowering happens during shape inference.
"""
from __future__ import annotations

import jax
import numpy as np

from .ir import Graph


def activation_shapes(graph: Graph, params=None) -> dict[str, tuple]:
    """Name -> shape for every value (inputs, node outputs) in the graph."""
    from ..kernels import dispatch
    from .execute import execute

    ins = {k: jax.ShapeDtypeStruct(tuple(v.shape), v.dtype)
           for k, v in graph.inputs.items()}
    if params is not None:
        ps = {k: jax.ShapeDtypeStruct(tuple(np.asarray(v).shape),
                                      np.asarray(v).dtype)
              for k, v in params.items()}
    else:
        ps = {k: jax.ShapeDtypeStruct(tuple(v.shape), v.dtype)
              for k, v in graph.params.items()}

    prev = dispatch._USE_PALLAS
    dispatch.set_use_pallas(False)
    try:
        _, env = jax.eval_shape(
            lambda p, i: execute(graph, intermediates=True)(p, **i), ps, ins)
    finally:
        dispatch.set_use_pallas(prev)
    out = {k: tuple(v.shape) for k, v in env.items()}
    for k, v in graph.inputs.items():
        out.setdefault(k, tuple(v.shape))
    return out
