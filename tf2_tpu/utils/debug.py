"""Debug & verification utilities (SURVEY.md §6.2).

The FPGA reference had no sanitizer story; here:
- ``interpret_mode()``: force every Pallas kernel through the interpreter
  (CPU-exact, python-level) for kernel-logic debugging;
- ``check_finite``: checkify-based guarded execution that localizes the
  first non-finite intermediate to a graph node name;
- ``compare_backends``: run a graph on the reference (XLA) and kernel
  (Pallas) dispatch paths and report the first diverging node.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.execute import execute
from ..graph.ir import Graph
from ..kernels import dispatch


@contextlib.contextmanager
def interpret_mode():
    """All pallas_calls run interpreted (and dispatch stays on kernels)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def check_finite(graph: Graph, params, **inputs) -> str | None:
    """Returns the name of the first node producing a non-finite value, or
    None if everything is finite. Runs with intermediates tapped."""
    _, env = execute(graph, intermediates=True)(params, **inputs)
    for node in graph.nodes:
        v = env[node.name]
        if jnp.issubdtype(v.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(v))):
                return node.name
    return None


def compare_backends(graph: Graph, params, atol_quanta: float = 1.5,
                     **inputs) -> list[dict]:
    """Execute with Pallas dispatch vs XLA reference dispatch; report nodes
    whose outputs diverge by more than ``atol_quanta`` int8 steps (scaled
    by that node's out_scale where known). Returns list of findings."""
    prev = dispatch._USE_PALLAS
    try:
        dispatch.set_use_pallas(False)
        _, env_ref = execute(graph, intermediates=True)(params, **inputs)
        dispatch.set_use_pallas(True)
        if jax.default_backend() == "cpu":
            # compiled Pallas requires TPU; interpret on CPU
            with interpret_mode():
                _, env_ker = execute(graph, intermediates=True)(params, **inputs)
        else:
            _, env_ker = execute(graph, intermediates=True)(params, **inputs)
    finally:
        dispatch.set_use_pallas(prev)
    findings = []
    for node in graph.nodes:
        a = np.asarray(env_ref[node.name])
        b = np.asarray(env_ker[node.name])
        if a.dtype == np.int8:
            diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
            if diff.max() > atol_quanta:
                findings.append({"node": node.name, "op": node.op,
                                 "max_quanta": int(diff.max()),
                                 "frac_diff": float((diff > 0).mean())})
    return findings
