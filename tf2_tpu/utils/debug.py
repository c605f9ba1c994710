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


def checked_execute(graph: Graph, jit: bool = True):
    """checkify-guarded executor (SURVEY.md §6.2): NaN/inf and
    out-of-bounds index checks run INSIDE the jitted computation and
    surface as structured errors instead of silent garbage.

    Returns fn(params, **inputs) -> outputs, raising JaxRuntimeError with
    the failing primitive's location on the first NaN/OOB. ~2x slower than
    the plain executor — debug tool, not the serving path.
    """
    from jax.experimental import checkify

    base = execute(graph)
    checked = checkify.checkify(
        base, errors=checkify.float_checks | checkify.index_checks)
    if jit:
        checked = jax.jit(checked)

    def fn(params, **inputs):
        err, out = checked(params, **inputs)
        err.throw()
        return out

    return fn


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


def compare_shardings(graph: Graph, params, cfg, atol_quanta: int = 1,
                      min_exact: float = 0.99, **inputs) -> list[dict]:
    """Per-node TP-partitioning divergence localization (VERDICT r2
    item 9's tight gate).

    End-to-end sharded-vs-replicated comparisons amplify: one legitimate
    1-ulp FMA difference in an early requant flips an int8 value, which
    then shifts downstream accumulations by whole weights. So each node is
    compared TEACHER-FORCED: both executions see the reference env's exact
    inputs, isolating the node's own partitioning divergence, which must
    be <= ``atol_quanta`` everywhere and bit-exact on >= ``min_exact`` of
    elements. Returns the offending nodes (empty = gate passed).
    """
    from ..graph.execute import _OP_IMPLS
    from ..parallel.mesh import param_shardings

    ref_params = {k: jnp.asarray(v) for k, v in params.items()}
    _, env = execute(graph, intermediates=True)(ref_params, **inputs)
    env.update(inputs)
    psh = param_shardings(graph, cfg)
    sh_params = {k: jax.device_put(jnp.asarray(v), psh[k])
                 for k, v in params.items()}
    findings = []
    for node in graph.nodes:
        ref_out = np.asarray(env[node.name])
        if ref_out.dtype != np.int8:
            continue
        args = [jax.device_put(jnp.asarray(env[i]), cfg.replicated())
                for i in node.inputs]
        got = np.asarray(_OP_IMPLS[node.op](node, sh_params, *args))
        diff = np.abs(ref_out.astype(np.int32) - got.astype(np.int32))
        exact = float((diff == 0).mean())
        if diff.max() > atol_quanta or exact < min_exact:
            findings.append({"node": node.name, "op": node.op,
                             "max_quanta": int(diff.max()),
                             "exact_frac": exact})
    return findings


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
