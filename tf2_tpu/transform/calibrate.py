"""Activation calibration — JAX-traced (reference parity: TF2's calibration
forward loop over a sample set, SURVEY.md §4.1; here the whole stat
collection runs on-device inside one jitted function per batch).

Estimators (SURVEY.md §8 hard-part 3: estimator choice is accuracy-critical):
- ``absmax``      : running max of |x| (fast, outlier-sensitive)
- ``percentile``  : per-batch high percentile of |x|, max-aggregated
- ``mse``         : clip value minimizing int8 quantization MSE, selected
                    over a candidate grid derived from absmax (2-pass)
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp

from ..graph.execute import execute
from ..graph.ir import Graph


_MAX_SAMPLE = 1 << 17  # 128k elements per tensor: plenty for a percentile


def _subsample(v: jax.Array) -> jax.Array:
    """Strided subsample to bound percentile/sort cost on huge activations
    (a sort over a full 2x112x112x64 map per layer made calibration the
    pipeline bottleneck; a 128k strided sample estimates the 99.99th
    percentile to well within the quantization step)."""
    flat = v.astype(jnp.float32).ravel()
    n = flat.shape[0]
    if n <= _MAX_SAMPLE:
        return flat
    step = n // _MAX_SAMPLE + 1
    return flat[::step]


def _collect_fn(graph: Graph, reduce_fn: Callable[[jax.Array], jax.Array]):
    run = execute(graph, intermediates=True)

    def fn(params, **inputs):
        _, env = run(params, **inputs)
        stats = {}
        for name, v in env.items():
            if jnp.issubdtype(v.dtype, jnp.floating):
                stats[name] = reduce_fn(v)
        return stats

    return jax.jit(fn)


def calibrate(graph: Graph, params: dict, batches: Iterable[dict],
              estimator: str = "percentile", percentile: float = 99.99,
              mse_candidates: int = 16) -> dict[str, float]:
    """Run calibration batches, return per-value activation scales
    (scale = clip/127). Keys cover every float intermediate + graph inputs."""
    if estimator == "absmax":
        red = lambda v: jnp.max(jnp.abs(v))
    elif estimator == "percentile":
        red = lambda v: jnp.percentile(_subsample(jnp.abs(v)), percentile)
    elif estimator == "mse":
        red = lambda v: jnp.max(jnp.abs(v))  # pass 1: absmax
    else:
        raise ValueError(f"unknown estimator {estimator!r}")

    fn = _collect_fn(graph, red)
    agg: dict[str, jax.Array] = {}
    batch_list = list(batches)
    if not batch_list:
        raise ValueError("calibration requires at least one batch")
    for batch in batch_list:
        stats = fn(params, **batch)
        for k, v in stats.items():
            agg[k] = jnp.maximum(agg[k], v) if k in agg else v

    if estimator == "mse":
        agg = _mse_refine(graph, params, batch_list, agg, mse_candidates)

    return {k: max(float(v), 1e-12) / 127.0 for k, v in agg.items()}


def _mse_refine(graph: Graph, params: dict, batches, absmax: dict,
                n_cand: int) -> dict[str, jax.Array]:
    """Pass 2: pick clip ∈ absmax·[0.35..1.0] minimizing int8 quant MSE."""
    ratios = jnp.linspace(0.35, 1.0, n_cand)
    run = execute(graph, intermediates=True)

    def fn(params, clips, **inputs):
        _, env = run(params, **inputs)
        errs = {}
        for name, v in env.items():
            if not jnp.issubdtype(v.dtype, jnp.floating):
                continue
            x = v.astype(jnp.float32).ravel()
            c = clips[name]  # (n_cand,)
            s = c / 127.0
            q = jnp.clip(jnp.round(x[None, :] / s[:, None]), -127, 127)
            err = jnp.mean(jnp.square(x[None, :] - q * s[:, None]), axis=1)
            errs[name] = err
        return errs

    jfn = jax.jit(fn)
    clips = {k: jnp.maximum(v, 1e-12) * ratios for k, v in absmax.items()}
    total: dict[str, jax.Array] = {}
    for batch in batches:
        errs = jfn(params, clips, **batch)
        for k, e in errs.items():
            total[k] = total.get(k, 0.0) + e
    return {k: clips[k][jnp.argmin(total[k])] for k in total}
