"""Parameter materialization for IR graphs.

No pretrained checkpoints exist in this sandbox (SURVEY.md Appendix A), so
models run with deterministic He-initialized weights; accuracy work uses
golden-parity methodology (FP32 vs quantized on identical weights). When the
driver supplies real checkpoints, `transform.importers` maps them onto these
same param names.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .ir import Graph


def init_params(graph: Graph, seed: int = 0, dtype=jnp.float32) -> dict[str, jax.Array]:
    """He-normal conv/dense weights, zero biases, identity BN."""
    params: dict[str, jax.Array] = {}
    key = jax.random.PRNGKey(seed)
    for name, spec in sorted(graph.params.items()):
        key, sub = jax.random.split(key)
        shape = spec.shape
        if name.endswith(".w") or name.endswith(".wqkv") or name.endswith(".wo"):
            fan_in = 1
            for d in shape[:-1]:
                fan_in *= d
            std = (2.0 / max(fan_in, 1)) ** 0.5
            params[name] = std * jax.random.normal(sub, shape, dtype)
        elif name.endswith(".scale"):
            params[name] = jnp.ones(shape, dtype)
        elif name.endswith(".var"):
            # random-ish positive variances keep BN-fold tests honest
            params[name] = 0.5 + jax.random.uniform(sub, shape, dtype)
        elif name.endswith(".mean"):
            params[name] = 0.1 * jax.random.normal(sub, shape, dtype)
        else:  # biases, offsets
            params[name] = jnp.zeros(shape, dtype)
    return params
