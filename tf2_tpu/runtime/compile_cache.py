"""Persistent XLA compilation cache (reference parity: the prebuilt .aocx
FPGA bitstream, SURVEY.md §3 R10 — compile once offline, load at serve
time)."""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/tf2_tpu/xla")


def enable(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache. Call before first jit."""
    import jax

    d = cache_dir or os.environ.get("TF2TPU_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
