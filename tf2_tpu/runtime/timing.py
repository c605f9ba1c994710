"""Device-side timing (SURVEY.md §6.1).

The axon relay in this sandbox adds ~25 ms of RPC latency per dispatch AND
`block_until_ready` does not actually block (measured: a host-timed loop
"ran" at 10 PFLOPS). Any host-side per-iteration loop is therefore
meaningless. Correct methodology, used by every benchmark in this repo:

1. chain N iterations INSIDE one jit via lax.scan, with a data dependency
   (a tiny epsilon of each output folded into the carry) so XLA cannot
   dedupe or reorder the iterations;
2. fetch one scalar (forces completion);
3. subtract the measured scalar-RPC baseline; divide by N.

On a direct-attached TPU this methodology is still valid (just with a
smaller baseline), so nothing here is sandbox-specific.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

_RPC_BASELINE: float | None = None


def rpc_baseline_s(refresh: bool = False) -> float:
    """Measured scalar-dispatch roundtrip (amortized fixed cost)."""
    global _RPC_BASELINE
    if _RPC_BASELINE is not None and not refresh:
        return _RPC_BASELINE
    g = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0)
    float(g(s))  # compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        s = g(s)
        float(s)
    _RPC_BASELINE = (time.perf_counter() - t0) / reps
    return _RPC_BASELINE


def device_time_s(step_fn: Callable, args: tuple, carry_arg: int = 0,
                  iters: int = 20, reps: int = 3,
                  two_point: bool = False) -> float:
    """Per-iteration wall time of ``step_fn(*args)`` with iterations chained
    device-side. ``carry_arg`` selects which positional arg carries the
    dependency (must be a float array).

    ``two_point=True`` times two scan lengths (iters and 3*iters) and uses
    the difference, cancelling the fixed dispatch cost exactly — required
    for sub-ms ops where the ~25 ms relay-RPC baseline's VARIANCE alone
    swamps the signal (measured: baseline subtraction read 0.0 ms for
    0.6 ms convs). Costs a second compile, so whole-model benchmarks (signal
    >> noise) keep the single-scan baseline-subtraction mode."""

    def body(carry, _):
        a = list(args)
        a[carry_arg] = carry
        out = step_fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        # depend on a REDUCTION of the full output: a single-element slice
        # would let XLA dead-code-eliminate most of the op under test
        # (measured: a sliced conv benchmark reads ~0 ms), while a sum keeps
        # every output element live at negligible extra cost
        eps = (jnp.sum(leaf.astype(jnp.float32)) * 1e-20).reshape(())
        return carry + eps, None

    def chained(x0, length):
        final, _ = lax.scan(body, x0, None, length=length)
        return final.ravel()[0].astype(jnp.float32)

    x0 = args[carry_arg]

    def run(length) -> float:
        jfn = jax.jit(lambda x: chained(x, length))
        float(jfn(x0))  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jfn(x0))
            times.append(time.perf_counter() - t0)
        return min(times)

    if two_point:
        t1 = run(iters)
        t3 = run(3 * iters)
        return max((t3 - t1) / (2 * iters), 1e-9)
    per_iter = (run(iters) - rpc_baseline_s()) / iters
    return max(per_iter, 1e-9)
