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
_NOISE_FLOOR: float | None = None


class NoiseFloorError(RuntimeError):
    """Raised when a requested measurement is provably below the noise
    floor of this dispatch path (VERDICT r2 item 7: flag, don't report)."""


def noise_floor_s(refresh: bool = False) -> float:
    """Measured jitter of one dispatch round-trip (spread over reps of a
    trivial jitted scalar op). Any single-run timing DELTA smaller than a
    few multiples of this is noise, whatever the mean says. Two-point
    measurements must scale scan length until signal >= ~10x this."""
    global _NOISE_FLOOR
    if _NOISE_FLOOR is not None and not refresh:
        return _NOISE_FLOOR
    g = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0)
    float(g(s))  # compile
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(g(s))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    # spread of the central mass (drop top 2 outliers), min-bounded: even a
    # perfectly quiet relay has scheduling noise ~0.1 ms
    _NOISE_FLOOR = max(ts[-3] - ts[0], 1e-4)
    return _NOISE_FLOOR


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


def device_time_checked(step_fn: Callable, args: tuple, carry_arg: int = 0,
                        iters: int = 32, reps: int = 5,
                        floor_s: float | None = None,
                        signal_ratio: float = 10.0,
                        max_iters: int = 4096) -> dict:
    """Adaptive two-point timing with an explicit noise budget (the fix for
    VERDICT r2 weak #1: round 2's routing table was built from iters=8
    two-point scans whose delta sat BELOW the relay jitter, so winners were
    coin flips).

    Doubles the scan length until the two-point delta t(3N)-t(N) is at
    least ``signal_ratio`` x the measured dispatch jitter (noise_floor_s),
    then reports per-iter time plus quality metadata. If ``floor_s`` (a
    physics lower bound, e.g. HBM speed-of-light for the op's traffic) is
    given and the final reading lands below it, the reading is rejected:
    a sub-SOL time is by definition not a measurement of the op.

    Returns {"time_s", "iters", "delta_s", "noise_s", "ok", "reason"}.
    Raises NoiseFloorError only when ``floor_s`` is violated — an
    insufficient signal ratio at max_iters is reported with ok=False so
    sweeps can skip rather than crash.
    """

    def body(carry, _):
        a = list(args)
        a[carry_arg] = carry
        out = step_fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        eps = (jnp.sum(leaf.astype(jnp.float32)) * 1e-20).reshape(())
        # cast back so integer carries (int8 engine outputs) chain too:
        # the epsilon is a data dependency, not a value change — XLA
        # cannot prove it zero, so the chained op is never DCE'd
        return (carry + eps).astype(carry.dtype), None

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

    noise = noise_floor_s()
    n = max(8, iters)
    if floor_s is not None and floor_s > 0:
        # seed the scan length from the physics floor: the op can't be
        # faster than floor_s, so this N meets the signal budget in one
        # shot for a floor-speed op and avoids compile-heavy doubling
        # (each scan length is a fresh XLA program; compiles dominate
        # sweep cost under the relay)
        n = min(max(n, int(signal_ratio * noise / (2 * floor_s)) + 1),
                max_iters)
    while True:
        t1 = run(n)
        t3 = run(3 * n)
        delta = t3 - t1
        if delta >= signal_ratio * noise or n >= max_iters:
            break
        # scale to the iters that WOULD meet the budget, at least doubling
        per = max(delta / (2 * n), 1e-9)
        need = int(signal_ratio * noise / (2 * per)) + 1
        n = min(max(2 * n, need), max_iters)
    per_iter = max(delta / (2 * n), 1e-9)
    ok = delta >= signal_ratio * noise and delta > 0
    reason = "" if ok else (
        f"two-point delta {delta*1e3:.3f} ms < {signal_ratio:.0f}x noise "
        f"floor {noise*1e3:.3f} ms at max scan length {n}")
    if floor_s is not None and ok and per_iter < floor_s:
        raise NoiseFloorError(
            f"measured {per_iter*1e6:.1f} us is below the physics floor "
            f"{floor_s*1e6:.1f} us for this op — timing path is broken")
    return {"time_s": per_iter, "iters": n, "delta_s": delta,
            "noise_s": noise, "ok": ok, "reason": reason}
