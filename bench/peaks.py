"""Measured chip-peak probes (BASELINE.md §3 asked to re-verify the
public v5e numbers before gating anything — round 4 finally did, and the
HBM assumption was materially wrong for this chip).

Probes (checked two-point timing):
- int8 / bf16 MXU: large square dot_general
- HBM: 1r1w streaming mul, 2r1w add, read-only sum

Writes PEAKS.json. Findings on the sandbox "TPU v5 lite" (2026-08-21):
int8 362 TOPS and bf16 177 TFLOPS (~90% of the public v5e 394/197 —
consistent), but streaming 1r1w runs at ~460 GB/s and 2r1w at ~685 GB/s
aggregate, consistent with a ~230 GB/s WRITE limit and ~460+ GB/s reads
— roughly HALF the public v5e 819 GB/s duplex figure. Every
"sol_fraction" derived from 819 GB/s therefore understates how close
the engine is to this chip's physical envelope (ResNet-50 b64: 3.45 ms
measured vs a 2.1–3.1 ms envelope depending on read/write overlap —
60–90% of light, not 49%).

Usage: python -m bench.peaks
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf2_tpu.runtime.timing import device_time_checked

    out = {"device": str(jax.devices()[0])}

    n = 8192
    a8 = jnp.asarray(np.random.default_rng(0).integers(-100, 100, (n, n),
                                                       np.int8))
    b8 = jnp.asarray(np.random.default_rng(1).integers(-100, 100, (n, n),
                                                       np.int8))
    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    np.asarray(f(a8, b8))
    m = device_time_checked(lambda x: f(x, b8), (a8,), iters=16, reps=3)
    out["int8_tops"] = round(2 * n**3 / m["time_s"] / 1e12, 1)

    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)
    g = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    np.asarray(g(abf, bbf))
    m = device_time_checked(lambda x: g(x, bbf), (abf,), iters=16, reps=3)
    out["bf16_tflops"] = round(2 * n**3 / m["time_s"] / 1e12, 1)

    x = jnp.ones((256 * 1024 * 1024,), jnp.float32)
    h = jax.jit(lambda v: v * 1.5)
    np.asarray(h(x)[:4])
    m = device_time_checked(lambda v: h(v), (x,), iters=12, reps=3)
    out["hbm_1r1w_gbps"] = round(2 * x.nbytes / m["time_s"] / 1e9, 1)

    b2 = jnp.ones_like(x)
    k = jax.jit(lambda u, v: u + v)
    np.asarray(k(x, b2)[:4])
    m = device_time_checked(lambda u: k(u, b2), (x,), iters=12, reps=3)
    out["hbm_2r1w_gbps"] = round(3 * x.nbytes / m["time_s"] / 1e9, 1)

    s = jax.jit(lambda v: jnp.sum(v))
    float(s(x))
    m = device_time_checked(lambda v: s(v), (x,), iters=12, reps=3)
    out["hbm_read_sum_gbps"] = round(x.nbytes / m["time_s"] / 1e9, 1)

    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "PEAKS.json"), "w") as f2:
        json.dump(out, f2, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
