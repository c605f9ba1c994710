"""Batch-1 / weight-bound Pallas experiment (VERDICT r3 task 1 — the last
open front of SURVEY.md §8 hard-part 1).

The round-3 verdict: per-op Pallas kernels lose in-context at b64 AND b1
(per-call overhead x 54 calls), and the qblockchain kernel loses at b64
(Mosaic f32 intermediates). THIS experiment measures the one regime the
roofline says pot4 kernels could win: batch-1, where ResNet-50 is
weight-traffic-bound (~26 MB int8 vs ~13 MB pot4 per forward against a
~0.17 ms budget) and the chain kernel replaces ~40 XLA calls with 4.

Measures, whole-graph in-context (checked two-point timing, one process,
interleaved):
  A. b1 pure-XLA baseline (the shipped configuration)
  B. b1 with qblockchain fusion (Engine(block_fusion=True))
  C. b1 with the FC layer routed to the pot4 shift_matmul kernel
  D. b64 same three, for the contrast row
plus bit-parity checks B==A and C==A.

Writes B1_PALLAS.json; the BASELINE.md §3.8 verdict is derived from it.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def measure(graph, params, batch, *, block_fusion=False, fc_pallas=False,
            iters=64):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf2_tpu.kernels import autotune
    from tf2_tpu.runtime.engine import Engine
    from tf2_tpu.runtime.timing import device_time_checked

    g = graph.with_batch_size(batch)
    if fc_pallas:
        # in-memory route (not persisted): predecode keeps the FC packed
        # pot4 and dispatch takes kernels/shift_matmul.qmatmul_pot4
        from tf2_tpu.graph.shapes import activation_shapes
        shapes = activation_shapes(g, params)
        for n in g.nodes:
            if n.op == "qdense":
                key = autotune.dense_key(shapes[n.inputs[0]],
                                         n.attrs["kshape"], n.attrs["wfmt"])
                autotune.record(key, "pallas")
    try:
        eng = Engine(g, params, block_fusion=block_fusion)
        iname = next(iter(g.inputs))
        x = jax.random.normal(jax.random.PRNGKey(0), g.inputs[iname].shape,
                              jnp.float32)
        eng.build(**{iname: x})
        out = np.asarray(eng.run(**{iname: x}))

        def step(xx, p):
            return eng._fn(p, **{iname: xx})

        m = device_time_checked(step, (x, eng.params), iters=iters, reps=3)
        return {"ms": round(m["time_s"] * 1e3, 4), "ok": m["ok"],
                "iters": m["iters"]}, out
    finally:
        if fc_pallas:
            autotune.set_table_path(None)  # drop the in-memory route


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--art", default="/tmp/tf2tpu_bench_r50_int4")
    ap.add_argument("--out", default="B1_PALLAS.json")
    args = ap.parse_args(argv)

    import numpy as np

    from bench.tune_sweep import ensure_artifact
    from tf2_tpu.runtime import compile_cache
    from tf2_tpu.transform import load_artifact

    compile_cache.enable()
    ensure_artifact(args.art, "resnet50")
    graph, params = load_artifact(args.art)

    report = {}
    for b in (1, 64):
        base, out_a = measure(graph, params, b,
                              iters=600 if b == 1 else 30)
        chain, out_b = measure(graph, params, b, block_fusion=True,
                               iters=600 if b == 1 else 30)
        fc, out_c = measure(graph, params, b, fc_pallas=True,
                            iters=600 if b == 1 else 30)
        agree_chain = float((out_a == out_b).mean())
        agree_fc = float((out_a == out_c).mean())
        report[f"b{b}"] = {
            "xla_baseline": base, "qblockchain": chain, "fc_pallas": fc,
            "chain_exact_frac": agree_chain, "fc_exact_frac": agree_fc,
        }
        print(f"b{b}: xla {base['ms']} ms | chain {chain['ms']} ms "
              f"(exact {agree_chain:.4f}) | fc-pallas {fc['ms']} ms "
              f"(exact {agree_fc:.4f})", flush=True)

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
