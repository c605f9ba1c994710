"""In-context per-shape Pallas-vs-XLA sweep (the honest successor to the
standalone sweep in tune_sweep.py; VERDICT r2 items 1/3).

Why: standalone single-op chains need a data-dependency injection whose
cost rivals the op itself (a full pass over the input per iteration), and
XLA's algebraic simplifier can partially defeat any cheap injection —
measured 2026-08-20: a 56x56 conv read 0.90 ms under an f32-carry chain of
which 0.62 ms was the carry cast, while an int8-eps chain collapsed to
0.0003 ms (simplified away). Per-op standalone numbers at the 10-100 us
scale are therefore NOT trustworthy under this dispatch path.

What this does instead: times the WHOLE graph (signal ~ms >> noise) in
(a) pure-XLA routing and (b) with exactly ONE shape key routed to Pallas,
and attributes the difference to that shape (divided by its occurrence
count). Fusion context, layout transitions, and per-call overheads are all
included — this is the quantity routing decisions actually trade on.
Shapes whose single-key routing makes the whole graph faster by more than
the measurement error are winners; the winning set is then validated
jointly (autotune.validate_routes) before any defaults are committed.

Usage:
    python -m bench.context_sweep [--model resnet50] [--batches 64,1]
        [--commit-defaults]

Writes CONTEXT_SWEEP.json at the repo root and the routing table to
~/.cache/tf2_tpu/.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from bench.tune_sweep import ensure_artifact  # noqa: E402


def graph_keys(graph) -> dict[str, int]:
    """unique routing key -> occurrence count for fused ops."""
    from tf2_tpu.graph.shapes import activation_shapes
    from tf2_tpu.kernels import autotune

    shapes = activation_shapes(graph)
    counts: dict[str, int] = {}
    for node in graph.nodes:
        if node.op == "qconv2d":
            key = autotune.conv_key(shapes[node.inputs[0]],
                                    node.attrs["kshape"],
                                    node.attrs.get("strides", [1, 1]),
                                    node.attrs.get("groups", 1),
                                    node.attrs["wfmt"])
        elif node.op == "qdense":
            key = autotune.dense_key(shapes[node.inputs[0]],
                                     node.attrs["kshape"], node.attrs["wfmt"])
        else:
            continue
        counts[key] = counts.get(key, 0) + 1
    return counts


def time_graph(graph, params, routes: dict, iters: int, reps: int = 5):
    """Whole-graph per-batch time with the given routing table active."""
    import jax.numpy as jnp
    import numpy as np

    from tf2_tpu.kernels import autotune, dispatch
    from tf2_tpu.runtime.engine import Engine
    from tf2_tpu.runtime.timing import device_time_checked

    # install a transient in-memory table
    autotune._TABLE = {"routes": dict(routes), "detail": {}}
    prev = dispatch._USE_PALLAS
    dispatch.set_use_pallas(None)
    try:
        eng = Engine(graph, params)
        name = next(iter(graph.inputs))
        spec = graph.inputs[name]
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=spec.shape).astype(np.float32))

        def step(xx, p):
            return eng._fn(p, **{name: xx})

        m = device_time_checked(step, (x, eng.params), iters=iters, reps=reps)
        return m
    finally:
        dispatch.set_use_pallas(prev)
        autotune._TABLE = None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--art", default="/tmp/tf2tpu_bench_r50_int4")
    ap.add_argument("--batches", default="64,1")
    ap.add_argument("--commit-defaults", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    ensure_artifact(args.art, args.model)

    from tf2_tpu.kernels import autotune
    from tf2_tpu.runtime import compile_cache
    from tf2_tpu.runtime.timing import noise_floor_s
    from tf2_tpu.transform import load_artifact

    compile_cache.enable()
    graph, params = load_artifact(args.art)
    noise = noise_floor_s()
    print(f"noise floor: {noise*1e3:.3f} ms", flush=True)

    report = {}
    for b in (int(x) for x in args.batches.split(",")):
        g = graph.with_batch_size(b)
        keys = graph_keys(g)
        base = time_graph(g, params, {}, iters=60 if b > 8 else 600,
                          reps=args.reps)
        t0 = base["time_s"]
        # residual per-measurement error ~ noise / (2*iters); the delta of
        # two measurements carries sqrt(2)x that
        err = noise / (2 * base["iters"]) * 1.5
        print(f"=== batch={b}: pure-XLA {t0*1e3:.4f} ms "
              f"(+-{err*1e6:.1f} us) over {len(keys)} shape keys ===",
              flush=True)
        entries = {}
        winners = {}
        for key, count in sorted(keys.items()):
            m = time_graph(g, params, {key: "pallas"},
                           iters=base["iters"], reps=args.reps)
            delta = m["time_s"] - t0
            per_op = delta / count
            win = delta < -2 * err
            if win:
                winners[key] = "pallas"
            entries[key] = {
                "count": count,
                "graph_delta_us": round(delta * 1e6, 2),
                "per_op_delta_us": round(per_op * 1e6, 2),
                "err_us": round(err * 1e6, 2),
                "winner": "pallas" if win else "xla",
            }
            print(f"{key} x{count}: delta {delta*1e6:+8.1f} us "
                  f"({'PALLAS' if win else 'xla'})", flush=True)
        result = {"pure_xla_ms": round(t0 * 1e3, 4),
                  "err_us": round(err * 1e6, 2), "entries": entries}
        if winners:
            mj = time_graph(g, params, winners, iters=base["iters"],
                            reps=args.reps)
            result["joint_winners_ms"] = round(mj["time_s"] * 1e3, 4)
            joint_ok = mj["time_s"] < t0 - 2 * err
            result["joint_kept"] = bool(joint_ok)
            print(f"joint winners ({len(winners)}): {mj['time_s']*1e3:.4f} "
                  f"ms vs {t0*1e3:.4f} -> "
                  f"{'KEPT' if joint_ok else 'dropped'}", flush=True)
            if joint_ok:
                for key in winners:
                    autotune.record(key, "pallas", dict(
                        entries[key], source="context_sweep"))
                for key in entries:
                    if key not in winners:
                        autotune.record(key, "xla", dict(
                            entries[key], source="context_sweep"))
                autotune.save()
        report[f"batch{b}"] = result

    with open(os.path.join(REPO, "CONTEXT_SWEEP.json"), "w") as f:
        json.dump(report, f, indent=1)
    n_pallas = sum(1 for b in report.values()
                   for e in b["entries"].values() if e["winner"] == "pallas")
    print(f"context sweep done: {n_pallas} in-context pallas wins")
    if args.commit_defaults and n_pallas:
        path = autotune.save_defaults()
        print(f"committed defaults -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
