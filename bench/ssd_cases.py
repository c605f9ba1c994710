"""SSD worst-case vs representative-score benchmark (VERDICT r4 task 4 /
weak #3).

Every committed SSD number through round 4 used RANDOM weights, whose
conf logits give every class ~1/21 softmax mass — so essentially every
anchor survives the 0.01 score threshold and the greedy NMS chains run
deep. That is the post-proc's adversarial worst case. Real checkpoints
produce background-dominated softmax scores (>95% of anchors below
threshold for every foreground class).

This bench measures BOTH on the same artifact:
- worst: the artifact as built (random weights).
- representative: the same artifact with the conf heads' background
  channels biased up in eff-bias (class-minor layout: channel index
  a*classes + 0), pushing background softmax mass to ~99% for the bulk
  of anchors — the calibrated-score synthetic distribution. The backbone
  is untouched, so the delta isolates what realistic scores are worth in
  post-proc.

Emits one JSON line per case + writes SSD_CASES.json.

Usage: python -m bench.ssd_cases [--batch 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--bg-bias", type=float, default=8.0,
                    help="f32 logit boost for background channels")
    ap.add_argument("--fg-bias", type=float, default=3.0,
                    help="f32 logit suppression for foreground channels; "
                         "(8, 3) measured 3.0%% of anchors with max "
                         "foreground score >= 0.01 and background softmax "
                         "mass 0.994 — the background-dominated regime "
                         "real checkpoints produce")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SSD_CASES.json"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench.models_bench import ensure_artifact
    from tf2_tpu.runtime import Engine, compile_cache
    from tf2_tpu.transform import load_artifact

    compile_cache.enable()
    art = ensure_artifact("ssd", 4, 256)
    graph, params = load_artifact(art)
    g = graph.with_batch_size(args.batch)
    classes = g.meta.get("classes", 21)

    # representative params: boost background eff-bias on each conf head.
    # eb is bias/s_out on the conf conv's int8 grid; the boost must also
    # be on that grid. Saturation at +127 is fine — what matters for the
    # softmax is the background-vs-foreground logit GAP.
    rep_params = dict(params)
    n_bg = 0
    for node in g.nodes:
        if not node.name.startswith("conf"):
            continue
        if node.op != "qconv2d":
            continue
        s_out = float(node.attrs["out_scale"])
        eb = np.array(params[node.params[2]], np.float32)
        eb[0::classes] += args.bg_bias / s_out
        for c in range(1, classes):
            eb[c::classes] -= args.fg_bias / s_out
        rep_params[node.params[2]] = eb
        n_bg += 1
    assert n_bg >= 3, "conf heads not found in artifact"

    x = jax.random.normal(jax.random.PRNGKey(0), g.inputs["image"].shape,
                          jnp.float32)
    report = {"batch": args.batch, "bg_bias": args.bg_bias,
              "fg_bias": args.fg_bias}
    for case, p in (("worst_random_scores", params),
                    ("representative_bg_dominated", rep_params)):
        eng = Engine(g, p)
        # survivor fraction: anchors whose best foreground score clears
        # the NMS threshold (the quantity that drives post-proc work)
        dets = np.asarray(eng(image=x))
        stats = eng.benchmark(iters=10, reps=3, checked=True, image=x)
        row = {
            "case": case,
            "img_per_s": round(stats["throughput_per_s"], 1),
            "ms_per_batch": round(stats["latency_s"] * 1e3, 3),
            "mean_final_dets_per_img": round(
                float((dets[..., 4] > 0.01).sum() / args.batch), 1),
        }
        report[case] = row
        print(json.dumps(row), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
