"""Roofline analysis (SURVEY.md §5.6/§6.1): per-layer FLOPs + bytes from
the IR, chip ceilings, speed-of-light estimates, and % achieved when given
a measured time.

Usage:
    python -m bench.roofline --model resnet50 --batch 64 [--measured-ms X]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e-class public per-chip peaks (BASELINE.md §3) — overridden by this
# chip's MEASURED envelope when bench/peaks.py has written PEAKS.json
# (§3.5: this "v5 lite" measures 456-666 GB/s by access mix, ~56-81% of
# the public 819; using the public figure would flatter every
# sol_fraction by ~1.5x)
PEAK_INT8_TOPS = 394e12
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def _apply_measured_peaks():
    global PEAK_INT8_TOPS, PEAK_BF16_FLOPS, PEAK_HBM_BPS
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PEAKS.json")
    try:
        with open(p) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return
    if "int8_tops" in d:
        PEAK_INT8_TOPS = d["int8_tops"] * 1e12
    if "bf16_tflops" in d:
        PEAK_BF16_FLOPS = d["bf16_tflops"] * 1e12
    # the 2r1w mix is the relevant ceiling for conv-net layer traffic
    if "hbm_2r1w_gbps" in d:
        PEAK_HBM_BPS = d["hbm_2r1w_gbps"] * 1e9


_apply_measured_peaks()


def conv_out_hw(h, w, kh, kw, sh, sw, padding):
    if padding == "SAME":
        return -(-h // sh), -(-w // sw)
    return (h - kh) // sh + 1, (w - kw) // sw + 1


def analyze(graph, int8: bool = True) -> dict:
    """Walk the IR, accumulate MACs + tensor traffic per layer."""
    from tf2_tpu.graph.ir import Graph  # noqa

    shapes: dict[str, tuple] = {k: tuple(v.shape) for k, v in graph.inputs.items()}
    layers = []
    total_macs = 0
    total_bytes = 0
    act_bytes = 1 if int8 else 4
    for n in graph.nodes:
        t = None
        if n.op in ("conv2d", "qconv2d"):
            x = shapes[n.inputs[0]]
            if n.op == "qconv2d":
                kh, kw, cin_g, cout = n.attrs["kshape"]
            else:
                kh, kw, cin_g, cout = graph.params[n.params[0]].shape
            sh, sw = n.attrs.get("strides", [1, 1])
            oh, ow = conv_out_hw(x[1], x[2], kh, kw, sh, sw,
                                 n.attrs.get("padding", "SAME"))
            macs = x[0] * oh * ow * cout * kh * kw * cin_g
            w_bytes = kh * kw * cin_g * cout * (0.5 if n.attrs.get("wfmt") == "pot4" else 1)
            bytes_ = (x[0] * x[1] * x[2] * (cin_g * n.attrs.get("groups", 1)) * act_bytes
                      + w_bytes + x[0] * oh * ow * cout * act_bytes)
            t = (x[0], oh, ow, cout)
            layers.append({"name": n.name, "op": n.op, "macs": macs,
                           "bytes": bytes_,
                           "intensity": macs / max(bytes_, 1)})
            total_macs += macs
            total_bytes += bytes_
        elif n.op in ("dense", "qdense"):
            x = shapes[n.inputs[0]]
            k, cout = (n.attrs["kshape"] if n.op == "qdense"
                       else graph.params[n.params[0]].shape)
            m = 1
            for d in x[:-1]:
                m *= d
            macs = m * k * cout
            bytes_ = m * k * act_bytes + k * cout + m * cout * act_bytes
            t = x[:-1] + (cout,)
            layers.append({"name": n.name, "op": n.op, "macs": macs,
                           "bytes": bytes_, "intensity": macs / max(bytes_, 1)})
            total_macs += macs
            total_bytes += bytes_
        elif n.op in ("maxpool", "avgpool"):
            x = shapes[n.inputs[0]]
            wh, ww = n.attrs["window"]
            sh, sw = n.attrs["strides"]
            oh, ow = conv_out_hw(x[1], x[2], wh, ww, sh, sw,
                                 n.attrs.get("padding", "VALID"))
            t = (x[0], oh, ow, x[3])
        elif n.op == "global_avgpool":
            x = shapes[n.inputs[0]]
            t = (x[0], x[3])
        elif n.op in ("concat", "qconcat"):
            xs = [shapes[i] for i in n.inputs]
            ax = n.attrs.get("axis", -1) % len(xs[0])
            t = list(xs[0])
            t[ax] = sum(s[ax] for s in xs)
            t = tuple(t)
        elif n.op in ("reshape",):
            t = tuple(n.attrs["shape"])
        elif n.op == "flatten":
            x = shapes[n.inputs[0]]
            m = 1
            for d in x[1:]:
                m *= d
            t = (x[0], m)
        elif n.op == "transpose":
            x = shapes[n.inputs[0]]
            t = tuple(x[p] for p in n.attrs["perm"])
        elif n.op == "attention":
            x = shapes[n.inputs[0]]
            b, tt, d = x
            macs = b * (4 * tt * d * d + 2 * tt * tt * d)
            layers.append({"name": n.name, "op": n.op, "macs": macs,
                           "bytes": 4 * d * d, "intensity": 0})
            total_macs += macs
            t = x
        else:
            t = shapes[n.inputs[0]] if n.inputs else None
        if t is not None:
            shapes[n.name] = t

    compute_s = 2 * total_macs / (PEAK_INT8_TOPS if int8 else PEAK_BF16_FLOPS)
    memory_s = total_bytes / PEAK_HBM_BPS
    return {
        "total_gmacs": total_macs / 1e9,
        "total_mbytes": total_bytes / 1e6,
        "sol_compute_ms": compute_s * 1e3,
        "sol_memory_ms": memory_s * 1e3,
        "sol_ms": max(compute_s, memory_s) * 1e3,
        "bound": "compute" if compute_s > memory_s else "memory",
        "layers": layers,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--measured-ms", type=float, default=None)
    ap.add_argument("--per-layer", action="store_true")
    args = ap.parse_args(argv)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tf2_tpu.models import get_model
    g = get_model(args.model, batch=args.batch, image=args.image)
    r = analyze(g)
    out = {k: v for k, v in r.items() if k != "layers"}
    if args.measured_ms:
        out["measured_ms"] = args.measured_ms
        out["sol_fraction"] = r["sol_ms"] / args.measured_ms
    print(json.dumps(out, indent=1, default=float))
    if args.per_layer:
        for l in sorted(r["layers"], key=lambda x: -x["macs"])[:20]:
            print(f"{l['name']:24s} {l['op']:8s} {l['macs']/1e9:8.2f} GMAC "
                  f"intensity {l['intensity']:8.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
