"""Profiler-trace cross-check of the scan-timing methodology (SURVEY.md
§6.1; VERDICT r2 item 7).

Captures a jax.profiler trace (perfetto JSON — the installed
tensorboard-plugin-profile's xplane converter is broken against this TF
build) of the quantized ResNet-50 forward at b64 and b1, aggregates
per-track device event durations, and reconciles the per-step device time
against runtime/timing.py's scan-chained measurement. Writes
PROFILE_TRACE.json at the repo root and prints the top device ops.

Usage: python -m bench.profile_trace [--steps 8] [--model NAME]
       [--batches 64,1]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def find_perfetto(log_dir: str) -> str | None:
    hits = glob.glob(os.path.join(log_dir, "**", "*perfetto*"),
                     recursive=True)
    return hits[0] if hits else None


def load_trace(path: str) -> dict:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        return json.loads(f.read().decode())


def aggregate(trace: dict) -> dict:
    """Sum event durations per (process/track, name)."""
    # perfetto chrome-trace JSON: processes named via metadata events
    proc_names = {}
    track_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", str(ev["pid"]))
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            track_names[(ev["pid"], ev.get("tid"))] = ev["args"].get(
                "name", "")
    per_track: dict = defaultdict(lambda: defaultdict(float))
    spans: dict = defaultdict(lambda: [float("inf"), 0.0])
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid, tid = ev.get("pid"), ev.get("tid")
        key = (proc_names.get(pid, str(pid)),
               track_names.get((pid, tid), str(tid)))
        dur = float(ev.get("dur", 0.0))
        per_track[key][ev.get("name", "?")] += dur
        t0 = float(ev.get("ts", 0.0))
        spans[key][0] = min(spans[key][0], t0)
        spans[key][1] = max(spans[key][1], t0 + dur)
    return {"per_track": per_track, "spans": spans}


def parse_hlo_computations(txt: str) -> dict:
    """Optimized-HLO text -> {computation_name: [instruction dicts]}.

    Each instruction dict: {"name", "shape", "scopes": set, "calls": [comp
    names]}. "scopes" holds the graph-node named_scope prefixes (e.g.
    ``qconv2d:s1b2_c3``) found in the instruction metadata — the join key
    back to graph nodes (VERDICT r3 task 2: the named_scope -> fusion-name
    correlation)."""
    import re
    comps: dict = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"(ENTRY )?%?([\w.\-]+)(?:\.v\d+)? \(.*\) -> .* {", line)
        if m:
            cur = m.group(2)
            comps[cur] = {"instructions": [], "entry": bool(m.group(1))}
            continue
        if cur is None or not line.strip() or line.strip() == "}":
            if line.strip() == "}":
                cur = None
            continue
        # shape is either a single `s8[...]{...}` token or a TUPLE
        # `(f32[...], s8[...])` for multi-output fusions — the ViT MLP
        # mega-fusions are tuple-shaped and were silently skipped before
        im = re.match(r"\s+(?:ROOT )?%([\w.\-]+) = "
                      r"(\((?:[^()]+|\([^()]*\))*\)|\S+) "
                      r"([\w\-]+)\(", line)
        if not im:
            continue
        name, shape, opcode = im.groups()
        scopes = set()
        # constants/broadcasts are CSE'd across the module and carry the
        # metadata of one arbitrary original site — attributing their
        # scope would bleed unrelated node names into every fusion that
        # shares e.g. the clip bound -127
        om = (None if opcode in ("constant", "broadcast", "iota")
              else re.search(r'op_name="([^"]+)"', line))
        if om:
            for part in om.group(1).split("/"):
                if re.match(r"^[a-z_0-9]+:", part):
                    scopes.add(part)
                    break
        # computation references: fusions use calls=, while-loops use
        # condition=/body=, sort/reduce/scatter use to_apply= — the NMS
        # <while.*>/<sort.*> events carried no nodes before this
        # (VERDICT r4 weak #2: SSD attribution broke down exactly where
        # the time was)
        calls = re.findall(
            r"(?:calls|condition|body|to_apply)=%([\w.\-]+)", line)
        comps[cur]["instructions"].append(
            {"name": name, "shape": shape, "scopes": scopes, "calls": calls})
    return comps


def hlo_op_nodes(txt: str) -> dict:
    """{entry-instruction name: {"shape", "nodes": sorted scope list}} with
    scopes gathered transitively through called computations, so a TPU
    mega-fusion (3x3 conv + 1x1 conv + qadd nested in one kOutput fusion)
    reports every graph node it contains."""
    comps = parse_hlo_computations(txt)

    def comp_scopes(cname: str, seen: set) -> set:
        if cname in seen or cname not in comps:
            return set()
        seen.add(cname)
        out: set = set()
        for ins in comps[cname]["instructions"]:
            out |= ins["scopes"]
            for c in ins["calls"]:
                out |= comp_scopes(c, seen)
        return out

    entry = next((c for c, v in comps.items() if v["entry"]), None)
    table = {}
    if entry is None:
        return table
    for ins in comps[entry]["instructions"]:
        scopes = set(ins["scopes"])
        for c in ins["calls"]:
            scopes |= comp_scopes(c, set())
        table[ins["name"]] = {"shape": ins["shape"],
                              "nodes": sorted(scopes)}
    return table


def hlo_nested_instr_names(txt: str) -> set:
    """Names of instructions defined in NON-entry computations (while
    bodies, sort comparators...). Their trace events are NESTED inside
    the calling entry op's span — summing both double-counts (VERDICT r4
    weak #2: SSD attributed 5.21 ms against a 4.33 ms scan). The per-node
    join skips them; the parent (e.g. the while op, which now carries
    nodes via condition=/body= traversal) owns their time."""
    comps = parse_hlo_computations(txt)
    entry = next((c for c, v in comps.items() if v["entry"]), None)
    out: set = set()
    for cname, v in comps.items():
        if cname == entry:
            continue
        for ins in v["instructions"]:
            out.add(ins["name"])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--art", default=None,
                    help="artifact dir (default: /tmp/tf2tpu_bench_<model>)")
    ap.add_argument("--batches", default="64,1")
    ap.add_argument("--logdir", default="/tmp/tf2tpu_trace")
    ap.add_argument("--out", default=None,
                    help="output JSON (default: PROFILE_TRACE.json for "
                         "resnet50, PROFILE_TRACE_<model>.json otherwise)")
    args = ap.parse_args(argv)
    if args.art is None:
        args.art = ("/tmp/tf2tpu_bench_r50_int4" if args.model == "resnet50"
                    else f"/tmp/tf2tpu_bench_{args.model}")
    if args.out is None:
        args.out = ("PROFILE_TRACE.json" if args.model == "resnet50"
                    else f"PROFILE_TRACE_{args.model}.json")

    import jax
    import jax.numpy as jnp

    from bench.tune_sweep import ensure_artifact
    from tf2_tpu.runtime import compile_cache
    from tf2_tpu.runtime.engine import Engine
    from tf2_tpu.runtime.timing import device_time_checked
    from tf2_tpu.transform import load_artifact

    compile_cache.enable()
    ensure_artifact(args.art, args.model)
    graph, params = load_artifact(args.art)
    report = {}
    for b in (int(v) for v in args.batches.split(",")):
        g = graph.with_batch_size(b)
        eng = Engine(g, params)
        x = jax.random.normal(jax.random.PRNGKey(0),
                              g.inputs["image"].shape, jnp.float32)
        iname = next(iter(g.inputs))
        eng.build(**{iname: x})  # compile outside the trace

        # optimized HLO -> graph-node correlation (VERDICT r3 task 2):
        # entry-fusion names are exactly the profiler's XLA-Ops event
        # names; scopes inside each fusion's computation(s) name the
        # graph nodes it executes
        hlo_txt = eng._jfn.lower(eng.params, {iname: x}).compile().as_text()
        opmap = hlo_op_nodes(hlo_txt)
        nested = hlo_nested_instr_names(hlo_txt)

        # scan-chained timing (the methodology under audit)
        def step(xx, p):
            return eng._fn(p, **{iname: xx})
        scan = device_time_checked(step, (x, eng.params),
                                   iters=60 if b > 8 else 600, reps=3)

        # fresh logdir per run: find_perfetto globs recursively, and a
        # stale trace from an earlier session would be aggregated silently
        logdir = f"{args.logdir}_b{b}_{int(time.time())}"
        with jax.profiler.trace(logdir, create_perfetto_trace=True):
            for _ in range(args.steps):
                out = eng(**{iname: x})
            jax.block_until_ready(out)

        entry = {"scan_ms_per_step": round(scan["time_s"] * 1e3, 4),
                 "steps_traced": args.steps, "logdir": logdir}
        pf = find_perfetto(logdir)
        if pf:
            agg = aggregate(load_trace(pf))
            # device tracks: TPU/device process names
            dev_tracks = {k: v for k, v in agg["per_track"].items()
                          if any(s in (k[0] + k[1]).lower()
                                 for s in ("tpu", "device", "/device"))}
            busy_us = {f"{k[0]}|{k[1]}": sum(v.values())
                       for k, v in dev_tracks.items()}
            top = sorted(((n, d) for k, v in dev_tracks.items()
                          for n, d in v.items()), key=lambda t: -t[1])[:40]
            entry["device_busy_us_per_track"] = {
                k: round(v, 1) for k, v in busy_us.items()}
            entry["device_ms_per_step_busiest_track"] = round(
                max(busy_us.values(), default=0.0) / args.steps / 1e3, 4)
            entry["top_device_ops_us"] = [
                {"name": n[:120], "total_us": round(d, 1),
                 "us_per_step": round(d / args.steps, 1),
                 "nodes": opmap.get(n, {}).get("nodes", []),
                 "out_shape": opmap.get(n, {}).get("shape", "")[:48]}
                for n, d in top]
            # per-node attribution: each op's time lands on the joined
            # node-set key so mega-fusions stay honest (no fake split)
            per_node = defaultdict(float)
            for k, v in dev_tracks.items():
                for n, d in v.items():
                    if n.startswith("jit_"):
                        continue  # whole-module envelope event
                    if n in nested and n not in opmap:
                        # defined inside a while body / sort comparator:
                        # its span nests inside the calling entry op's
                        # event — counting both double-counts
                        continue
                    nodes = opmap.get(n, {}).get("nodes", [])
                    key = " + ".join(nodes) if nodes else f"<{n}>"
                    per_node[key] += d / args.steps
            entry["per_node_us_per_step"] = {
                k: round(v, 1) for k, v in sorted(per_node.items(),
                                                  key=lambda t: -t[1])}
        else:
            entry["error"] = "no perfetto trace emitted"
        report[f"batch{b}"] = entry
        print(json.dumps({k: v for k, v in entry.items()
                          if k != "top_device_ops_us"}, indent=1),
              flush=True)
        for row in entry.get("top_device_ops_us", [])[:12]:
            print(f"  {row['total_us']:>12.1f} us  {row['name']}",
                  flush=True)

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
