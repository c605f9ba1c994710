"""Measured kernel routing (SURVEY.md §6.6: "kernel tile sizes are
autotuned (small sweep at build time, cached)").

The FPGA reference freezes per-layer kernel configs at bitstream-build time
(compile-time #defines, SURVEY.md §3 R10). The TPU-native analog is a
*measured* decision per layer shape: for every unique fused-op shape the
tuner times the Pallas kernel against XLA's native int8 lowering on the
real chip and records the winner in a JSON routing table. dispatch.py
consults the table at trace time; entries persist across processes, so the
one-time sweep is amortized like the bitstream build.

Honest-timing note: single-op device benchmarks MUST consume the full
output (runtime/timing.py sums the leaf) — XLA dead-code-eliminates a
sliced conv to ~0 ms, which poisons the table with false XLA wins.

Default policy with an empty table (measured 2026-08-18, v5e-1, ResNet-50
b64 per-shape sweep): XLA's int8 conv+epilogue fusion wins every conv shape
in the CNN zoo, so untuned qconv2d/qdense route to XLA. The Pallas path is
kept for shapes/platforms where a sweep shows it winning and for the pot4
in-VMEM decode (halved weight traffic) in memory-bound serving regimes.
"""
from __future__ import annotations

import json
import os
from typing import Mapping

_TABLE: dict | None = None          # {"routes": {...}, "detail": {...}}
_TABLE_PATH: str | None = None
_WARNED_EMPTY = False

# Per-platform default tables committed with the repo: a fresh machine
# with no ~/.cache sweep still routes measured winners (VERDICT r1 item 10
# — round 1's kernels went dormant because routing was machine-local).
_DEFAULTS_DIR = os.path.join(os.path.dirname(__file__), "routing_defaults")


def table_path() -> str:
    if _TABLE_PATH is not None:
        return _TABLE_PATH
    d = os.environ.get("TF2TPU_TUNE_DIR",
                       os.path.expanduser("~/.cache/tf2_tpu"))
    import jax
    return os.path.join(d, f"routing_{jax.default_backend()}.json")


def set_table_path(path: str | None):
    global _TABLE_PATH, _TABLE
    _TABLE_PATH = path
    _TABLE = None


def _read_json(path: str) -> dict:
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        return {"routes": {}, "detail": {}}
    if "routes" not in raw:  # legacy flat format (r1): winners + "_detail"
        detail = raw.pop("_detail", {})
        return {"routes": raw, "detail": detail}
    return raw


def _load() -> dict:
    global _TABLE
    if _TABLE is None:
        t = _read_json(table_path())
        if not t["routes"]:
            import jax
            d = os.path.join(_DEFAULTS_DIR,
                             f"routing_{jax.default_backend()}.json")
            if os.path.exists(d):
                t = _read_json(d)
        _TABLE = t
    return _TABLE


def save():
    t = _load()
    path = table_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(t, f, indent=0, sort_keys=True)
    os.replace(tmp, path)


def save_defaults():
    """Commit the current table as the repo default for this platform."""
    import jax
    os.makedirs(_DEFAULTS_DIR, exist_ok=True)
    path = os.path.join(_DEFAULTS_DIR,
                        f"routing_{jax.default_backend()}.json")
    with open(path, "w") as f:
        json.dump(_load(), f, indent=0, sort_keys=True)
    return path


def conv_key(xshape, kshape, strides, groups, wfmt: str) -> str:
    n, h, w, _ = xshape
    kh, kw, cin, cout = kshape
    return (f"conv:b{n}:hw{h}x{w}:k{kh}x{kw}:ci{cin}:co{cout}:"
            f"s{strides[0]}{strides[1]}:g{groups}:{wfmt}")


def dense_key(xshape, kshape, wfmt: str) -> str:
    m = 1
    for d in xshape[:-1]:
        m *= d
    return f"dense:m{m}:k{kshape[0]}:n{kshape[1]}:{wfmt}"


def route(key: str) -> str | None:
    """'pallas' | 'xla' | None (no measurement recorded)."""
    t = _load()
    r = t["routes"].get(key)
    if r is None and not t["routes"]:
        global _WARNED_EMPTY
        if not _WARNED_EMPTY:
            _WARNED_EMPTY = True
            import logging
            logging.getLogger(__name__).warning(
                "autotune: routing table empty (%s) — all fused ops fall "
                "back to XLA; run kernels.autotune.tune_graph() once to "
                "measure Pallas-vs-XLA winners on this chip", table_path())
    return r


def detail(key: str) -> dict | None:
    return _load()["detail"].get(key)


def record(key: str, winner: str, detail: dict | None = None):
    t = _load()
    t["routes"][key] = winner
    if detail is not None:
        t["detail"][key] = detail


# ---- the sweep ---------------------------------------------------------------

def tune_graph(graph, params: Mapping, persist: bool = True,
               iters: int = 8, reps: int = 2, verbose: bool = False) -> dict:
    """Measure pallas-vs-XLA for every unique fused-op shape in ``graph``
    and record winners. Returns {key: {"pallas_ms", "xla_ms", "winner"}}.

    Runs on whatever backend is active; the table file is per-backend.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..graph.shapes import activation_shapes
    from ..runtime.timing import device_time_s
    from . import dispatch

    shapes = activation_shapes(graph)
    results: dict[str, dict] = {}
    for node in graph.nodes:
        if node.op == "qconv2d":
            xs = shapes[node.inputs[0]]
            key = conv_key(xs, node.attrs["kshape"],
                           node.attrs.get("strides", [1, 1]),
                           node.attrs.get("groups", 1), node.attrs["wfmt"])
        elif node.op == "qdense":
            key = dense_key(shapes[node.inputs[0]], node.attrs["kshape"],
                            node.attrs["wfmt"])
        else:
            continue
        if key in results:
            continue
        xs = shapes[node.inputs[0]]
        rng = np.random.default_rng(0)
        x_q = jnp.asarray(rng.integers(-80, 80, xs, dtype=np.int8))
        xf = x_q.astype(jnp.float32)
        times = {}
        prev = dispatch._USE_PALLAS
        nparams = {k: jnp.asarray(params[k]) for k in node.params}
        for path in ("xla", "pallas"):
            def step(xf, _path=path):
                dispatch.set_use_pallas(_path == "pallas")
                try:
                    fn = (dispatch.qconv2d if node.op == "qconv2d"
                          else dispatch.qdense)
                    y = fn(node, nparams, xf.astype(jnp.int8))
                finally:
                    dispatch.set_use_pallas(prev)
                return y
            try:
                times[path] = device_time_s(step, (xf,), iters=iters,
                                            reps=reps, two_point=True)
            except Exception as e:  # kernel doesn't cover this shape
                if verbose:
                    print(f"{key}: {path} failed: {type(e).__name__}")
                times[path] = float("inf")
        winner = "pallas" if times["pallas"] < times["xla"] else "xla"
        detail = {"pallas_ms": round(times["pallas"] * 1e3, 4),
                  "xla_ms": round(times["xla"] * 1e3, 4), "winner": winner}
        record(key, winner, detail)
        results[key] = detail
        if persist:
            save()  # incremental: a timeout keeps completed entries
        if verbose:
            print(f"{key}: {detail}")
    return results
