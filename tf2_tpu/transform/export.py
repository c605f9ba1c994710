"""Artifact IO — the offline<->online contract on disk.

Reference parity: TF2 writes a net-structure file + packed weight binary
(SURVEY.md §3 R4). Here: ``<dir>/graph.json`` (versioned IR) +
``<dir>/weights.safetensors`` (flat tensor dict with hashes in metadata).
The artifact *is* the checkpoint — a stateless serving engine resumes by
reloading it (SURVEY.md §6.4).
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np
from safetensors.numpy import load_file, save_file

from ..graph.ir import Graph
from .quantize import QuantizedArtifact


def _hash(arr: np.ndarray) -> str:
    return hashlib.sha256(arr.tobytes()).hexdigest()[:16]


def save_artifact(path: str, graph: Graph, params: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "graph.json"), "w") as f:
        f.write(graph.to_json())
    np_params = {k: np.asarray(v) for k, v in params.items()}
    meta = {k: _hash(v) for k, v in np_params.items()}
    save_file(np_params, os.path.join(path, "weights.safetensors"),
              metadata={"hashes": json.dumps(meta)})


def load_artifact(path: str, verify_hashes: bool = True
                  ) -> tuple[Graph, dict[str, np.ndarray]]:
    with open(os.path.join(path, "graph.json")) as f:
        graph = Graph.from_json(f.read())
    wpath = os.path.join(path, "weights.safetensors")
    np_params = load_file(wpath)
    if verify_hashes:
        from safetensors import safe_open
        with safe_open(wpath, framework="numpy") as f:
            meta = f.metadata() or {}
        hashes = json.loads(meta.get("hashes", "{}"))
        for k, v in np_params.items():
            if k in hashes and _hash(v) != hashes[k]:
                raise ValueError(f"tensor hash mismatch for {k!r} — corrupt artifact")
    missing = set(graph.params) - set(np_params)
    if missing:
        raise ValueError(f"artifact missing params: {sorted(missing)[:5]}...")
    return graph, dict(np_params)


def save_quantized(path: str, art: QuantizedArtifact) -> None:
    save_artifact(path, art.graph, art.params)
