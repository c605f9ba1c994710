"""Channel pruning (reference parity: TransForm Kit pruning, SURVEY.md §3
R1 — finetune loops are out of scope for an inference engine, so this
implements the inference-side contract: magnitude-based structured channel
masks applied to conv/dense weights; zeroed channels quantize to exact-zero
PoT codes, which the shift kernels multiply for free)."""
from __future__ import annotations

import dataclasses

import numpy as np

from ..graph.ir import Graph


@dataclasses.dataclass
class PruneSpec:
    fraction: float = 0.0            # fraction of out-channels zeroed per layer
    skip_first_last: bool = True
    min_channels: int = 8


def channel_l1(w: np.ndarray) -> np.ndarray:
    """Per-output-channel L1 norm; out channel is the last axis."""
    return np.sum(np.abs(w.reshape(-1, w.shape[-1])), axis=0)


def prune_params(graph: Graph, params: dict, spec: PruneSpec) -> tuple[dict, dict]:
    """Zero the lowest-L1 output channels of every conv/dense weight.
    Returns (new_params, report: node -> kept_fraction)."""
    if spec.fraction <= 0:
        return dict(params), {}
    conv_nodes = [n for n in graph.nodes if n.op in ("conv2d", "dense")]
    first = conv_nodes[0].name if conv_nodes else None
    last = conv_nodes[-1].name if conv_nodes else None
    out = dict(params)
    report = {}
    for n in conv_nodes:
        if spec.skip_first_last and n.name in (first, last):
            continue
        wname = n.params[0]
        w = np.asarray(params[wname])
        c = w.shape[-1]
        k = min(int(c * spec.fraction), max(c - spec.min_channels, 0))
        if k <= 0:
            continue
        norms = channel_l1(w)
        thresh = np.sort(norms)[k - 1]
        mask = (norms > thresh).astype(w.dtype)
        out[wname] = w * mask
        if len(n.params) > 1:
            bname = n.params[1]
            out[bname] = np.asarray(params[bname]) * mask
        report[n.name] = float(mask.mean())
    return out, report
