"""One-call offline pipeline: fold BN -> calibrate -> (prune) -> quantize.

Reference parity: the per-model TransForm CLI scripts (SURVEY.md §3 R1-R3)
collapse to this single function + transform/cli.py.
"""
from __future__ import annotations

from typing import Iterable

from ..graph.ir import Graph
from .calibrate import calibrate
from .fold import fold_batch_norm
from .prune import PruneSpec, prune_params
from .quantize import QuantSpec, QuantizedArtifact, quantize_graph


def transform_model(graph: Graph, params: dict, batches: Iterable[dict],
                    qspec: QuantSpec | None = None,
                    pspec: PruneSpec | None = None,
                    ) -> tuple[QuantizedArtifact, Graph, dict]:
    """Returns (quantized artifact, folded fp graph, folded fp params).
    The folded graph/params are the golden reference for parity testing."""
    qspec = qspec or QuantSpec()
    fg, fp = fold_batch_norm(graph, params)
    if pspec is not None and pspec.fraction > 0:
        fp, _ = prune_params(fg, fp, pspec)
    batches = list(batches)
    scales = calibrate(fg, fp, batches, estimator=qspec.act_estimator)
    art = quantize_graph(fg, fp, scales, qspec)
    return art, fg, fp
