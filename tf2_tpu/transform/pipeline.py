"""One-call offline pipeline: prune -> fold BN -> calibrate -> quantize.

Reference parity: the per-model TransForm CLI scripts (SURVEY.md §3 R1-R3)
collapse to this single function + transform/cli.py.

Pruning runs FIRST and physically (prune.prune_channels): the pruned graph
has fewer channels everywhere downstream, so BN fold, calibration and
quantization all operate on (and the artifact stores) the smaller net —
the reference's compress-then-deploy order (SURVEY.md §3 R1).
"""
from __future__ import annotations

from typing import Iterable

from ..graph.ir import Graph
from .calibrate import calibrate
from .fold import fold_batch_norm
from .prune import PruneSpec, prune_channels
from .quantize import QuantSpec, QuantizedArtifact, quantize_graph


def transform_model(graph: Graph, params: dict, batches: Iterable[dict],
                    qspec: QuantSpec | None = None,
                    pspec: PruneSpec | None = None,
                    ) -> tuple[QuantizedArtifact, Graph, dict]:
    """Returns (quantized artifact, folded fp graph, folded fp params).
    The folded graph/params are the golden reference for parity testing."""
    qspec = qspec or QuantSpec()
    if pspec is not None and pspec.fraction > 0:
        graph, params, _ = prune_channels(graph, params, pspec)
    fg, fp = fold_batch_norm(graph, params)
    # stride==kernel convs (ViT patch embedding) -> layout ops + dense:
    # exact, and sidesteps the conv emitter's cin<4 lane pathology
    # (graph/optimize.patchify_stem; run pre-calibration so the quantizer
    # sees a dense)
    from ..graph.optimize import patchify_stem
    fg, fp = patchify_stem(fg, fp)
    batches = list(batches)
    scales = calibrate(fg, fp, batches, estimator=qspec.act_estimator)
    art = quantize_graph(fg, fp, scales, qspec)
    if qspec.bias_correct:
        from .bias_correct import bias_correct
        bias_correct(art, fg, fp, batches)
    return art, fg, fp
