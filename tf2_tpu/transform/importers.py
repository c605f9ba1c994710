"""Checkpoint importers (SURVEY.md §3 R3): map source-framework state dicts
onto this engine's param names.

Supported sources:
- torchvision-style ResNet-50 state dicts (``conv1.weight``, ``layerX.Y.*``,
  OIHW conv layout, (out,in) linear layout);
- generic flat numpy/safetensors dicts that already use our names.

No pretrained files ship in this sandbox; importers are exercised against
synthetic dicts with the real key/shape structure (tests/transform) and
accept real checkpoints when the driver provides them.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from ..graph.ir import Graph


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor without importing torch
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def import_torchvision_resnet50(state: Mapping, graph: Graph) -> dict:
    """torchvision resnet50 state_dict -> params for models/resnet.build().

    Name map: conv1->conv1, bn1->conv1_bn, layer{s}.{i}.conv{j} ->
    s{s}b{i}_c{j}, downsample.0/1 -> s{s}b{i}_down(+_bn), fc -> fc.
    """
    out: dict[str, np.ndarray] = {}

    def put_conv(src: str, dst: str):
        out[f"{dst}.w"] = conv_oihw_to_hwio(state[f"{src}.weight"])

    def put_bn(src: str, dst: str):
        out[f"{dst}.scale"] = _np(state[f"{src}.weight"])
        out[f"{dst}.offset"] = _np(state[f"{src}.bias"])
        out[f"{dst}.mean"] = _np(state[f"{src}.running_mean"])
        out[f"{dst}.var"] = _np(state[f"{src}.running_var"])

    put_conv("conv1", "conv1")
    put_bn("bn1", "conv1_bn")
    depths = (3, 4, 6, 3)
    for s, blocks in enumerate(depths):
        for i in range(blocks):
            src = f"layer{s + 1}.{i}"
            dst = f"s{s + 1}b{i}"
            for j in (1, 2, 3):
                put_conv(f"{src}.conv{j}", f"{dst}_c{j}")
                put_bn(f"{src}.bn{j}", f"{dst}_c{j}_bn")
            if f"{src}.downsample.0.weight" in state:
                put_conv(f"{src}.downsample.0", f"{dst}_down")
                put_bn(f"{src}.downsample.1", f"{dst}_down_bn")
    out["fc.w"] = _np(state["fc.weight"]).T
    out["fc.b"] = _np(state["fc.bias"])

    _check_against_graph(out, graph)
    return out


def import_flat(state: Mapping, graph: Graph) -> dict:
    """Flat dict already keyed by our names (e.g. re-exported safetensors)."""
    out = {k: _np(v) for k, v in state.items() if k in graph.params}
    _check_against_graph(out, graph)
    return out


def _check_against_graph(params: dict, graph: Graph) -> None:
    missing = sorted(set(graph.params) - set(params))
    if missing:
        raise ValueError(f"importer missing params: {missing[:8]}"
                         f"{'...' if len(missing) > 8 else ''}")
    for k, spec in graph.params.items():
        got = tuple(params[k].shape)
        if got != tuple(spec.shape):
            raise ValueError(f"shape mismatch for {k}: checkpoint {got} "
                             f"vs graph {tuple(spec.shape)}")
