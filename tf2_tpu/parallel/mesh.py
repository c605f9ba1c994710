"""Mesh topology + sharding specs (SURVEY.md §3 P2/P3, §6.8).

Reference parity: the FPGA stack had NO inter-device communication (PCIe DMA
only); this subsystem is new, mandated by the north star ("weights
tensor-sharded over ICI"). TPU-native design: a named `jax.sharding.Mesh`
with axes ("dp", "tp") — batch data-parallel over dp, output-channel tensor
parallel over tp — and GSPMD/XLA inserting the ICI collectives from the
`NamedSharding` annotations. Multi-host: the same global mesh spans hosts
via jax.distributed (DCN for cross-host edges; collectives ride ICI within
a slice).

TP layout choice for conv nets: shard every conv/dense OUTPUT-channel dim.
A channel-sharded conv consumes all-gathered activations and produces
C-sharded output; XLA then all-gathers before the next layer. At CNN sizes
the activation all-gather overlaps with MXU work (latency-hiding
scheduler); this is the halo-free layout SURVEY.md §8 hard-part 5 calls
for.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.ir import Graph


@dataclasses.dataclass
class MeshConfig:
    mesh: Mesh
    dp_axis: str = "dp"
    tp_axis: str = "tp"

    @property
    def dp(self) -> int:
        return self.mesh.shape[self.dp_axis]

    @property
    def tp(self) -> int:
        return self.mesh.shape[self.tp_axis]

    def named(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def make_mesh(tp: int = 1, devices=None) -> MeshConfig:
    """dp is inferred as n_devices // tp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % tp:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    dp = n // tp
    arr = np.array(devices).reshape(dp, tp)
    return MeshConfig(Mesh(arr, ("dp", "tp")))


# params whose LAST axis is the output-channel dim -> shard over tp
_TP_LAST_AXIS_SUFFIXES = (".wp", ".wq", ".es", ".eb", ".w", ".b",
                          ".scale", ".offset", ".mean", ".var")


def param_shardings(graph: Graph, cfg: MeshConfig) -> dict[str, NamedSharding]:
    """Output-channel (last-axis) sharding over tp for weight-bearing
    params; everything else replicated. Channel dims must divide tp — if
    not, the param is replicated (correct, just not distributed)."""
    out = {}
    for name, spec in graph.params.items():
        shard_last = (any(name.endswith(s) for s in _TP_LAST_AXIS_SUFFIXES)
                      and cfg.tp > 1
                      and spec.shape
                      and spec.shape[-1] % cfg.tp == 0)
        if shard_last:
            pspec = [None] * (len(spec.shape) - 1) + [cfg.tp_axis]
            out[name] = cfg.named(*pspec)
        else:
            out[name] = cfg.replicated()
    return out


def input_shardings(graph: Graph, cfg: MeshConfig) -> dict[str, NamedSharding]:
    """Batch (axis 0) sharded over dp."""
    out = {}
    for name, spec in graph.inputs.items():
        pspec = [cfg.dp_axis] + [None] * (len(spec.shape) - 1)
        if spec.shape and spec.shape[0] % cfg.dp == 0:
            out[name] = cfg.named(*pspec)
        else:
            out[name] = cfg.replicated()
    return out
