"""Model zoo: IR graph builders for every reference-demonstrated family
(SURVEY.md §1: GoogLeNet, ResNet-50, SqueezeNet, SSD/face-detection) plus
the ViT-B/16 stretch config."""
from __future__ import annotations

from typing import Callable

from ..graph.ir import Graph

# Bump when any builder's emitted graph changes shape/attrs/ops: cached
# /tmp artifacts are keyed on this so benches never measure a stale graph
# (round 4: an SSD bench silently ran a round-3 artifact with the old NMS
# attrs and no qlrn nodes)
ZOO_VERSION = 7  # r5: + patchified ViT stem (stride==kernel conv -> dense)

_REGISTRY: dict[str, Callable[..., Graph]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str, **kwargs) -> Graph:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_models() -> list[str]:
    return sorted(_REGISTRY)


from . import squeezenet as _squeezenet
from . import resnet as _resnet
from . import googlenet as _googlenet
from . import ssd as _ssd
from . import vit as _vit

register("squeezenet_v1_1")(_squeezenet.build)
register("resnet50")(_resnet.build)
register("googlenet")(_googlenet.build)
register("ssd")(_ssd.build)
register("vit_b16")(_vit.build)
register("vit_b16_cls")(lambda **kw: _vit.build(cls_token=True, **kw))
