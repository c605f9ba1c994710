"""SSD-style detector on a quantizable CNN backbone (BASELINE.md config #4;
reference parity: TF2's SSD/face-detection demos, SURVEY.md §1).

Compact SSD: ResNet-ish backbone, two extra stride-2 feature maps, per-scale
conv heads predicting (classes) scores + 4 box deltas per anchor, prior-box
grid per scale, then box_decode + fixed-shape NMS (kernels/detection.py).
All backbone/head convs quantize through the standard Transform pipeline;
decode+NMS run fp32 behind dequantize (tiny fraction of runtime).
"""
from __future__ import annotations

import itertools
import math

import numpy as np

from ..graph.ir import Graph, GraphBuilder


def make_priors(feature_sizes, image: int, scales, ratios=(1.0, 2.0, 0.5)
                ) -> np.ndarray:
    """Grid of prior boxes [cx,cy,w,h] in [0,1] for each feature map."""
    priors = []
    for (fs, scale) in zip(feature_sizes, scales):
        for i, j in itertools.product(range(fs), repeat=2):
            cy, cx = (i + 0.5) / fs, (j + 0.5) / fs
            for r in ratios:
                w = scale * math.sqrt(r)
                h = scale / math.sqrt(r)
                priors.append([cx, cy, w, h])
    return np.clip(np.asarray(priors, np.float32), 0.0, 1.0)


def _conv_bn_relu(b, x, cin, cout, k, s, name):
    x = b.conv2d(x, cin, cout, k, stride=s, bias=False, name=name)
    x = b.batch_norm(x, cout, name=f"{name}_bn")
    return b.relu(x, name=f"{name}_relu")


def build(batch: int = 1, image: int = 256, classes: int = 21,
          anchors_per_cell: int = 3) -> Graph:
    b = GraphBuilder("ssd_resnetish")
    x = b.input("image", (batch, image, image, 3))
    # backbone: stride 2 stem + 3 residual-free stages (quantization-friendly)
    x = _conv_bn_relu(b, x, 3, 32, 3, 2, "stem")          # /2
    x = _conv_bn_relu(b, x, 32, 64, 3, 2, "s1a")          # /4
    x = _conv_bn_relu(b, x, 64, 64, 3, 1, "s1b")
    x = _conv_bn_relu(b, x, 64, 128, 3, 2, "s2a")         # /8
    x = _conv_bn_relu(b, x, 128, 128, 3, 1, "s2b")
    f0 = _conv_bn_relu(b, x, 128, 256, 3, 2, "s3a")       # /16 — feature 0
    f1 = _conv_bn_relu(b, f0, 256, 256, 3, 2, "s4a")      # /32 — feature 1
    f2 = _conv_bn_relu(b, f1, 256, 256, 3, 2, "s5a")      # /64 — feature 2

    feats = [(f0, 256, image // 16), (f1, 256, image // 32),
             (f2, 256, image // 64)]
    locs, confs = [], []
    for i, (f, c, fs) in enumerate(feats):
        loc = b.conv2d(f, c, anchors_per_cell * 4, 3, name=f"loc{i}")
        conf = b.conv2d(f, c, anchors_per_cell * classes, 3, name=f"conf{i}")
        locs.append(b.reshape(loc, (batch, fs * fs * anchors_per_cell, 4),
                              name=f"loc{i}_r", batch_leading=True))
        confs.append(b.reshape(conf, (batch, fs * fs * anchors_per_cell, classes),
                               name=f"conf{i}_r", batch_leading=True))
    loc_all = b.concat(locs, axis=1, name="loc_all")
    conf_all = b.concat(confs, axis=1, name="conf_all")
    scores = b.softmax(conf_all, name="scores")

    feature_sizes = [image // 16, image // 32, image // 64]
    scales = [0.12, 0.3, 0.6]
    priors = make_priors(feature_sizes, image, scales,
                         ratios=tuple([1.0, 2.0, 0.5][:anchors_per_cell]))
    a = priors.shape[0]
    b._param("priors", (a, 4))
    boxes = b.raw("box_decode", [loc_all], ["priors"], name="boxes",
                  variances=[0.1, 0.2])
    # topk=100 per class: with max_out=100 TOTAL detections, 100
    # candidates/class loses nothing in practice and halves the NMS
    # gather/IoU work — measured v5e-1 2026-08-21, the b64 post-proc is
    # candidate-count bound (PROFILE_TRACE_ssd.json)
    dets = b.raw("nms", [boxes, scores], name="detections",
                 max_out=100, topk=min(100, a), iou_thresh=0.45,
                 score_thresh=0.01)
    g = b.build(dets, family="ssd", num_priors=a, classes=classes)
    g.meta["priors_value"] = None  # priors array supplied by init hook below
    return g


def init_priors(graph: Graph) -> dict[str, np.ndarray]:
    """Deterministic priors for this graph's config (call after init_params
    and merge)."""
    image = graph.inputs["image"].shape[1]
    feature_sizes = [image // 16, image // 32, image // 64]
    scales = [0.12, 0.3, 0.6]
    apc_total = graph.meta["num_priors"]
    ratios = (1.0, 2.0, 0.5)
    pr = make_priors(feature_sizes, image, scales, ratios)
    assert pr.shape[0] == apc_total, (pr.shape, apc_total)
    return {"priors": pr}
