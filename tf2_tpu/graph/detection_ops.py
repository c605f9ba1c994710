"""Executor registrations for detection-head ops (box_decode, nms)."""
from __future__ import annotations

import jax.numpy as jnp

from .execute import register_op
from ..kernels import detection


@register_op("box_decode")
def _box_decode(node, params, loc):
    priors = params[node.params[0]]
    variances = tuple(node.attrs.get("variances", (0.1, 0.2)))
    return detection.decode_boxes(loc, jnp.asarray(priors, jnp.float32),
                                  variances)


@register_op("nms")
def _nms(node, params, boxes, scores):
    return detection.batched_nms(
        boxes, scores,
        max_out=node.attrs.get("max_out", 100),
        topk=node.attrs.get("topk", 200),
        iou_thresh=node.attrs.get("iou_thresh", 0.45),
        score_thresh=node.attrs.get("score_thresh", 0.01))
