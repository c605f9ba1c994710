"""Detection post-processing: prior-box decode + NMS (reference parity:
SURVEY.md §3 R9, host-side C++ NMS in the FPGA stack).

TPU-native design (SURVEY.md §8 hard-part 6): NMS is data-dependent, so the
FPGA/CPU formulation (dynamic keep-lists) is replaced by a fixed-shape
formulation XLA compiles cleanly: per class, top-k by score, a k×k IoU
matrix, and a greedy suppression sweep as a lax.fori_loop over sorted
candidates — everything static shapes, everything batchable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def decode_boxes(loc: jax.Array, priors: jax.Array,
                 variances=(0.1, 0.2)) -> jax.Array:
    """SSD box decode. loc (..., A, 4) deltas [dcx,dcy,dw,dh]; priors (A, 4)
    [cx,cy,w,h] in [0,1]. Returns (..., A, 4) [x1,y1,x2,y2]."""
    pcx, pcy, pw, ph = jnp.split(priors, 4, axis=-1)
    dcx, dcy, dw, dh = jnp.split(loc, 4, axis=-1)
    cx = pcx + dcx * variances[0] * pw
    cy = pcy + dcy * variances[0] * ph
    w = pw * jnp.exp(dw * variances[1])
    h = ph * jnp.exp(dh * variances[1])
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def iou_matrix(boxes: jax.Array) -> jax.Array:
    """(k, 4) xyxy -> (k, k) IoU."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)  # (k,1)
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)  # (k,1)
    ix1 = jnp.maximum(x1, x1.T)
    iy1 = jnp.maximum(y1, y1.T)
    ix2 = jnp.minimum(x2, x2.T)
    iy2 = jnp.minimum(y2, y2.T)
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area + area.T - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_single_class(boxes: jax.Array, scores: jax.Array, k: int,
                     iou_thresh: float) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy NMS over the top-k of one class. boxes (A,4), scores (A,).
    Returns (boxes (k,4), scores (k,), keep mask (k,)) sorted by score."""
    scores_k, idx = jax.lax.top_k(scores, k)
    boxes_k = boxes[idx]
    iou = iou_matrix(boxes_k)

    def body(i, keep):
        # candidate i survives if not suppressed by any kept j < i
        sup = jnp.any((iou[:, i] > iou_thresh) & keep &
                      (jnp.arange(k) < i))
        return keep.at[i].set(jnp.logical_not(sup))

    keep = jax.lax.fori_loop(1, k, body, jnp.ones(k, bool))
    return boxes_k, scores_k, keep


@functools.partial(jax.jit, static_argnames=("max_out", "topk"))
def batched_nms(boxes: jax.Array, cls_scores: jax.Array, max_out: int = 100,
                topk: int = 200, iou_thresh: float = 0.45,
                score_thresh: float = 0.01) -> jax.Array:
    """boxes (N, A, 4); cls_scores (N, A, C) with class 0 = background.
    Returns (N, max_out, 6): [x1,y1,x2,y2,score,class], score-sorted,
    zero-padded."""
    n, a, c = cls_scores.shape
    k = min(topk, a)

    def per_image(bx, sc):
        def per_class(ci):
            s = jnp.where(sc[:, ci] >= score_thresh, sc[:, ci], 0.0)
            bk, sk, keep = nms_single_class(bx, s, k, iou_thresh)
            sk = jnp.where(keep, sk, 0.0)
            cls = jnp.full((k, 1), ci, jnp.float32)
            return jnp.concatenate([bk, sk[:, None], cls], axis=-1)  # (k, 6)

        # classes 1..C-1 (skip background)
        dets = jax.vmap(per_class)(jnp.arange(1, c))  # (C-1, k, 6)
        dets = dets.reshape(-1, 6)
        top_s, top_i = jax.lax.top_k(dets[:, 4], max_out)
        return dets[top_i]

    return jax.vmap(per_image)(boxes, cls_scores)
