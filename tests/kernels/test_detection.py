"""NMS fixpoint-vs-sequential exactness (kernels/detection.py).

The TPU NMS runs a vectorized fixpoint iteration; greedy NMS semantics
(suppress by any KEPT higher-scored overlapping box) must match the
textbook sequential sweep bit-for-bit on every random instance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_tpu.kernels.detection import (batched_nms, iou_matrix,
                                       nms_single_class)


def _greedy_reference(boxes: np.ndarray, scores: np.ndarray,
                      iou_thresh: float) -> np.ndarray:
    """Sequential greedy keep mask over score-sorted candidates."""
    k = len(scores)
    iou = np.asarray(iou_matrix(jnp.asarray(boxes)))
    keep = np.ones(k, bool)
    for i in range(1, k):
        for j in range(i):
            if keep[j] and iou[j, i] > iou_thresh:
                keep[i] = False
                break
    return keep


def _random_instance(rng, a: int, clusters: int = 8):
    """Clustered boxes so suppression chains actually form."""
    centers = rng.uniform(0.1, 0.9, (clusters, 2))
    cx = centers[rng.integers(0, clusters, a)] + rng.normal(0, 0.03, (a, 2))
    wh = rng.uniform(0.05, 0.25, (a, 2))
    boxes = np.concatenate([cx - wh / 2, cx + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, a).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_nms_fixpoint_matches_sequential_greedy(seed):
    rng = np.random.default_rng(seed)
    boxes, scores = _random_instance(rng, a=96)
    k = 64
    bk, sk, keep = jax.jit(nms_single_class, static_argnums=2)(
        jnp.asarray(boxes), jnp.asarray(scores), k, 0.45)
    order = np.argsort(-scores, kind="stable")[:k]
    ref_keep = _greedy_reference(boxes[order], scores[order], 0.45)
    np.testing.assert_array_equal(np.asarray(keep), ref_keep)
    np.testing.assert_allclose(np.asarray(sk), scores[order], rtol=1e-6)


def test_nms_deep_chain_converges():
    """A worst-case linear suppression chain (each box overlaps only its
    neighbor, scores descending) exercises the maximum fixpoint depth:
    greedy keeps alternating boxes."""
    k = 32
    # boxes along a line, 60% overlap with the next one only
    x = np.arange(k, dtype=np.float32) * 0.4
    boxes = np.stack([x, np.zeros(k, np.float32),
                      x + 1.0, np.ones(k, np.float32)], -1)
    scores = np.linspace(1.0, 0.5, k).astype(np.float32)
    _, _, keep = nms_single_class(jnp.asarray(boxes), jnp.asarray(scores),
                                  k, 0.4)
    ref = _greedy_reference(boxes, scores, 0.4)
    np.testing.assert_array_equal(np.asarray(keep), ref)
    assert np.asarray(keep).tolist() == [i % 2 == 0 for i in range(k)]


def test_batched_nms_shapes_and_padding():
    rng = np.random.default_rng(7)
    n, a, c = 3, 128, 5
    boxes = np.stack([_random_instance(rng, a)[0] for _ in range(n)])
    scores = rng.uniform(0, 1, (n, a, c)).astype(np.float32)
    out = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      max_out=20, topk=64)
    assert out.shape == (n, 20, 6)
    s = np.asarray(out[..., 4])
    # score-sorted, non-negative
    assert (np.diff(s, axis=-1) <= 1e-6).all()
    assert (s >= 0).all()
