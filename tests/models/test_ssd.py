"""SSD + NMS tests (SURVEY.md §5: detection smoke + NMS correctness)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_tpu.graph import execute, init_params
from tf2_tpu.kernels import detection
from tf2_tpu.models import get_model
from tf2_tpu.models.ssd import init_priors


def test_iou_matrix():
    boxes = jnp.array([[0, 0, 2, 2], [1, 1, 3, 3], [10, 10, 12, 12]],
                      jnp.float32)
    iou = np.asarray(detection.iou_matrix(boxes))
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(1 / 7, abs=1e-5)  # 1 / (4+4-1)
    assert iou[0, 2] == 0.0


def test_nms_suppresses_overlaps():
    boxes = jnp.array([
        [0.0, 0.0, 1.0, 1.0],
        [0.02, 0.0, 1.02, 1.0],   # heavy overlap with 0
        [2.0, 2.0, 3.0, 3.0],     # disjoint
        [0.5, 0.5, 1.5, 1.5],     # moderate overlap with 0 (IoU ~0.19)
    ], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7, 0.6], jnp.float32)
    bk, sk, keep = detection.nms_single_class(boxes, scores, k=4,
                                              iou_thresh=0.5)
    assert list(np.asarray(keep)) == [True, False, True, True]


def test_nms_exact_vs_numpy_reference():
    """Greedy-NMS parity against a straightforward numpy implementation."""
    rng = np.random.RandomState(0)
    xy = rng.rand(64, 2)
    wh = 0.1 + 0.2 * rng.rand(64, 2)
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.rand(64).astype(np.float32)

    def np_nms(boxes, scores, thresh):
        order = np.argsort(-scores)
        keep = []
        for i in order:
            ok = True
            for j in keep:
                bi, bj = boxes[i], boxes[j]
                ix1, iy1 = np.maximum(bi[:2], bj[:2])
                ix2, iy2 = np.minimum(bi[2:], bj[2:])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                ai = (bi[2] - bi[0]) * (bi[3] - bi[1])
                aj = (bj[2] - bj[0]) * (bj[3] - bj[1])
                if inter / (ai + aj - inter + 1e-9) > thresh:
                    ok = False
                    break
            if ok:
                keep.append(i)
        return set(keep)

    want = np_nms(boxes, scores, 0.45)
    bk, sk, keep = detection.nms_single_class(
        jnp.asarray(boxes), jnp.asarray(scores), k=64, iou_thresh=0.45)
    order = np.argsort(-scores)
    got = {order[i] for i in range(64) if bool(np.asarray(keep)[i])}
    assert got == want


def test_ssd_forward_shapes():
    g = get_model("ssd", batch=2, image=128, classes=5)
    params = init_params(g, seed=0)
    params.update(init_priors(g))
    out = execute(g)(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (2, 100, 6)
    dets = np.asarray(out)
    # scores sorted desc, classes in [1, 5)
    assert (np.diff(dets[0, :, 4]) <= 1e-6).all()
    live = dets[dets[..., 4] > 0]
    if live.size:
        assert ((live[:, 5] >= 1) & (live[:, 5] < 5)).all()


def test_ssd_quantizes():
    from tf2_tpu.transform import transform_model, QuantSpec
    g = get_model("ssd", batch=1, image=128, classes=5)
    params = init_params(g, seed=0)
    params.update(init_priors(g))
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(0),
                                           g.inputs["image"].shape)}]
    art, fg, fp = transform_model(g, params, batches,
                                  qspec=QuantSpec(weight_bits=4))
    ops = {n.op for n in art.graph.nodes}
    assert "qconv2d" in ops and "nms" in ops
    out = execute(art.graph)(art.params, image=batches[0]["image"])
    assert out.shape == (1, 100, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_detection_map_smoke():
    """SURVEY.md §5.5's detection-mAP smoke: quantized SSD scored against
    the FP32 model's own detections (synthetic golden truth)."""
    import sys, os
    sys.path.insert(0, os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")))
    from eval.accuracy import detection_eval

    r = detection_eval(wbits=8, batches=1, batch=1, image=128, classes=6)
    assert r["n_image_class_pairs"] > 0, "no detections above threshold"
    # W8 quantization must preserve detector behavior closely
    assert r["map50_vs_fp32"] > 0.6, r


def test_average_precision_units():
    import numpy as np
    from eval.accuracy import _average_precision
    gt = np.array([[0.1, 0.1, 0.4, 0.4]])
    perfect = np.array([[0.1, 0.1, 0.4, 0.4, 0.9]])
    assert _average_precision(gt, perfect) == 1.0
    miss = np.array([[0.6, 0.6, 0.9, 0.9, 0.9]])
    assert _average_precision(gt, miss) == 0.0
    # duplicate detections: second is a false positive, AP stays 1.0 up to
    # full recall then the envelope keeps it at 1.0 -> AP 1.0; scored first
    dup = np.array([[0.1, 0.1, 0.4, 0.4, 0.9], [0.1, 0.1, 0.4, 0.4, 0.8]])
    assert _average_precision(gt, dup) == 1.0
