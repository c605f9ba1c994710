"""Accuracy harness (SURVEY.md §5.5): top-1/top-5 with a real dataset when
one exists, golden-parity methodology otherwise (this sandbox ships no
ImageNet and no pretrained checkpoints — SURVEY.md Appendix A).

Modes:
- ``golden``: FP32-folded vs quantized forward on identical weights over N
  synthetic batches -> relative error, cosine, top-1 agreement. This is the
  accuracy regression signal available today; the ≤0.5% top-1 gate binds
  when the driver supplies real checkpoints + data.
- ``imagenet``: directory of (image, label) .npy shards -> real top-1/top-5
  for both FP32 and quantized graphs, reporting the delta against the gate.

Usage: python -m eval.accuracy --model resnet50 --wbits 4 [--data DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATE_TOP1_DELTA = 0.5  # percent, BASELINE.json north star


def golden_eval(model: str, wbits: int, batches: int = 4, batch: int = 8,
                image: int = 224, classes: int = 1000, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf2_tpu.graph import execute, init_params
    from tf2_tpu.models import get_model
    from tf2_tpu.transform import QuantSpec, transform_model

    g = get_model(model, batch=batch, image=image, classes=classes)
    params = init_params(g, seed=seed)
    if model == "ssd":
        from tf2_tpu.models.ssd import init_priors
        params.update(init_priors(g))
    key = jax.random.PRNGKey(seed)
    calib = []
    for _ in range(2):
        key, k = jax.random.split(key)
        calib.append({"image": jax.random.normal(k, g.inputs["image"].shape)})
    art, fg, fp = transform_model(g, params, calib,
                                  qspec=QuantSpec(weight_bits=wbits))
    fp_fn = jax.jit(execute(fg))
    q_fn = jax.jit(execute(art.graph))
    errs, coss, agrees = [], [], []
    for _ in range(batches):
        key, k = jax.random.split(key)
        x = jax.random.normal(k, g.inputs["image"].shape)
        yf = np.asarray(fp_fn(fp, image=x))
        yq = np.asarray(q_fn(art.params, image=x))
        errs.append(float(np.linalg.norm(yq - yf) /
                          (np.linalg.norm(yf) + 1e-12)))
        coss.append(float((yf.ravel() @ yq.ravel()) /
                          (np.linalg.norm(yf) * np.linalg.norm(yq) + 1e-12)))
        if yf.ndim == 2:
            agrees.append(float((yf.argmax(-1) == yq.argmax(-1)).mean()))
    return {
        "mode": "golden", "model": model, "wbits": wbits,
        "rel_err_mean": sum(errs) / len(errs),
        "cosine_mean": sum(coss) / len(coss),
        "top1_agreement": sum(agrees) / len(agrees) if agrees else None,
    }


def _average_precision(gt: "np.ndarray", det: "np.ndarray",
                       iou_thresh: float = 0.5) -> float:
    """VOC-style AP of one image-class pair. gt (G,4); det (D,5) rows
    [x1,y1,x2,y2,score] sorted by score desc. 11-point interpolation-free
    (continuous) AP."""
    import numpy as np
    if len(gt) == 0:
        return float(len(det) == 0)
    if len(det) == 0:
        return 0.0
    ix1 = np.maximum(det[:, None, 0], gt[None, :, 0])
    iy1 = np.maximum(det[:, None, 1], gt[None, :, 1])
    ix2 = np.minimum(det[:, None, 2], gt[None, :, 2])
    iy2 = np.minimum(det[:, None, 3], gt[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area_d = np.clip(det[:, 2] - det[:, 0], 0, None) * np.clip(
        det[:, 3] - det[:, 1], 0, None)
    area_g = np.clip(gt[:, 2] - gt[:, 0], 0, None) * np.clip(
        gt[:, 3] - gt[:, 1], 0, None)
    iou = inter / np.maximum(area_d[:, None] + area_g[None, :] - inter, 1e-9)
    taken = np.zeros(len(gt), bool)
    tp = np.zeros(len(det))
    for i in range(len(det)):
        j = int(np.argmax(np.where(taken, -1.0, iou[i])))
        if iou[i, j] >= iou_thresh and not taken[j]:
            taken[j] = True
            tp[i] = 1
    cum_tp = np.cumsum(tp)
    recall = cum_tp / len(gt)
    precision = cum_tp / (np.arange(len(det)) + 1)
    # envelope + integrate
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    ap = 0.0
    prev_r = 0.0
    for r, p in zip(recall, precision):
        ap += (r - prev_r) * p
        prev_r = r
    return float(ap)


def detection_eval(wbits: int = 4, batches: int = 4, batch: int = 2,
                   image: int = 256, classes: int = 21, seed: int = 0,
                   score_thresh: float = 0.05) -> dict:
    """Synthetic-mAP smoke for SSD (SURVEY.md §5.5; VERDICT r2 item 10).

    No detection dataset ships in this sandbox, so ground truth is the
    FP32-folded model's own post-NMS detections: the quantized model's
    detections are scored against them with VOC AP at IoU 0.5. mAP ~= 1
    means quantization preserved the detector's behavior; a real-dataset
    mAP gate binds when the driver provides data.
    """
    import jax
    import numpy as np

    from tf2_tpu.graph import execute, init_params
    from tf2_tpu.models import get_model
    from tf2_tpu.models.ssd import init_priors
    from tf2_tpu.transform import QuantSpec, transform_model

    g = get_model("ssd", batch=batch, image=image, classes=classes)
    params = init_params(g, seed=seed)
    params.update(init_priors(g))
    key = jax.random.PRNGKey(seed)
    calib = []
    for _ in range(2):
        key, k = jax.random.split(key)
        calib.append({"image": jax.random.normal(k, g.inputs["image"].shape)})
    art, fg, fp = transform_model(g, params, calib,
                                  qspec=QuantSpec(weight_bits=wbits))
    fp_fn = jax.jit(execute(fg))
    q_fn = jax.jit(execute(art.graph))

    aps = []
    matched = total_gt = total_det = 0
    for _ in range(batches):
        key, k = jax.random.split(key)
        x = jax.random.normal(k, g.inputs["image"].shape)
        det_fp = np.asarray(fp_fn(fp, image=x))       # (B, M, 6)
        det_q = np.asarray(q_fn(art.params, image=x))
        for b in range(det_fp.shape[0]):
            for ci in np.unique(det_fp[b, :, 5][det_fp[b, :, 4]
                                                >= score_thresh]):
                gt_rows = det_fp[b][(det_fp[b, :, 5] == ci)
                                    & (det_fp[b, :, 4] >= score_thresh)]
                dq = det_q[b][(det_q[b, :, 5] == ci)
                              & (det_q[b, :, 4] >= score_thresh)]
                dq = dq[np.argsort(-dq[:, 4])]
                aps.append(_average_precision(gt_rows[:, :4], dq[:, :5]))
                total_gt += len(gt_rows)
                total_det += len(dq)
    return {
        "mode": "detection_golden", "model": "ssd", "wbits": wbits,
        "map50_vs_fp32": sum(aps) / max(len(aps), 1),
        "n_image_class_pairs": len(aps),
        "fp32_dets": total_gt, "quant_dets": total_det,
    }


def imagenet_eval(model: str, wbits: int, data_dir: str, image: int = 224,
                  batch: int = 32, checkpoint: str | None = None) -> dict:
    """Real top-1/top-5. Shards: data_dir/*.npz with arrays 'image' (N,H,W,3
    float32, preprocessed) and 'label' (N,)."""
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf2_tpu.graph import execute, init_params
    from tf2_tpu.models import get_model
    from tf2_tpu.transform import QuantSpec, transform_model

    g = get_model(model, batch=batch, image=image)
    if checkpoint:
        from tf2_tpu.transform.importers import load_checkpoint
        params = load_checkpoint(checkpoint, g)
    else:
        params = init_params(g, seed=0)
    shards = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
    if not shards:
        raise FileNotFoundError(f"no .npz shards in {data_dir}")
    first = np.load(shards[0])
    calib = [{"image": jnp.asarray(first["image"][:batch])}]
    art, fg, fp = transform_model(g, params, calib,
                                  qspec=QuantSpec(weight_bits=wbits))
    fp_fn = jax.jit(execute(fg))
    q_fn = jax.jit(execute(art.graph))

    def run(fn, p):
        top1 = top5 = n = 0
        for s in shards:
            d = np.load(s)
            imgs, labels = d["image"], d["label"]
            for i in range(0, len(imgs) - batch + 1, batch):
                logits = np.asarray(fn(p, image=jnp.asarray(imgs[i:i + batch])))
                lab = labels[i:i + batch]
                top1 += (logits.argmax(-1) == lab).sum()
                top5 += sum(l in t for l, t in
                            zip(lab, np.argsort(-logits, -1)[:, :5]))
                n += batch
        return 100 * top1 / n, 100 * top5 / n

    fp1, fp5 = run(fp_fn, fp)
    q1, q5 = run(q_fn, art.params)
    return {
        "mode": "imagenet", "model": model, "wbits": wbits,
        "fp32_top1": fp1, "fp32_top5": fp5,
        "quant_top1": q1, "quant_top5": q5,
        "top1_delta": fp1 - q1, "gate": GATE_TOP1_DELTA,
        "pass": (fp1 - q1) <= GATE_TOP1_DELTA,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--wbits", type=int, default=4)
    ap.add_argument("--data", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--image", type=int, default=None,
                    help="default 224 (256 for ssd — its heads need "
                         "64 | image)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args(argv)
    if args.image is None:
        args.image = 256 if args.model == "ssd" else 224
    if args.data:
        out = imagenet_eval(args.model, args.wbits, args.data,
                            image=args.image, batch=args.batch,
                            checkpoint=args.checkpoint)
    elif args.model == "ssd":
        out = detection_eval(wbits=args.wbits, batches=args.batches,
                             batch=args.batch, image=args.image)
    else:
        out = golden_eval(args.model, args.wbits, batches=args.batches,
                          batch=args.batch, image=args.image)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
