"""Transform Kit CLI — reference parity: TF2's per-model TransForm scripts
(SURVEY.md §3 R1-R3) collapse to one parameterized command:

    python -m tf2_tpu.transform.cli --model resnet50 --wbits 4 \
        --out /tmp/art_resnet50 [--calib-batches 2 --batch 4 --image 224]

Runs fold -> calibrate -> quantize -> save. Weights come from a checkpoint
(--checkpoint, safetensors fp32 dump matching the model's param names) or
deterministic He init when absent (no pretrained data ships in this
sandbox — SURVEY.md Appendix A). Transform is an OFFLINE tool: run it under
JAX_PLATFORMS=cpu; the fitters are numpy, only calibration traces JAX.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--wbits", type=int, default=4, choices=(4, 8))
    ap.add_argument("--batch", type=int, default=4, help="calibration batch")
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--classes", type=int, default=1000)
    ap.add_argument("--calib-batches", type=int, default=2)
    ap.add_argument("--estimator", default="percentile",
                    choices=("absmax", "percentile", "mse"))
    ap.add_argument("--checkpoint", default=None,
                    help="safetensors fp32 checkpoint (else He init)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prune", type=float, default=0.0)
    ap.add_argument("--no-first-last-w8", action="store_true")
    ap.add_argument("--platform", default="cpu",
                    help="calibration platform; transform is offline tooling "
                         "and defaults to CPU (NB: the axon sitecustomize "
                         "overrides JAX_PLATFORMS env, so we force via config)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ..graph import init_params
    from ..models import get_model
    from . import (PruneSpec, QuantSpec, save_quantized, transform_model)

    t0 = time.time()
    if args.model == "ssd" and args.classes == 1000:
        args.classes = 21  # SSD's natural default (VOC-style)
    g = get_model(args.model, batch=args.batch, image=args.image,
                  classes=args.classes)
    if args.checkpoint:
        # any supported format/naming: flat safetensors/npz, torch .pth
        # state_dicts (torchvision naming), keras dicts, .caffemodel
        from .importers import load_checkpoint
        params = load_checkpoint(args.checkpoint, g)
    else:
        params = init_params(g, seed=args.seed)
    if args.model == "ssd":
        from ..models.ssd import init_priors
        params.update(init_priors(g))
    key = jax.random.PRNGKey(args.seed + 1)
    batches = []
    for _ in range(args.calib_batches):
        key, k = jax.random.split(key)
        batches.append({"image": jax.random.normal(
            k, g.inputs["image"].shape, jnp.float32)})
    qspec = QuantSpec(weight_bits=args.wbits,
                      first_last_w8=not args.no_first_last_w8,
                      act_estimator=args.estimator)
    pspec = PruneSpec(fraction=args.prune) if args.prune > 0 else None
    art, fg, fp = transform_model(g, params, batches, qspec=qspec, pspec=pspec)
    save_quantized(args.out, art)
    import numpy as np
    fp_bytes = sum(int(np.prod(v.shape)) * 4 for v in fp.values())
    print(json.dumps({
        "model": args.model, "wbits": args.wbits, "out": args.out,
        "artifact_mb": round(art.size_bytes() / 1e6, 2),
        "fp32_mb": round(fp_bytes / 1e6, 2),
        "compression": round(fp_bytes / max(art.size_bytes(), 1), 2),
        "seconds": round(time.time() - t0, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
