"""Real-checkpoint readiness drill (VERDICT r3 task 9): the FULL path the
driver will exercise the day real weights/data appear —

    torch .pth state_dict (torchvision naming)
      -> transform.cli --checkpoint          (quantized artifact on disk)
      -> eval.accuracy imagenet_eval --data  (top-1 delta vs FP32)

in one test, CPU, synthetic weights + synthetic labeled shards. The
pieces are covered separately elsewhere; this pins the seams (file
formats, name detection, artifact round-trip, shard loading)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


@pytest.mark.slow
@pytest.mark.parametrize("model,wbits", [("resnet50", 4), ("vit_b16", 8)])
def test_checkpoint_to_imagenet_eval_pipeline(tmp_path, model, wbits):
    torch = pytest.importorskip("torch")
    from tests.transform.test_importers import (_fake_tv_resnet50_state,
                                               _fake_tv_vit_b16_state)

    # 1. a torchvision-format checkpoint on disk (torch pickle)
    fake = (_fake_tv_resnet50_state() if model == "resnet50"
            else _fake_tv_vit_b16_state())
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in fake.items()}
    ckpt = tmp_path / f"{model}_tv.pth"
    torch.save(state, str(ckpt))

    # 2. transform CLI ingests it and writes a quantized artifact
    art = tmp_path / "art"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "tf2_tpu.transform.cli",
         "--model", model, "--wbits", str(wbits), "--out", str(art),
         "--checkpoint", str(ckpt), "--batch", "2", "--image", "64",
         "--calib-batches", "1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stdout + r.stderr
    assert (art / "graph.json").exists()

    # 3. synthetic labeled shards (the imagenet_eval wire format)
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    for s in range(2):
        np.savez(data / f"shard{s}.npz",
                 image=rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32),
                 label=rng.integers(0, 1000, (4,)))

    # 4. eval harness: checkpoint + shards -> top-1 delta report
    from eval.accuracy import imagenet_eval
    rep = imagenet_eval(model, wbits=wbits, data_dir=str(data), image=64,
                        batch=2, checkpoint=str(ckpt))
    assert rep["mode"] == "imagenet"
    assert 0.0 <= rep["quant_top1"] <= 100.0
    assert 0.0 <= rep["fp32_top1"] <= 100.0
    # random weights + random labels: no accuracy claim, but the delta
    # must be a finite number and the gate field present
    assert np.isfinite(rep["top1_delta"])
    assert "pass" in rep
