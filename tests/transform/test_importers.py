"""Importer tests against a synthetic torchvision-shaped state dict."""
import numpy as np
import pytest

from tf2_tpu.models import get_model
from tf2_tpu.transform import importers


def _fake_tv_resnet50_state():
    """Exact torchvision resnet50 key/shape structure, random values."""
    rng = np.random.RandomState(0)
    s = {}

    def conv(name, o, i, k):
        s[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        s[f"{name}.weight"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5
        s[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        s[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        s[f"{name}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cfg = [(3, 64, 256, 64), (4, 128, 512, 256), (6, 256, 1024, 512),
           (3, 512, 2048, 1024)]
    for si, (blocks, mid, cout, cin0) in enumerate(cfg):
        cin = cin0
        for i in range(blocks):
            p = f"layer{si + 1}.{i}"
            conv(f"{p}.conv1", mid, cin, 1)
            bn(f"{p}.bn1", mid)
            conv(f"{p}.conv2", mid, mid, 3)
            bn(f"{p}.bn2", mid)
            conv(f"{p}.conv3", cout, mid, 1)
            bn(f"{p}.bn3", cout)
            if i == 0:
                conv(f"{p}.downsample.0", cout, cin, 1)
                bn(f"{p}.downsample.1", cout)
            cin = cout
    s["fc.weight"] = rng.randn(1000, 2048).astype(np.float32) * 0.02
    s["fc.bias"] = np.zeros(1000, np.float32)
    return s


def test_import_torchvision_resnet50_complete():
    g = get_model("resnet50", batch=1, image=224)
    state = _fake_tv_resnet50_state()
    params = importers.import_torchvision_resnet50(state, g)
    assert set(params) == set(g.params)
    # layout transposed: conv1 OIHW (64,3,7,7) -> HWIO (7,7,3,64)
    assert params["conv1.w"].shape == (7, 7, 3, 64)
    assert params["fc.w"].shape == (2048, 1000)


def test_import_runs_forward():
    import jax.numpy as jnp
    from tf2_tpu.graph import execute
    g = get_model("resnet50", batch=1, image=64)
    params = importers.import_torchvision_resnet50(_fake_tv_resnet50_state(), g)
    out = execute(g)(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (1, 1000)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_import_rejects_wrong_shape():
    g = get_model("resnet50", batch=1, image=224)
    state = _fake_tv_resnet50_state()
    state["fc.weight"] = state["fc.weight"][:, :100]
    with pytest.raises(ValueError, match="shape mismatch|missing"):
        importers.import_torchvision_resnet50(state, g)


def test_import_flat_missing_raises():
    g = get_model("squeezenet_v1_1", batch=1, image=64)
    with pytest.raises(ValueError, match="missing"):
        importers.import_flat({}, g)
