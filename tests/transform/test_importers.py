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


def _fake_tv_squeezenet_state():
    """Exact torchvision squeezenet1_1 key/shape structure."""
    rng = np.random.RandomState(1)
    s = {}

    def conv(name, o, i, k):
        s[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05
        s[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    conv("features.0", 64, 3, 3)
    cins = (64, 128, 128, 256, 256, 384, 384, 512)
    cfgs = ((16, 64), (16, 64), (32, 128), (32, 128),
            (48, 192), (48, 192), (64, 256), (64, 256))
    for feat, cin, (sq, ex) in zip((3, 4, 6, 7, 9, 10, 11, 12), cins, cfgs):
        conv(f"features.{feat}.squeeze", sq, cin, 1)
        conv(f"features.{feat}.expand1x1", ex, sq, 1)
        conv(f"features.{feat}.expand3x3", ex, sq, 3)
    conv("classifier.1", 1000, 512, 1)
    return s


def test_import_torchvision_squeezenet_forward():
    import jax.numpy as jnp
    from tf2_tpu.graph import execute
    g = get_model("squeezenet_v1_1", batch=1, image=64)
    params = importers.import_torchvision_squeezenet1_1(
        _fake_tv_squeezenet_state(), g)
    assert set(params) == set(g.params)
    out = execute(g)(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (1, 1000)
    assert bool(jnp.all(jnp.isfinite(out)))


_TV_INCEPTION = {
    "3a": (192, 64, 96, 128, 16, 32, 32),
    "3b": (256, 128, 128, 192, 32, 96, 64),
    "4a": (480, 192, 96, 208, 16, 48, 64),
    "4b": (512, 160, 112, 224, 24, 64, 64),
    "4c": (512, 128, 128, 256, 24, 64, 64),
    "4d": (512, 112, 144, 288, 32, 64, 64),
    "4e": (528, 256, 160, 320, 32, 128, 128),
    "5a": (832, 256, 160, 320, 32, 128, 128),
    "5b": (832, 384, 192, 384, 48, 128, 128),
}


def _fake_tv_googlenet_state():
    """torchvision googlenet (BN variant) key/shape structure — branch3.1
    ships 3x3 kernels (torchvision's deviation from the paper's 5x5)."""
    rng = np.random.RandomState(2)
    s = {}

    def bconv(name, o, i, k):
        s[f"{name}.conv.weight"] = (rng.randn(o, i, k, k) * 0.05
                                    ).astype(np.float32)
        s[f"{name}.bn.weight"] = (np.abs(rng.randn(o)) + 0.5
                                  ).astype(np.float32)
        s[f"{name}.bn.bias"] = (rng.randn(o) * 0.1).astype(np.float32)
        s[f"{name}.bn.running_mean"] = (rng.randn(o) * 0.1
                                        ).astype(np.float32)
        s[f"{name}.bn.running_var"] = (np.abs(rng.randn(o)) + 0.5
                                       ).astype(np.float32)

    bconv("conv1", 64, 3, 7)
    bconv("conv2", 64, 64, 1)
    bconv("conv3", 192, 64, 3)
    for blk, (cin, c1, r3, c3, r5, c5, pp) in _TV_INCEPTION.items():
        p = f"inception{blk}"
        bconv(f"{p}.branch1", c1, cin, 1)
        bconv(f"{p}.branch2.0", r3, cin, 1)
        bconv(f"{p}.branch2.1", c3, r3, 3)
        bconv(f"{p}.branch3.0", r5, cin, 1)
        bconv(f"{p}.branch3.1", c5, r5, 3)   # 3x3, padded to 5x5 on import
        bconv(f"{p}.branch4.1", pp, cin, 1)
    s["fc.weight"] = rng.randn(1000, 1024).astype(np.float32) * 0.02
    s["fc.bias"] = np.zeros(1000, np.float32)
    return s


def test_import_torchvision_googlenet_forward():
    import jax.numpy as jnp
    from tf2_tpu.graph import execute
    g = get_model("googlenet", batch=1, image=64)
    params = importers.import_torchvision_googlenet(
        _fake_tv_googlenet_state(), g)
    assert set(params) == set(g.params)
    assert params["inc3a_5x5.w"].shape == (5, 5, 16, 32)
    out = execute(g)(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (1, 1000)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_bn_fold_matches_explicit_bn():
    """Folded conv must equal conv->BN on random data."""
    import jax.numpy as jnp
    from jax import lax
    rng = np.random.RandomState(3)
    w = rng.randn(8, 4, 3, 3).astype(np.float32) * 0.1
    gamma = (np.abs(rng.randn(8)) + 0.5).astype(np.float32)
    beta = rng.randn(8).astype(np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = (np.abs(rng.randn(8)) + 0.5).astype(np.float32)
    x = jnp.asarray(rng.randn(2, 9, 9, 4).astype(np.float32))
    wf, bf = importers._fold_bn_into_conv(w, gamma, beta, mean, var)

    def conv(xx, ww):
        return lax.conv_general_dilated(
            xx, jnp.asarray(ww.transpose(2, 3, 1, 0)), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y_ref = conv(x, w)
    y_ref = ((y_ref - mean) * (gamma / np.sqrt(var + 1e-3)) + beta)
    y_fold = conv(x, wf.transpose(0, 1, 2, 3)) + bf
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_pad_kernel_center_equivalence():
    """3x3 kernel zero-padded to 5x5 must produce identical SAME conv."""
    import jax.numpy as jnp
    from jax import lax
    rng = np.random.RandomState(4)
    w3 = rng.randn(6, 5, 3, 3).astype(np.float32)
    w5 = importers._pad_kernel_center(w3, 5, 5)
    x = jnp.asarray(rng.randn(1, 8, 8, 5).astype(np.float32))

    def conv(ww):
        return lax.conv_general_dilated(
            x, jnp.asarray(ww.transpose(2, 3, 1, 0)), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    np.testing.assert_allclose(np.asarray(conv(w5)), np.asarray(conv(w3)),
                               rtol=1e-5, atol=1e-5)


def _fake_keras_resnet50_weights(graph):
    """Keras-applications ResNet50 flat weight dict (<layer>/<var> keys,
    HWIO convs, (in,out) dense), synthesized from the graph's own specs
    via the inverse of the importer's name map."""
    rng = np.random.RandomState(5)
    w = {}
    inv = {"conv1": "conv1"}
    depths = (3, 4, 6, 3)
    for s, blocks in enumerate(depths):
        for i in range(blocks):
            for j in (1, 2, 3):
                inv[f"s{s + 1}b{i}_c{j}"] = f"conv{s + 2}_block{i + 1}_{j}"
            inv[f"s{s + 1}b{i}_down"] = f"conv{s + 2}_block{i + 1}_0"
    for ours, keras in inv.items():
        if f"{ours}.w" not in graph.params:
            continue
        shape = tuple(graph.params[f"{ours}.w"].shape)
        w[f"{keras}_conv/kernel"] = rng.randn(*shape).astype(np.float32) * 0.05
        w[f"{keras}_conv/bias"] = (rng.randn(shape[-1]) * 0.01
                                   ).astype(np.float32)
        c = shape[-1]
        w[f"{keras}_bn/gamma"] = (np.abs(rng.randn(c)) + 0.5
                                  ).astype(np.float32)
        w[f"{keras}_bn/beta"] = (rng.randn(c) * 0.1).astype(np.float32)
        w[f"{keras}_bn/moving_mean"] = (rng.randn(c) * 0.1
                                        ).astype(np.float32)
        w[f"{keras}_bn/moving_variance"] = (np.abs(rng.randn(c)) + 0.5
                                            ).astype(np.float32)
    w["predictions/kernel"] = rng.randn(2048, 1000).astype(np.float32) * 0.02
    w["predictions/bias"] = np.zeros(1000, np.float32)
    return w


def test_import_keras_resnet50_forward():
    import jax.numpy as jnp
    from tf2_tpu.graph import execute
    g = get_model("resnet50", batch=1, image=64)
    weights = _fake_keras_resnet50_weights(g)
    params = importers.import_keras_resnet50(weights, g)
    assert set(params) == set(g.params)
    # conv bias folded into BN mean
    np.testing.assert_allclose(
        params["conv1_bn.mean"],
        weights["conv1_bn/moving_mean"] - weights["conv1_conv/bias"])
    out = execute(g)(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (1, 1000)
    assert bool(jnp.all(jnp.isfinite(out)))


def _fake_tv_vit_b16_state(mlp_naming="linear"):
    """Exact torchvision vit_b_16 key/shape structure, random values."""
    rng = np.random.RandomState(1)
    s = {"class_token": rng.randn(1, 1, 768).astype(np.float32) * 0.02,
         "conv_proj.weight": rng.randn(768, 3, 16, 16).astype(np.float32) * 0.02,
         "conv_proj.bias": np.zeros(768, np.float32),
         "encoder.pos_embedding": rng.randn(1, 197, 768).astype(np.float32) * 0.02}

    def lin(name, o, i):
        s[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
        s[f"{name}.bias"] = np.zeros(o, np.float32)

    for i in range(12):
        p = f"encoder.layers.encoder_layer_{i}"
        s[f"{p}.ln_1.weight"] = np.ones(768, np.float32)
        s[f"{p}.ln_1.bias"] = np.zeros(768, np.float32)
        s[f"{p}.self_attention.in_proj_weight"] = \
            rng.randn(2304, 768).astype(np.float32) * 0.02
        s[f"{p}.self_attention.in_proj_bias"] = np.zeros(2304, np.float32)
        lin(f"{p}.self_attention.out_proj", 768, 768)
        s[f"{p}.ln_2.weight"] = np.ones(768, np.float32)
        s[f"{p}.ln_2.bias"] = np.zeros(768, np.float32)
        m1 = f"{p}.mlp.linear_1" if mlp_naming == "linear" else f"{p}.mlp.0"
        m2 = f"{p}.mlp.linear_2" if mlp_naming == "linear" else f"{p}.mlp.3"
        lin(m1, 3072, 768)
        lin(m2, 768, 3072)
    s["encoder.ln.weight"] = np.ones(768, np.float32)
    s["encoder.ln.bias"] = np.zeros(768, np.float32)
    lin("heads.head", 1000, 768)
    return s


@pytest.mark.parametrize("mlp_naming", ["linear", "indexed"])
def test_import_torchvision_vit_b16_complete(mlp_naming):
    g = get_model("vit_b16", batch=1, image=224)
    state = _fake_tv_vit_b16_state(mlp_naming)
    params = importers.import_torchvision_vit_b16(state, g)
    assert set(params) == set(g.params)
    # pos embedding: class-token row dropped, token rows preserved
    np.testing.assert_allclose(
        params["pos_embed"], state["encoder.pos_embedding"][:, 1:, :])
    # qkv packing order preserved (q;k;v rows -> columns after .T)
    np.testing.assert_allclose(
        params["blk0_qkv.w"],
        state["encoder.layers.encoder_layer_0.self_attention.in_proj_weight"].T)


def _fake_torch_ssd_state(graph):
    """torch-module naming for this repo's own SSD architecture."""
    rng = np.random.RandomState(2)
    s = {}
    for pname, spec in graph.params.items():
        shape = tuple(spec.shape)
        if pname == "priors":
            continue  # generated, not learned
        if pname.endswith(".w"):
            base = pname[:-2]
            if len(shape) == 4:
                kh, kw, ci, co = shape
                s[f"{base}.weight"] = rng.randn(co, ci, kh, kw).astype(np.float32) * 0.05
            else:
                ci, co = shape
                s[f"{base}.weight"] = rng.randn(co, ci).astype(np.float32) * 0.05
        elif pname.endswith(".b"):
            s[f"{pname[:-2]}.bias"] = np.zeros(shape, np.float32)
        elif pname.endswith("_bn.scale"):
            s[f"{pname[:-9]}_bn.weight"] = np.ones(shape, np.float32)
        elif pname.endswith("_bn.offset"):
            s[f"{pname[:-10]}_bn.bias"] = np.zeros(shape, np.float32)
        elif pname.endswith("_bn.mean"):
            s[f"{pname[:-8]}_bn.running_mean"] = np.zeros(shape, np.float32)
        elif pname.endswith("_bn.var"):
            s[f"{pname[:-7]}_bn.running_var"] = np.ones(shape, np.float32)
    return s


def test_import_torch_ssd_complete():
    g = get_model("ssd", batch=1, image=256)
    state = _fake_torch_ssd_state(g)
    params = importers.import_torch_ssd(state, g)
    assert set(params) == set(g.params)
    assert params["priors"].shape == tuple(g.params["priors"].shape)
    # conv layout transposed OIHW -> HWIO
    assert params["stem.w"].shape == tuple(g.params["stem.w"].shape)
