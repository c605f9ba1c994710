"""Caffe ingestion tests: wire-format round-trip, legacy schema, and full
SqueezeNet/GoogLeNet imports from synthesized structurally-exact
caffemodels (SURVEY.md §3 R3 — the reference's Caffe path)."""
import numpy as np
import pytest

from tf2_tpu.models import get_model
from tf2_tpu.transform import caffe


def test_roundtrip_parse_write():
    rng = np.random.RandomState(0)
    layers = {
        "conv1": {"type": "Convolution",
                  "blobs": [rng.randn(8, 3, 3, 3).astype(np.float32),
                            rng.randn(8).astype(np.float32)]},
        "fc": {"type": "InnerProduct",
               "blobs": [rng.randn(10, 32).astype(np.float32),
                         rng.randn(10).astype(np.float32)]},
    }
    parsed = caffe.parse_caffemodel(caffe.write_caffemodel(layers))
    assert set(parsed) == {"conv1", "fc"}
    assert parsed["conv1"]["type"] == "Convolution"
    np.testing.assert_array_equal(parsed["conv1"]["blobs"][0],
                                  layers["conv1"]["blobs"][0])
    np.testing.assert_array_equal(parsed["fc"]["blobs"][1],
                                  layers["fc"]["blobs"][1])


def test_parse_legacy_v1_layers():
    """Legacy V1 schema: layers in field 2, blobs in field 6, enum type,
    legacy num/channels/height/width dims."""
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
    blob = b""
    for f, v in ((1, 2), (2, 3), (3, 2), (4, 2)):   # legacy dims
        blob += caffe._varint(f << 3 | 0) + caffe._varint(v)
    blob += caffe._ld(5, w.tobytes())
    layer = caffe._ld(1, b"conv_legacy")
    layer += caffe._varint(5 << 3 | 0) + caffe._varint(4)  # type enum: conv
    layer += caffe._ld(6, blob)
    net = caffe._ld(2, layer)
    parsed = caffe.parse_caffemodel(net)
    assert parsed["conv_legacy"]["type"] == "Convolution"
    np.testing.assert_array_equal(parsed["conv_legacy"]["blobs"][0], w)


def _synth_caffemodel(name_map, graph, fc_names=()):
    """Build a caffemodel whose blobs invert the importer's transposes."""
    rng = np.random.RandomState(1)
    layers = {}
    for src, dst in name_map.items():
        wspec = graph.params[f"{dst}.w"].shape
        if dst in fc_names:
            w = rng.randn(wspec[1], wspec[0]).astype(np.float32) * 0.05
        else:
            kh, kw, cin, cout = wspec
            w = rng.randn(cout, cin, kh, kw).astype(np.float32) * 0.05
        blobs = [w]
        if f"{dst}.b" in graph.params:
            blobs.append(rng.randn(wspec[-1] if dst not in fc_names
                                   else wspec[1]).astype(np.float32) * 0.01)
        layers[src] = {"type": "Convolution", "blobs": blobs}
    return caffe.write_caffemodel(layers)


def test_import_caffe_squeezenet_forward():
    import jax.numpy as jnp
    from tf2_tpu.graph import execute
    g = get_model("squeezenet_v1_1", batch=1, image=64)
    nm = caffe.squeezenet_v1_1_name_map()
    data = _synth_caffemodel(nm, g)
    params = caffe.import_caffe(caffe.parse_caffemodel(data), g, nm)
    assert set(params) == set(g.params)
    out = execute(g)(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (1, 1000)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_import_caffe_googlenet_forward():
    import jax.numpy as jnp
    from tf2_tpu.graph import execute
    g = get_model("googlenet", batch=1, image=64)
    nm = caffe.googlenet_name_map()
    fc = {"fc"}
    data = _synth_caffemodel(nm, g, fc_names=fc)
    params = caffe.import_caffe(caffe.parse_caffemodel(data), g, nm,
                                fc_names=fc)
    assert set(params) == set(g.params)
    out = execute(g)(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (1, 1000)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_import_caffe_missing_layer_raises():
    g = get_model("squeezenet_v1_1", batch=1, image=64)
    nm = caffe.squeezenet_v1_1_name_map()
    with pytest.raises(ValueError, match="missing layer"):
        caffe.import_caffe({}, g, nm)
