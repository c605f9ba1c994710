"""W-pair-packed stem (graph/optimize.pack_phase_stem -> dispatch wpack2).

The round-5 stem answer: pack 2 W-pixels into channels so the stride-2
k×k cin<=4 stem becomes ONE stride-(2,1) conv with canonical NHWC output
(no phases, nothing downstream perturbed). Bit-exactness is the contract:
quantized values are integers <= 127 (exact in bf16), f32 accumulation,
K*127^2 < 2^24. Measured v5e-1 2026-08-21: ResNet-50 b64 whole-graph
3.50 -> 3.32 ms (interleaved A/B x3); bench.py headline 19,621 img/s.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_tpu.graph import execute, init_params
from tf2_tpu.models import get_model
from tf2_tpu.runtime import Engine
from tf2_tpu.transform import QuantSpec, transform_model


@pytest.mark.parametrize("model,image", [("resnet50", 64),
                                         ("googlenet", 64)])
def test_wpack2_engine_bitexact(model, image):
    g = get_model(model, batch=2, image=image, classes=10)
    params = init_params(g, seed=0)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(0),
                                           g.inputs["image"].shape)}]
    art, _, _ = transform_model(g, params, batches,
                                qspec=QuantSpec(weight_bits=8))
    x = batches[0]["image"]
    y_off = np.asarray(Engine(art.graph, art.params,
                              phase_stem=False)(image=x))
    eng = Engine(art.graph, art.params, phase_stem=True)
    assert any(n.attrs.get("wfmt") == "wpack2" for n in eng.graph.nodes), \
        "stem did not pack"
    y_on = np.asarray(eng(image=x))
    np.testing.assert_array_equal(y_on, y_off)


def test_wpack2_valid_padding_odd_ow():
    """SqueezeNet v1.1-style stem: 3x3/s2 VALID, OW=31 (odd) — the pair
    packing has no OW divisibility requirement."""
    g = get_model("squeezenet_v1_1", batch=2, image=64, classes=10)
    params = init_params(g, seed=0)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(1),
                                           g.inputs["image"].shape)}]
    art, _, _ = transform_model(g, params, batches,
                                qspec=QuantSpec(weight_bits=8))
    x = batches[0]["image"]
    y_off = np.asarray(Engine(art.graph, art.params,
                              phase_stem=False)(image=x))
    eng = Engine(art.graph, art.params, phase_stem=True)
    y_on = np.asarray(eng(image=x))
    np.testing.assert_array_equal(y_on, y_off)


def test_fire_expand_merge_bitexact():
    """SqueezeNet fire expand pair (1x1 + 3x3 on the squeeze output):
    the mixed-kernel sibling merge (1x1 zero-padded into the 3x3 bank)
    must be bit-exact and fire only at h >= 20 (measured loss below)."""
    g = get_model("squeezenet_v1_1", batch=2, image=160, classes=10)
    params = init_params(g, seed=0)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(2),
                                           g.inputs["image"].shape)}]
    art, _, _ = transform_model(g, params, batches,
                                qspec=QuantSpec(weight_bits=8))
    x = batches[0]["image"]
    off = Engine(art.graph, art.params, merge_1x1=False)
    on = Engine(art.graph, art.params, merge_1x1=True)
    merged = [n for n in on.graph.nodes if n.name.endswith("__m1x1")]
    assert merged, "no fire pairs merged"
    assert all(n.attrs["kshape"][0] == 3 for n in merged)
    np.testing.assert_array_equal(np.asarray(on(image=x)),
                                  np.asarray(off(image=x)))


def test_googlenet_sibling_merge_bitexact():
    """Inception-head 1x1 trio merge on/off parity (engine level)."""
    g = get_model("googlenet", batch=2, image=64, classes=10)
    params = init_params(g, seed=0)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(3),
                                           g.inputs["image"].shape)}]
    art, _, _ = transform_model(g, params, batches,
                                qspec=QuantSpec(weight_bits=8))
    x = batches[0]["image"]
    off = Engine(art.graph, art.params, merge_1x1=False)
    on = Engine(art.graph, art.params, merge_1x1=True)
    assert any(n.name.endswith("__m1x1") for n in on.graph.nodes)
    np.testing.assert_array_equal(np.asarray(on(image=x)),
                                  np.asarray(off(image=x)))


def test_pruned_graph_engine_passes_bitexact():
    """Channel-pruned graphs (irregular couts) through the full engine
    pass chain (wpack2 + merges) must stay bit-exact vs the plain
    executor."""
    from tf2_tpu.transform import PruneSpec
    g = get_model("googlenet", batch=2, image=64, classes=10)
    params = init_params(g, seed=0)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(4),
                                           g.inputs["image"].shape)}]
    art, _, _ = transform_model(g, params, batches,
                                qspec=QuantSpec(weight_bits=8),
                                pspec=PruneSpec(fraction=0.3))
    x = batches[0]["image"]
    from tf2_tpu.graph import execute
    y_plain = np.asarray(jax.jit(execute(art.graph))(
        {k: jnp.asarray(v) for k, v in art.params.items()}, image=x))
    y_eng = np.asarray(Engine(art.graph, art.params)(image=x))
    np.testing.assert_array_equal(y_eng, y_plain)
