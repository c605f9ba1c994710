"""space_to_depth_stem rewrite: exact parity in both placement domains.

The pass rewrites the 7x7/s2 stem into pad + space_to_depth + 4x4/s1
VALID conv (graph/optimize.py). Taps are only reordered and zero-padded —
int32 accumulation is exact, so outputs must be bit-identical, not merely
close. Two placements are covered:
- f32 domain (stem input produced by a single-consumer quantize node —
  the rearrange is hoisted before the quantize);
- int8 domain fallback (quantize output has another consumer).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf2_tpu.graph import execute, init_params
from tf2_tpu.graph.ir import Graph, Node
from tf2_tpu.graph.optimize import space_to_depth_stem
from tf2_tpu.models import get_model
from tf2_tpu.transform import QuantSpec, fold_batch_norm, quantize_graph


def _quantized_resnet(batch=2, image=32):
    g = get_model("resnet50", batch=batch, image=image, classes=10,
                  depths=(1, 1, 1, 1))
    params = init_params(g, seed=0)
    fg, fp = fold_batch_norm(g, params)
    scales = {k: 0.02 for k in fg.inputs}
    scales.update({n.name: 0.02 for n in fg.nodes})
    art = quantize_graph(fg, fp, scales, QuantSpec(weight_bits=4,
                                                   pot_candidates=5))
    return art.graph, art.params


def _predecoded(graph, params):
    from tf2_tpu.runtime.engine import _predecode_fallback_weights
    return _predecode_fallback_weights(graph, params)


def test_s2d_stem_f32_domain_exact():
    graph, params = _quantized_resnet()
    g0, p0 = _predecoded(graph, params)
    g1, p1 = space_to_depth_stem(g0, p0)
    names = [n.name for n in g1.nodes]
    # f32 placement: the pad node must feed the quantize node, i.e. appear
    # before it, and the quantize node consumes the s2d output
    quant = next(n for n in g1.nodes if n.op == "quantize")
    assert quant.inputs[0].endswith("__s2d")
    stem = next(n for n in g1.nodes if n.op == "qconv2d")
    assert stem.attrs["padding"] == "VALID"
    assert stem.attrs["kshape"][:2] == [4, 4] or stem.attrs["kshape"][:2] == (4, 4)

    x = jax.random.normal(jax.random.PRNGKey(1), g1.inputs["image"].shape,
                          jnp.float32)
    y0 = np.asarray(execute(g0)(
        {k: jnp.asarray(v) for k, v in p0.items()}, image=x))
    y1 = np.asarray(execute(g1)(
        {k: jnp.asarray(v) for k, v in p1.items()}, image=x))
    np.testing.assert_array_equal(y0, y1)


def test_s2d_stem_int8_domain_exact():
    graph, params = _quantized_resnet()
    g0, p0 = _predecoded(graph, params)
    # force the int8-domain fallback: give the quantize output a second
    # consumer so the hoist is illegal
    quant = next(n for n in g0.nodes if n.op == "quantize")
    nodes = list(g0.nodes) + [Node("qtap", "identity", (quant.name,), (), {})]
    g0b = Graph(g0.name, dict(g0.inputs), tuple(g0.outputs) + ("qtap",),
                nodes, dict(g0.params), dict(g0.meta))
    g0b.validate()
    g1, p1 = space_to_depth_stem(g0b, p0)
    quant1 = next(n for n in g1.nodes if n.op == "quantize")
    assert not quant1.inputs[0].endswith("__s2d")  # fallback placement
    stem = next(n for n in g1.nodes if n.op == "qconv2d")
    assert list(stem.inputs)[0].endswith("__s2d")

    x = jax.random.normal(jax.random.PRNGKey(2), g1.inputs["image"].shape,
                          jnp.float32)
    y0 = execute(g0b)({k: jnp.asarray(v) for k, v in p0.items()}, image=x)
    y1 = execute(g1)({k: jnp.asarray(v) for k, v in p1.items()}, image=x)
    for a, b in zip(y0, y1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2d_stem_requires_stem_pattern():
    # squeezenet's stem is 3x3/s2 VALID-ish? — whatever it is, the pass must
    # either rewrite exactly-matching stems or leave the graph unchanged;
    # it must never produce a graph that fails validation or changes math
    from tf2_tpu.transform import calibrate  # noqa: F401 (import check)
    g = get_model("squeezenet_v1_1", batch=1, image=32, classes=10)
    params = init_params(g, seed=0)
    fg, fp = fold_batch_norm(g, params)
    scales = {k: 0.02 for k in fg.inputs}
    scales.update({n.name: 0.02 for n in fg.nodes})
    art = quantize_graph(fg, fp, scales, QuantSpec(weight_bits=8))
    g0, p0 = _predecoded(art.graph, art.params)
    g1, p1 = space_to_depth_stem(g0, p0)
    g1.validate()
    x = jax.random.normal(jax.random.PRNGKey(3), g1.inputs["image"].shape,
                          jnp.float32)
    y0 = np.asarray(execute(g0)(
        {k: jnp.asarray(v) for k, v in p0.items()}, image=x))
    y1 = np.asarray(execute(g1)(
        {k: jnp.asarray(v) for k, v in p1.items()}, image=x))
    np.testing.assert_array_equal(y0, y1)


def test_fuse_stem_quantize_exact():
    """Deleting the input quantize node and stamping s_in on the stem must
    be bit-exact in both dispatch paths (int8 and forced-bf16)."""
    from tf2_tpu.graph.optimize import fuse_stem_quantize
    from tf2_tpu.kernels import dispatch

    graph, params = _quantized_resnet()
    g0, p0 = _predecoded(graph, params)
    g1, p1 = fuse_stem_quantize(g0, p0)
    assert not any(n.op == "quantize" and n.inputs[0] in g1.inputs
                   for n in g1.nodes)
    stem = next(n for n in g1.nodes if n.op == "qconv2d")
    assert "s_in" in stem.attrs and stem.inputs[0] in g1.inputs

    x = jax.random.normal(jax.random.PRNGKey(5), g1.inputs["image"].shape,
                          jnp.float32)
    jp0 = {k: jnp.asarray(v) for k, v in p0.items()}
    jp1 = {k: jnp.asarray(v) for k, v in p1.items()}
    y0 = np.asarray(execute(g0)(jp0, image=x))
    prev = dispatch._STEM_BF16
    try:
        for flag in (False, True):
            dispatch.set_stem_bf16(flag)
            y1 = np.asarray(execute(g1)(jp1, image=x))
            np.testing.assert_array_equal(y0, y1)
    finally:
        dispatch.set_stem_bf16(prev)


def test_fuse_stem_quantize_skips_multi_consumer():
    from tf2_tpu.graph.optimize import fuse_stem_quantize

    graph, params = _quantized_resnet()
    g0, p0 = _predecoded(graph, params)
    quant = next(n for n in g0.nodes if n.op == "quantize")
    nodes = list(g0.nodes) + [Node("qtap", "identity", (quant.name,), (), {})]
    g0b = Graph(g0.name, dict(g0.inputs), tuple(g0.outputs) + ("qtap",),
                nodes, dict(g0.params), dict(g0.meta))
    g0b.validate()
    g1, _ = fuse_stem_quantize(g0b, p0)
    assert any(n.op == "quantize" for n in g1.nodes)  # untouched


def test_fuse_bottleneck_chains_exact():
    """The qblockchain rewrite must be bit-exact vs the node-by-node
    executor, and must actually fuse ResNet's stride-1 blocks."""
    from tf2_tpu.graph.optimize import fuse_bottleneck_chains

    graph, params = _quantized_resnet(batch=2, image=64)
    g0, p0 = _predecoded(graph, params)
    g1, p1 = fuse_bottleneck_chains(g0, p0)
    chains = [n for n in g1.nodes if n.op == "qblockchain"]
    assert chains, "no chains fused on a ResNet graph"
    # depths (1,1,1,1): stage-1 block is stride-1 WITH downsample -> one
    # 1-block chain; stages 2-4 first blocks are stride-2 -> not fused
    assert any(b["down"] for c in chains for b in c.attrs["blocks"])
    assert len(g1.nodes) < len(g0.nodes)

    x = jax.random.normal(jax.random.PRNGKey(7), g1.inputs["image"].shape,
                          jnp.float32)
    jp0 = {k: jnp.asarray(v) for k, v in p0.items()}
    jp1 = {k: jnp.asarray(v) for k, v in p1.items()}
    y0 = np.asarray(execute(g0)(jp0, image=x))
    y1 = np.asarray(execute(g1)(jp1, image=x))
    np.testing.assert_array_equal(y0, y1)


def test_fuse_bottleneck_chains_multiblock():
    """depths (2,1,1,1): stage-1 has a down-block + identity block that
    must fuse into ONE 2-block chain."""
    from tf2_tpu.graph.optimize import fuse_bottleneck_chains
    from tf2_tpu.graph import init_params
    from tf2_tpu.models import get_model
    from tf2_tpu.transform import QuantSpec, fold_batch_norm, quantize_graph

    g = get_model("resnet50", batch=1, image=64, classes=10,
                  depths=(2, 1, 1, 1))
    params = init_params(g, seed=0)
    fg, fp = fold_batch_norm(g, params)
    scales = {k: 0.02 for k in fg.inputs}
    scales.update({n.name: 0.02 for n in fg.nodes})
    art = quantize_graph(fg, fp, scales, QuantSpec(weight_bits=4,
                                                   pot_candidates=5))
    g0, p0 = _predecoded(art.graph, art.params)
    g1, p1 = fuse_bottleneck_chains(g0, p0)
    two = [n for n in g1.nodes if n.op == "qblockchain"
           and len(n.attrs["blocks"]) == 2]
    assert two, "stage-1 did not fuse into a single 2-block chain"

    x = jax.random.normal(jax.random.PRNGKey(8), g1.inputs["image"].shape,
                          jnp.float32)
    y0 = np.asarray(execute(g0)(
        {k: jnp.asarray(v) for k, v in p0.items()}, image=x))
    y1 = np.asarray(execute(g1)(
        {k: jnp.asarray(v) for k, v in p1.items()}, image=x))
    np.testing.assert_array_equal(y0, y1)
