"""ViT stretch-config tests: forward + quantized path (BASELINE config #5)."""
import jax
import jax.numpy as jnp
import numpy as np

from tf2_tpu.graph import execute, init_params
from tf2_tpu.models import get_model


def _tiny_vit(batch=2):
    return get_model("vit_b16", batch=batch, image=64, classes=10,
                     dim=64, depth=2, heads=4)


def test_vit_forward():
    g = _tiny_vit()
    params = init_params(g, seed=0)
    out = execute(g)(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_quantized_w8():
    from tf2_tpu.transform import transform_model, QuantSpec
    g = _tiny_vit()
    params = init_params(g, seed=0)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(0),
                                           g.inputs["image"].shape)}]
    art, fg, fp = transform_model(g, params, batches,
                                  qspec=QuantSpec(weight_bits=8))
    ops = {n.op for n in art.graph.nodes}
    assert "qdense" in ops  # MLP matmuls quantized
    x = batches[0]["image"]
    yf = np.asarray(execute(fg)(fp, image=x))
    yq = np.asarray(execute(art.graph)(art.params, image=x))
    err = np.linalg.norm(yq - yf) / (np.linalg.norm(yf) + 1e-12)
    assert err < 0.3, err


def test_vit_quantized_attention_routes_agree():
    """Full quantized ViT: the Pallas attention path (interpret mode) must
    match the jnp reference path through the whole graph (VERDICT r2
    item 6's integration gate, CPU side)."""
    from tf2_tpu.kernels import dispatch
    from tf2_tpu.transform import transform_model, QuantSpec
    from tf2_tpu.utils.debug import interpret_mode

    g = _tiny_vit()
    params = init_params(g, seed=0)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(0),
                                           g.inputs["image"].shape)}]
    art, fg, fp = transform_model(g, params, batches,
                                  qspec=QuantSpec(weight_bits=8))
    assert any(n.op == "qattention_core" for n in art.graph.nodes), \
        "attention core did not quantize"
    x = batches[0]["image"]
    prev = dispatch._USE_PALLAS
    try:
        dispatch.set_use_pallas(False)
        y_ref = np.asarray(execute(art.graph)(art.params, image=x))
        dispatch.set_use_pallas(True)
        with interpret_mode():
            y_pal = np.asarray(execute(art.graph)(art.params, image=x))
    finally:
        dispatch.set_use_pallas(prev)
    # final output is fp32 logits after dequantize; the int8 attention
    # cores are elementwise-identical up to 1-quantum softmax rounding,
    # which propagates to a small fp32 wiggle
    np.testing.assert_allclose(y_pal, y_ref, atol=0.05, rtol=0.05)


def test_vit_cls_variant_forward_and_quantized():
    """vit_b16_cls: the torchvision-parity variant (class token, T+1
    tokens, classification from token 0)."""
    g = get_model("vit_b16_cls", batch=2, image=64, classes=10,
                  dim=64, depth=2, heads=4)
    assert "cls_token" in g.params
    assert g.params["pos_embed"].shape[1] == 17  # 16 patches + cls
    params = init_params(g, seed=0)
    out = execute(g)(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (2, 10)
    from tf2_tpu.transform import transform_model, QuantSpec
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(0),
                                           g.inputs["image"].shape)}]
    art, fg, fp = transform_model(g, params, batches,
                                  qspec=QuantSpec(weight_bits=8))
    # int8-resident through the cls prepend: the token is pre-quantized
    # onto the stream's grid, no fp glue reappears
    ops = {n.op for n in art.graph.nodes}
    assert "layer_norm" not in ops and "gelu" not in ops
    pt = next(n for n in art.graph.nodes if n.op == "prepend_token")
    import numpy as np
    assert art.params[pt.params[0]].dtype == np.int8
    x = batches[0]["image"]
    yf = np.asarray(execute(fg)(fp, image=x))
    yq = np.asarray(execute(art.graph)(art.params, image=x))
    err = np.linalg.norm(yq - yf) / (np.linalg.norm(yf) + 1e-12)
    assert err < 0.3, err


def test_vit_cls_importer_numeric_parity_path():
    """The torchvision importer fills the cls variant completely."""
    from tests.transform.test_importers import _fake_tv_vit_b16_state
    from tf2_tpu.transform import importers
    g = get_model("vit_b16_cls", batch=1, image=224)
    state = _fake_tv_vit_b16_state()
    params = importers.import_torchvision_vit_b16(state, g)
    assert set(params) == set(g.params)
    import numpy as np
    np.testing.assert_allclose(params["cls_token"], state["class_token"])
    np.testing.assert_allclose(params["pos_embed"],
                               state["encoder.pos_embedding"])
