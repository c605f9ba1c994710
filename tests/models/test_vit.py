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
