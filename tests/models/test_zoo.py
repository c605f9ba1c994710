"""Model-zoo smoke tests: graphs validate, execute, and produce the right
output shapes with finite values."""
import jax
import jax.numpy as jnp
import pytest

from tf2_tpu.graph import execute, init_params
from tf2_tpu.models import get_model, list_models

CLS_MODELS = ["squeezenet_v1_1", "resnet50", "googlenet"]


@pytest.mark.parametrize("name", CLS_MODELS)
def test_forward_shape(name):
    g = get_model(name, batch=2, image=64, classes=10)
    g.validate()
    params = init_params(g, seed=0)
    fn = jax.jit(execute(g))
    out = fn(params, image=jnp.ones(g.inputs["image"].shape, jnp.float32))
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_registry_contents():
    have = list_models()
    for m in CLS_MODELS:
        assert m in have


def test_serialization_roundtrip():
    from tf2_tpu.graph import Graph
    g = get_model("squeezenet_v1_1", batch=1, image=64, classes=10)
    g2 = Graph.from_json(g.to_json())
    assert [n.name for n in g2.nodes] == [n.name for n in g.nodes]
    assert g2.params == g.params
    # same numerics through the executor
    params = init_params(g, seed=1)
    x = jax.random.normal(jax.random.PRNGKey(0), g.inputs["image"].shape)
    a = execute(g)(params, image=x)
    b = execute(g2)(params, image=x)
    assert jnp.allclose(a, b)


def test_intermediates_tap():
    g = get_model("squeezenet_v1_1", batch=1, image=64, classes=10)
    params = init_params(g)
    x = jnp.ones(g.inputs["image"].shape, jnp.float32)
    out, env = execute(g, intermediates=True)(params, image=x)
    assert "conv1" in env and env["conv1"].ndim == 4


def test_with_batch_size_rewrites_reshapes():
    """SSD/ViT reshape nodes carry static batch dims; with_batch_size must
    rewrite them (regression: batch-resized SSD crashed at execute)."""
    import jax.numpy as jnp
    from tf2_tpu.graph import execute, init_params
    from tf2_tpu.models import get_model
    from tf2_tpu.models.ssd import init_priors

    g = get_model("ssd", batch=2, image=128, classes=6).with_batch_size(3)
    p = init_params(g)
    p.update(init_priors(g))
    out = execute(g)(p, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape[0] == 3

    g = get_model("vit_b16", batch=1, image=32, dim=64, depth=1, heads=2,
                  patch=16).with_batch_size(2)
    out = execute(g)(init_params(g), image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (2, 1000)
