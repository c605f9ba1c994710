"""Debug-utility tests (SURVEY.md §6.2)."""
import jax
import jax.numpy as jnp
import numpy as np

from tf2_tpu.graph import execute, init_params
from tf2_tpu.models import get_model
from tf2_tpu.utils.debug import check_finite, compare_backends


def test_check_finite_clean():
    g = get_model("squeezenet_v1_1", batch=1, image=32, classes=10)
    params = init_params(g)
    x = jnp.ones(g.inputs["image"].shape, jnp.float32)
    assert check_finite(g, params, image=x) is None


def test_check_finite_localizes_nan():
    g = get_model("squeezenet_v1_1", batch=1, image=32, classes=10)
    params = init_params(g)
    bad = dict(params)
    bad["fire5_squeeze.w"] = np.asarray(params["fire5_squeeze.w"]) * np.nan
    x = jnp.ones(g.inputs["image"].shape, jnp.float32)
    first = check_finite(g, bad, image=x)
    assert first is not None
    # must localize at (or after) the poisoned layer, not before
    names = [n.name for n in g.nodes]
    assert names.index(first) >= names.index("fire5_squeeze")


def test_compare_backends_identical_on_cpu():
    """On CPU both dispatch paths are the same jnp reference — zero diff."""
    from tf2_tpu.transform import transform_model, QuantSpec
    g = get_model("squeezenet_v1_1", batch=1, image=32, classes=10)
    params = init_params(g)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(0),
                                           g.inputs["image"].shape)}]
    art, _, _ = transform_model(g, params, batches, qspec=QuantSpec())
    findings = compare_backends(art.graph, art.params, image=batches[0]["image"])
    assert findings == []


def test_checked_execute_catches_nan():
    """checkify surfaces an in-graph NaN as a structured error."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from tf2_tpu.graph import init_params
    from tf2_tpu.models import get_model
    from tf2_tpu.utils.debug import checked_execute

    g = get_model("squeezenet_v1_1", batch=1, image=32, classes=10)
    params = init_params(g, seed=0)
    fn = checked_execute(g)
    # clean input passes
    out = fn(params, image=jnp.ones(g.inputs["image"].shape))
    assert out.shape == (1, 10)
    # poisoned weights -> NaN inside the jitted graph -> raised, not silent
    bad = dict(params)
    bad["conv1.w"] = np.asarray(params["conv1.w"]) * np.nan
    with pytest.raises(Exception, match="nan"):
        fn(bad, image=jnp.ones(g.inputs["image"].shape))
