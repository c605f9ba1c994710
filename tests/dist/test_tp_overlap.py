"""Ring-overlapped TP matmul parity vs GSPMD and dense (SURVEY.md §8
hard-part 5), plus the tightened per-node TP parity gate (VERDICT r2
item 9: <=1 quantum on >=99% of elements, per-node localization)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_tpu.parallel import make_mesh
from tf2_tpu.parallel.tp_overlap import allgather_matmul, gspmd_matmul


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_ring_allgather_matmul_parity(tp):
    cfg = make_mesh(tp=tp)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    m, k, n = 32, 128, 64
    y = jax.random.normal(k1, (m, k), jnp.float32)
    w = jax.random.normal(k2, (k, n), jnp.float32)
    y_sh = jax.device_put(y, cfg.named(None, cfg.tp_axis))
    dense = np.asarray(jnp.dot(y, w))
    ring = np.asarray(allgather_matmul(cfg, y_sh, w))
    gspmd = np.asarray(gspmd_matmul(cfg, y_sh, w))
    np.testing.assert_allclose(ring, dense, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(gspmd, dense, rtol=1e-5, atol=1e-4)


def test_ring_allgather_matmul_int8():
    """Int8 operands with int32 accumulation — the quantized TP case."""
    cfg = make_mesh(tp=4)
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randint(-100, 100, (16, 64)), jnp.int8)
    w = jnp.asarray(rng.randint(-100, 100, (64, 32)), jnp.int8)
    y_sh = jax.device_put(y, cfg.named(None, cfg.tp_axis))
    dense = np.asarray(jnp.dot(y.astype(jnp.int32), w.astype(jnp.int32)))
    ring = np.asarray(allgather_matmul(cfg, y_sh, w, acc_dtype=jnp.int32))
    np.testing.assert_array_equal(ring, dense)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_per_node_parity_tight(tp):
    """Every quantized node, teacher-forced on identical inputs, must match
    the replicated execution within 1 int8 quantum on >=99% of elements
    under TP sharding; failures localize to the node."""
    from tests.dist.test_mesh import _quant_model
    from tf2_tpu.utils.debug import compare_shardings

    art = _quant_model(batch=8)
    cfg = make_mesh(tp=tp)
    x = jax.random.normal(jax.random.PRNGKey(3),
                          art.graph.inputs["image"].shape)
    findings = compare_shardings(art.graph, art.params, cfg,
                                 atol_quanta=1, min_exact=0.99, image=x)
    assert findings == [], (
        "TP divergence beyond 1 quantum / 99%-exact, first offenders: "
        f"{findings[:3]}")
