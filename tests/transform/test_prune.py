"""Physical channel pruning tests (SURVEY.md §3 R1; VERDICT r1 item 5)."""
import numpy as np
import pytest

from tf2_tpu.graph import init_params
from tf2_tpu.graph.execute import execute
from tf2_tpu.graph.shapes import activation_shapes
from tf2_tpu.models import get_model
from tf2_tpu.transform.prune import (PruneSpec, prune_channels,
                                     prune_params)


def _param_bytes(params) -> int:
    return sum(np.asarray(v).nbytes for v in params.values())


def _fwd(graph, params, x):
    import jax
    fn = jax.jit(execute(graph))
    return np.asarray(fn({k: np.asarray(v) for k, v in params.items()},
                         image=x))


@pytest.fixture(scope="module")
def tiny_resnet():
    g = get_model("resnet50", batch=2, image=32, depths=(1, 1, 1, 1),
                  classes=10)
    params = init_params(g, seed=3)
    return g, params


def test_zero_fraction_is_identity(tiny_resnet):
    g, params = tiny_resnet
    g2, p2, report = prune_channels(g, params, PruneSpec(fraction=0.0))
    assert report == {}
    assert _param_bytes(p2) == _param_bytes(params)
    x = np.random.default_rng(0).standard_normal(
        g.inputs["image"].shape).astype(np.float32)
    np.testing.assert_allclose(_fwd(g, params, x), _fwd(g2, p2, x))


def test_physical_prune_shrinks(tiny_resnet):
    g, params = tiny_resnet
    spec = PruneSpec(fraction=0.25)
    g2, p2, report = prune_channels(g, params, spec)
    assert report, "no layer was pruned"
    # the artifact physically shrinks (VERDICT r1: masked pruning left the
    # size unchanged — hollow compression)
    assert _param_bytes(p2) < 0.97 * _param_bytes(params)
    # shapes stay consistent end-to-end
    shapes = activation_shapes(g2, p2)
    assert shapes  # inference succeeded


def test_physical_prune_matches_mask_no_bn():
    """On a BN-free net (SqueezeNet: conv+bias+relu), a zeroed channel
    contributes exact zeros downstream, so physical removal must reproduce
    the masked net's outputs (up to fp reassociation)."""
    g = get_model("squeezenet_v1_1", batch=2, image=64, classes=10)
    params = init_params(g, seed=5)
    spec = PruneSpec(fraction=0.25)
    g2, p2, report = prune_channels(g, params, spec)
    assert report, "no squeeze layer was pruned"
    masked, mreport = prune_params(g, params, spec, only=set(report))
    assert set(report) == set(mreport)
    x = np.random.default_rng(1).standard_normal(
        g.inputs["image"].shape).astype(np.float32)
    y_pruned = _fwd(g2, p2, x)
    y_masked = _fwd(g, masked, x)
    np.testing.assert_allclose(y_pruned, y_masked, rtol=1e-4, atol=1e-4)


def test_add_fed_values_not_pruned(tiny_resnet):
    g, params = tiny_resnet
    g2, p2, report = prune_channels(g, params, PruneSpec(fraction=0.25))
    cons = g.consumers()
    for name in report:
        # closure of a pruned value must not contain add/concat consumers
        frontier, seen = [name], set()
        while frontier:
            v = frontier.pop()
            if v in seen:
                continue
            seen.add(v)
            for n in cons.get(v, []):
                assert n.op not in ("add", "concat"), (
                    f"pruned value {name} reaches join op {n.op}")
                if n.op not in ("conv2d", "dense"):
                    frontier.append(n.name)


def test_pruned_graph_quantizes_and_runs(tiny_resnet):
    g, params = tiny_resnet
    from tf2_tpu.transform import QuantSpec
    from tf2_tpu.transform.pipeline import transform_model
    rng = np.random.default_rng(2)
    batches = [{"image": rng.standard_normal(
        g.inputs["image"].shape).astype(np.float32)} for _ in range(2)]
    art, fg, fp = transform_model(
        g, params, batches, qspec=QuantSpec(weight_bits=4, pot_candidates=3),
        pspec=PruneSpec(fraction=0.25))
    import jax
    fn = jax.jit(execute(art.graph))
    y = np.asarray(fn(art.params, image=batches[0]["image"]))
    assert y.shape == (2, 10)
    assert np.isfinite(y).all()
