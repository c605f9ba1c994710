"""Fused int8 LRN kernel parity (kernels/qlrn.py) + the load-time
dequantize->lrn->quantize fusion pass (graph/optimize.fuse_lrn_quantize)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_tpu.graph import execute
from tf2_tpu.graph.ir import Graph, GraphBuilder, Node
from tf2_tpu.graph.optimize import fuse_lrn_quantize
from tf2_tpu.kernels.qlrn import fused_qlrn, reference_qlrn


@pytest.mark.parametrize("shape,radius,beta", [
    ((2, 8, 8, 64), 2, 0.75),
    ((2, 16, 16, 192), 2, 0.75),
    ((2, 8, 8, 96), 1, 0.5),     # generic-beta pow path
])
def test_qlrn_kernel_matches_reference(shape, radius, beta):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, shape, dtype=np.int8))
    kw = dict(radius=radius, alpha=2e-4, beta=beta, bias=1.0,
              s_in=0.0312, s_out=0.0279)
    ref = np.asarray(reference_qlrn(x, **kw))
    got = fused_qlrn(x, interpret=True, **kw)
    assert got is not None
    got = np.asarray(got)
    diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
    # same op sequence; interpret-mode float assoc can flip round() at
    # representation boundaries on isolated elements
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_qlrn_refuses_degenerate_block():
    """Odd M degrades the block fallback toward 1-row blocks; the kernel
    must refuse (ADVICE r4) so dispatch takes the reference path."""
    x = jnp.zeros((1, 14, 14, 192), jnp.int8)  # m=196 -> blk=4
    got = fused_qlrn(x, interpret=True, radius=2, alpha=2e-4, beta=0.75,
                     bias=1.0, s_in=0.03, s_out=0.03)
    assert got is None


def test_qlrn_vs_unfused_executor_chain():
    """qlrn must match the dequantize->lrn->quantize executor chain (which
    uses the banded-conv window) within one quantum."""
    b = GraphBuilder("m")
    x = b.input("x", (2, 8, 8, 64), "int8")
    d = b.raw("dequantize", [x], name="dq", scale=0.05)
    l = b.lrn(d, radius=2, alpha=2e-4, beta=0.75, bias=1.0, name="l")
    q = b.raw("quantize", [l], name="q", scale=0.04)
    g = b.build(q)
    rng = np.random.default_rng(1)
    xv = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 64), dtype=np.int8))
    ref = np.asarray(execute(g)({}, x=xv))

    fg, _ = fuse_lrn_quantize(g, {})
    assert [n.op for n in fg.nodes] == ["qlrn"]
    node = fg.nodes[0]
    assert node.attrs["s_in"] == pytest.approx(0.05)
    assert node.attrs["s_out"] == pytest.approx(0.04)
    got = np.asarray(execute(fg)({}, x=xv))
    diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.995


def test_fuse_lrn_commutes_through_maxpool():
    """dq -> lrn -> maxpool -> quantize == qlrn -> maxpool(int8): max and
    quantize are both monotone, so the rewrite is exact."""
    b = GraphBuilder("m")
    x = b.input("x", (2, 8, 8, 64), "int8")
    d = b.raw("dequantize", [x], name="dq", scale=0.05)
    l = b.lrn(d, radius=2, alpha=2e-4, name="l")
    p = b.maxpool(l, 2, 2, name="mp")
    q = b.raw("quantize", [p], name="q", scale=0.04)
    g = b.build(q)
    rng = np.random.default_rng(2)
    xv = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 64), dtype=np.int8))
    ref = np.asarray(execute(g)({}, x=xv))
    fg, _ = fuse_lrn_quantize(g, {})
    assert [n.op for n in fg.nodes] == ["qlrn", "maxpool"]
    got = np.asarray(execute(fg)({}, x=xv))
    diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.995
    assert got.shape == ref.shape


def test_fuse_lrn_skips_multi_consumer_and_outputs():
    # lrn output consumed twice -> no fusion
    b = GraphBuilder("m")
    x = b.input("x", (1, 4, 4, 32), "int8")
    d = b.raw("dequantize", [x], name="dq", scale=0.05)
    l = b.lrn(d, name="l")
    q = b.raw("quantize", [l], name="q", scale=0.04)
    s = b.raw("identity", [l], name="keep")
    g = b.build([q, s])
    fg, _ = fuse_lrn_quantize(g, {})
    assert sorted(n.op for n in fg.nodes) == sorted(
        n.op for n in g.nodes), "must not fuse when lrn has 2 consumers"
