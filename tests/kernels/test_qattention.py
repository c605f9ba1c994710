"""Fused INT8 attention kernel parity — interpret mode on CPU vs the jnp
reference path in kernels/dispatch.qattention_core (SURVEY.md §5.1; the
two paths must be element-exact so ViT accuracy numbers transfer across
routing decisions)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_tpu.graph.ir import Node
from tf2_tpu.kernels import dispatch, qattention


def _ref_attn(qkv_q, heads, dim, s_in, s_out):
    node = Node("attn", "qattention_core", ("qkv",),
                attrs={"heads": heads, "dim": dim,
                       "s_in": s_in, "s_out": s_out})
    prev = dispatch._USE_PALLAS
    dispatch.set_use_pallas(False)  # force the jnp reference path
    try:
        return dispatch.qattention_core(node, {}, qkv_q)
    finally:
        dispatch.set_use_pallas(prev)


@pytest.mark.parametrize("n,t,heads,dim", [
    (1, 196, 12, 768),   # ViT-B/16: T not a multiple of 8 (mask path)
    (2, 64, 4, 128),     # small aligned
    (3, 50, 2, 64),      # ragged T and batch
])
def test_qattention_parity(n, t, heads, dim):
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randint(-100, 101, (n, t, 3 * dim)), jnp.int8)
    s_in, s_out = 0.02, 0.05
    ref = _ref_attn(qkv, heads, dim, s_in, s_out)
    out = qattention.fused_qattention(qkv, heads=heads, dim=dim,
                                      s_in=s_in, s_out=s_out, interpret=True)
    assert out is not None
    assert out.shape == (n, t, dim) and out.dtype == jnp.int8
    # softmax reassociation across backends can flip a borderline 0.5 LSB
    # rounding; require exactness on >=99.9% of elements and <=1 quantum
    # everywhere (same bar as the TP parity gate)
    a, b = np.asarray(out, np.int32), np.asarray(ref, np.int32)
    diff = np.abs(a - b)
    assert diff.max() <= 1, f"max diff {diff.max()} quanta"
    assert (diff == 0).mean() >= 0.999, f"exact rate {(diff == 0).mean():.5f}"


def test_qattention_rejects_unsupported():
    qkv = jnp.zeros((1, 8, 3 * 96), jnp.int8)
    assert qattention.fused_qattention(qkv, heads=5, dim=96,
                                       s_in=0.1, s_out=0.1) is None  # 96%5
    assert qattention.fused_qattention(jnp.zeros((1, 8, 95), jnp.int8),
                                       heads=1, dim=32,
                                       s_in=0.1, s_out=0.1) is None
