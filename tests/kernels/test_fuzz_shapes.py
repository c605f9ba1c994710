"""Boundary-shape fuzzing for the Pallas kernels (SURVEY.md §6.2's
promised sanitizer pass; VERDICT r2 coverage A2).

Seeded random shapes stress the raggedness handling: non-multiple-of-8
rows, non-multiple-of-128 channels, minimal spatial extents, stride-2 odd
sizes. Every case runs interpret-mode against the jnp reference and must
be bit-exact or cleanly unsupported (None) — never wrong, never crashed.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from jax import lax

from tf2_tpu.kernels import qconv, shift_matmul
from tf2_tpu.transform import potq


def _ref_conv(x_q, w_q, es, eb, strides, padding, relu):
    acc = lax.conv_general_dilated(
        x_q.astype(jnp.int32), w_q.astype(jnp.int32), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es + eb
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _cases(seed, n):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        k = int(rng.choice([1, 2, 3, 5, 7]))
        s = int(rng.choice([1, 2]))
        h = int(rng.randint(max(k, s), 23))
        b = int(rng.choice([1, 2, 3]))
        cin = int(rng.choice([2, 3, 8, 17, 64, 96, 130]))
        cout = int(rng.choice([1, 5, 16, 96, 128, 200]))
        padding = str(rng.choice(["SAME", "VALID"]))
        relu = bool(rng.randint(2))
        yield b, h, k, s, cin, cout, padding, relu


@pytest.mark.parametrize("case", list(_cases(seed=11, n=25)),
                         ids=lambda c: f"b{c[0]}h{c[1]}k{c[2]}s{c[3]}"
                                       f"ci{c[4]}co{c[5]}{c[6][0]}{int(c[7])}")
def test_qconv_fuzz_int8(case):
    b, h, k, s, cin, cout, padding, relu = case
    rng = np.random.RandomState(hash(case) % (2**31))
    x_q = jnp.asarray(rng.randint(-127, 128, (b, h, h, cin)), jnp.int8)
    w_q = jnp.asarray(rng.randint(-127, 128, (k, k, cin, cout)), jnp.int8)
    es = jnp.asarray(rng.uniform(1e-4, 1e-3, cout), jnp.float32)
    eb = jnp.asarray(rng.randn(cout), jnp.float32)
    out = qconv.fused_qconv2d(x_q, w_q, es, eb, strides=(s, s),
                              padding=padding, groups=1, relu=relu,
                              wfmt="int8", kshape=(k, k, cin, cout),
                              interpret=True)
    if out is None:
        pytest.skip("shape outside kernel coverage (clean refusal)")
    ref = _ref_conv(x_q, w_q, es, eb, (s, s), padding, relu)
    assert out.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("mkn", [(1, 2, 1), (7, 10, 3), (33, 130, 200),
                                 (255, 514, 129), (100, 6, 1000)])
@pytest.mark.parametrize("relu", [False, True])
def test_qmatmul_fuzz_int8(mkn, relu):
    m, k, n = mkn
    rng = np.random.RandomState(m * 1000 + k)
    x_q = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    w_q = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
    es = jnp.asarray(rng.uniform(1e-4, 1e-3, n), jnp.float32)
    eb = jnp.asarray(rng.randn(n), jnp.float32)
    out = shift_matmul.fused_qmatmul(x_q, w_q, es, eb, relu=relu,
                                     wfmt="int8", kshape=(k, n),
                                     interpret=True)
    if out is None:
        pytest.skip("shape outside kernel coverage (clean refusal)")
    acc = jnp.dot(x_q.astype(jnp.int32), w_q.astype(jnp.int32))
    y = acc.astype(jnp.float32) * es[None, :] + eb[None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    ref = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qattention_fuzz():
    """Ragged T/heads sweep for the attention kernel (exactness bar as in
    test_qattention.py: <=1 quantum, >=99.9% exact)."""
    from tf2_tpu.graph.ir import Node
    from tf2_tpu.kernels import dispatch, qattention

    rng = np.random.RandomState(3)
    for t, heads, hd in ((7, 1, 8), (31, 3, 16), (100, 5, 32), (196, 2, 64)):
        dim = heads * hd
        qkv = jnp.asarray(rng.randint(-90, 91, (2, t, 3 * dim)), jnp.int8)
        out = qattention.fused_qattention(qkv, heads=heads, dim=dim,
                                          s_in=0.03, s_out=0.04,
                                          interpret=True)
        if out is None:
            continue
        node = Node("a", "qattention_core", ("q",),
                    attrs={"heads": heads, "dim": dim,
                           "s_in": 0.03, "s_out": 0.04})
        prev = dispatch._USE_PALLAS
        dispatch.set_use_pallas(False)
        try:
            ref = dispatch.qattention_core(node, {}, qkv)
        finally:
            dispatch.set_use_pallas(prev)
        diff = np.abs(np.asarray(out, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1, (t, heads, hd, diff.max())
        assert (diff == 0).mean() >= 0.999


def test_qlrn_fuzz():
    """Ragged (M, C) sweep for the fused LRN kernel vs its banded-conv
    reference (kernels/qlrn.py). Must be <=1 quantum everywhere or a
    clean None refusal — never wrong, never crashed."""
    from tf2_tpu.kernels.qlrn import fused_qlrn, reference_qlrn

    rng = np.random.RandomState(11)
    for shape, radius, beta in (
            ((1, 3, 3, 8), 2, 0.75),       # tiny spatial, tiny C
            ((2, 7, 5, 17), 1, 0.75),      # odd everything
            ((3, 4, 4, 130), 2, 0.75),     # C > 128 lanes
            ((1, 9, 9, 96), 3, 0.5),       # generic-beta pow path
            ((5, 1, 1, 64), 2, 0.75)):     # single pixel rows
        x = jnp.asarray(rng.randint(-127, 128, shape), jnp.int8)
        kw = dict(radius=radius, alpha=3e-4, beta=beta, bias=1.0,
                  s_in=0.041, s_out=0.037)
        out = fused_qlrn(x, interpret=True, **kw)
        if out is None:
            continue  # clean refusal
        ref = reference_qlrn(x, **kw)
        diff = np.abs(np.asarray(out, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1, (shape, diff.max())
        assert (diff == 0).mean() >= 0.995, (shape, (diff == 0).mean())
