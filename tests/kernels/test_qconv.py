"""General fused conv kernel tests (interpret mode, SURVEY.md §5.1).

Covers the full shape matrix the kernel claims (VERDICT r1 item 1): 1x1 and
KxK, stride 1 AND 2, SAME / VALID / explicit padding, even kernels (s2d
stems), ragged channel counts, the 7x7 stride-2 stem, pot4 and int8
weights. Every case must be BIT-exact vs the lax int32 reference.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tf2_tpu.kernels import qconv
from tf2_tpu.transform import potq


def _ref_qconv(x_q, w_q, es, eb, relu, strides, padding):
    acc = lax.conv_general_dilated(
        x_q.astype(jnp.int32), w_q.astype(jnp.int32), strides,
        padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es + eb
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _mk(b, h, w, cin, cout, kh, kw, wfmt="pot4", seed=0):
    rng = np.random.RandomState(seed)
    x_q = jnp.asarray(rng.randint(-127, 128, (b, h, w, cin)), jnp.int8)
    if wfmt == "pot4":
        wt = rng.randn(kh * kw * cin, cout).astype(np.float32) * 0.05
        q, _ = potq.fit_pot(wt, n_candidates=3)
        wparam = jnp.asarray(potq.pack_codes(potq.pot_encode_from_int8(q)))
        whwio = jnp.asarray(q).reshape(kh, kw, cin, cout)
    else:
        whwio = jnp.asarray(rng.randint(-30, 31, (kh, kw, cin, cout)),
                            jnp.int8)
        wparam = whwio
    es = jnp.asarray(rng.uniform(1e-4, 1e-3, cout), jnp.float32)
    eb = jnp.asarray(rng.randn(cout), jnp.float32)
    return x_q, whwio, wparam, es, eb


@pytest.mark.parametrize("b,h,w,cin,cout,kh,stride,padding,wfmt", [
    (2, 14, 14, 64, 96, 1, 1, "SAME", "pot4"),    # 1x1 GEMM
    (2, 14, 14, 64, 96, 1, 2, "SAME", "pot4"),    # 1x1 downsample shortcut
    (2, 15, 15, 32, 64, 3, 1, "SAME", "pot4"),    # 3x3 odd extent
    (2, 14, 14, 32, 64, 3, 2, "SAME", "pot4"),    # 3x3 stride-2 transition
    (1, 28, 28, 3, 64, 7, 2, "SAME", "int8"),     # the ResNet stem
    (2, 16, 16, 12, 64, 4, 1, "VALID", "int8"),   # s2d-rewritten stem
    (2, 9, 9, 130, 40, 3, 1, "SAME", "pot4"),     # ragged cin/cout
    (2, 13, 13, 24, 32, 3, 2, "VALID", "int8"),   # strided VALID
    (2, 12, 12, 144, 48, 3, 1, "SAME", "pot4"),   # cin > 128 tap path
])
@pytest.mark.parametrize("relu", [False, True])
def test_qconv_parity(b, h, w, cin, cout, kh, stride, padding, wfmt, relu):
    x_q, whwio, wparam, es, eb = _mk(b, h, w, cin, cout, kh, kh, wfmt)
    ref = _ref_qconv(x_q, whwio, es, eb, relu, (stride, stride), padding)
    out = qconv.fused_qconv2d(
        x_q, wparam if wfmt == "pot4" else whwio, es, eb,
        strides=(stride, stride), padding=padding, groups=1,
        relu=relu, wfmt=wfmt, kshape=(kh, kh, cin, cout), interpret=True)
    assert out is not None, "shape unexpectedly not covered"
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_explicit_padding():
    x_q, whwio, wparam, es, eb = _mk(2, 14, 14, 64, 64, 5, 5)
    pad = [(2, 2), (2, 2)]
    ref = _ref_qconv(x_q, whwio, es, eb, True, (1, 1), pad)
    out = qconv.fused_qconv2d(x_q, wparam, es, eb, strides=(1, 1),
                              padding=pad, groups=1, relu=True, wfmt="pot4",
                              kshape=(5, 5, 64, 64), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_grouped_falls_back():
    x_q, _, wparam, es, eb = _mk(1, 8, 8, 16, 32, 3, 3)
    assert qconv.fused_qconv2d(
        x_q, wparam, es, eb, strides=(1, 1), padding="SAME", groups=2,
        relu=True, wfmt="pot4", kshape=(3, 3, 8, 32), interpret=True) is None


def test_covers_predicate():
    # everything in the ResNet-50 zoo is covered, including strides
    assert qconv.covers((1, 1, 256, 512), (2, 2), "SAME", 1, (64, 56, 56, 256))
    assert qconv.covers((7, 7, 3, 64), (2, 2), "SAME", 1, (64, 224, 224, 3))
    assert qconv.covers((3, 3, 64, 64), (1, 1), "SAME", 1, (64, 56, 56, 64))
    # grouped convs are not
    assert not qconv.covers((3, 3, 32, 64), (1, 1), "SAME", 2,
                            (8, 28, 28, 64))
    # stride > 2 is not
    assert not qconv.covers((3, 3, 64, 64), (4, 4), "SAME", 1,
                            (8, 56, 56, 64))


def test_bf16_stem_exact():
    """The dispatch bf16 stem path (qconv2d, cin<=4) must equal the int32
    path bit-for-bit: int8 magnitudes are exact in bf16, products
    accumulate in f32, and worst-case |acc| = K*127^2 < 2^24. Exercised
    with adversarial +-127 values, not just random data."""
    from tf2_tpu.graph.ir import Node
    from tf2_tpu.kernels import dispatch

    rng = np.random.default_rng(7)
    x = rng.integers(-127, 128, (2, 32, 32, 3), dtype=np.int8)
    x[0, :4, :4] = 127
    x[1, :4, :4] = -127
    w = rng.integers(-127, 128, (7, 7, 3, 16), dtype=np.int8)
    w[:2, :2] = 127
    es = rng.uniform(1e-4, 1e-2, 16).astype(np.float32)
    eb = rng.normal(size=16).astype(np.float32)
    node = Node("stem", "qconv2d", ("x",), ("w", "es", "eb"),
                {"kshape": [7, 7, 3, 16], "strides": [2, 2],
                 "padding": "SAME", "relu": True, "wfmt": "int8"})
    params = {"w": jnp.asarray(w), "es": jnp.asarray(es),
              "eb": jnp.asarray(eb)}
    prev = dispatch._STEM_BF16
    try:
        dispatch.set_stem_bf16(False)
        y_int = np.asarray(dispatch.qconv2d(node, params, jnp.asarray(x)))
        dispatch.set_stem_bf16(True)
        y_bf16 = np.asarray(dispatch.qconv2d(node, params, jnp.asarray(x)))
    finally:
        dispatch.set_stem_bf16(prev)
    np.testing.assert_array_equal(y_int, y_bf16)
