"""Implicit-GEMM KxK conv kernel tests (interpret mode, SURVEY.md §5.1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tf2_tpu.kernels import shift_conv
from tf2_tpu.transform import potq


def _ref_qconv(x_q, w_q, es, eb, relu, stride=1, padding="SAME"):
    acc = lax.conv_general_dilated(
        x_q.astype(jnp.int32), w_q.astype(jnp.int32), (stride, stride),
        padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es + eb
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _mk(b, h, w, cin, cout, kh, kw, seed=0):
    rng = np.random.RandomState(seed)
    x_q = jnp.asarray(rng.randint(-127, 128, (b, h, w, cin)), jnp.int8)
    wt = rng.randn(kh * kw * cin, cout).astype(np.float32) * 0.05
    q, _ = potq.fit_pot(wt, n_candidates=3)
    packed = jnp.asarray(potq.pack_codes(potq.pot_encode_from_int8(q)))
    whwio = jnp.asarray(q).reshape(kh, kw, cin, cout)
    es = jnp.asarray(rng.uniform(1e-4, 1e-3, cout), jnp.float32)
    eb = jnp.asarray(rng.randn(cout), jnp.float32)
    return x_q, whwio, packed, es, eb


@pytest.mark.parametrize("b,h,w,cin,cout,kh", [
    (1, 8, 8, 64, 128, 3),
    (2, 10, 10, 32, 64, 3),
    (1, 8, 8, 16, 256, 5),
])
@pytest.mark.parametrize("relu", [False, True])
def test_qconv_kxk_parity(b, h, w, cin, cout, kh, relu):
    x_q, whwio, packed, es, eb = _mk(b, h, w, cin, cout, kh, kh)
    ref = _ref_qconv(x_q, whwio, es, eb, relu)
    out = shift_conv.fused_qconv2d(
        x_q, packed, es, eb, strides=(1, 1), padding="SAME", groups=1,
        relu=relu, wfmt="pot4", kshape=(kh, kh, cin, cout), interpret=True)
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qconv_int8_weights():
    b, h, w, cin, cout = 1, 6, 6, 32, 128
    rng = np.random.RandomState(1)
    x_q = jnp.asarray(rng.randint(-127, 128, (b, h, w, cin)), jnp.int8)
    wq = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)
    es = jnp.asarray(rng.uniform(1e-4, 1e-3, cout), jnp.float32)
    eb = jnp.zeros((cout,), jnp.float32)
    ref = _ref_qconv(x_q, wq, es, eb, True)
    out = shift_conv.fused_qconv2d(
        x_q, wq.reshape(-1, cout), es, eb, strides=(1, 1), padding="SAME",
        groups=1, relu=True, wfmt="int8", kshape=(3, 3, cin, cout),
        interpret=True)
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_unsupported_shapes_fall_back():
    x_q, whwio, packed, es, eb = _mk(1, 8, 8, 16, 32, 3, 3)
    # stride 2 -> None
    assert shift_conv.fused_qconv2d(
        x_q, packed, es, eb, strides=(2, 2), padding="SAME", groups=1,
        relu=True, wfmt="pot4", kshape=(3, 3, 16, 32), interpret=True) is None
    # grouped -> None
    assert shift_conv.fused_qconv2d(
        x_q, packed, es, eb, strides=(1, 1), padding="SAME", groups=2,
        relu=True, wfmt="pot4", kshape=(3, 3, 8, 32), interpret=True) is None


def test_pallas_covers_predicate():
    assert shift_conv.pallas_covers((1, 1, 256, 512), (1, 1), "SAME", 1)
    assert shift_conv.pallas_covers((3, 3, 64, 64), (1, 1), "SAME", 1,
                                    h=56, w=56)
    assert not shift_conv.pallas_covers((3, 3, 64, 64), (2, 2), "SAME", 1)
    assert not shift_conv.pallas_covers((1, 1, 256, 512), (1, 1), "SAME", 2)
    # giant image blows VMEM -> not covered
    assert not shift_conv.pallas_covers((3, 3, 512, 512), (1, 1), "SAME", 1,
                                        h=224, w=224)
