"""Stem kernel parity: fold_image/fold_weight/fused_qstem vs the plain
int8 conv reference — must be bit-exact (int32 accumulation both sides)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from tf2_tpu.kernels import qstem


def _ref(x_q, w_q, es, eb, relu, padding):
    acc = lax.conv_general_dilated(
        jnp.asarray(x_q), jnp.asarray(w_q), (2, 2), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es + eb
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _mk(b, h, w, cin, cout, k, seed=0):
    rng = np.random.default_rng(seed)
    x_q = rng.integers(-127, 128, (b, h, w, cin), dtype=np.int8)
    w_q = rng.integers(-127, 128, (k, k, cin, cout), dtype=np.int8)
    es = rng.uniform(1e-4, 5e-3, cout).astype(np.float32)
    eb = rng.normal(size=cout).astype(np.float32) * 0.1
    return x_q, w_q, es, eb


@pytest.mark.parametrize("k,h", [(7, 64), (7, 96), (5, 64), (3, 48)])
def test_qstem_parity_same(k, h):
    x_q, w_q, es, eb = _mk(2, h, h, 3, 32, k, seed=k + h)
    ref = _ref(x_q, w_q, jnp.asarray(es), jnp.asarray(eb), True, "SAME")
    out = qstem.fused_qstem(jnp.asarray(x_q), w_q, es, eb, padding="SAME",
                            relu=True, interpret=True)
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qstem_parity_resnet_shape_small_batch():
    x_q, w_q, es, eb = _mk(1, 224, 224, 3, 64, 7, seed=1)
    ref = _ref(x_q, w_q, jnp.asarray(es), jnp.asarray(eb), True, "SAME")
    out = qstem.fused_qstem(jnp.asarray(x_q), w_q, es, eb, padding="SAME",
                            relu=True, interpret=True)
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qstem_fused_quantize():
    """f32 input + scale: quantize happens inside fold_image; result must
    equal quantize-then-conv."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    _, w_q, es, eb = _mk(2, 64, 64, 3, 32, 7, seed=9)
    s = 0.02
    x_q = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    ref = _ref(x_q, w_q, jnp.asarray(es), jnp.asarray(eb), False, "SAME")
    out = qstem.fused_qstem(jnp.asarray(x), w_q, es, eb, padding="SAME",
                            relu=False, scale=s, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qstem_covers():
    assert qstem.covers((7, 7, 3, 64), (2, 2), "SAME", 1, (64, 224, 224, 3))
    assert not qstem.covers((7, 7, 3, 64), (1, 1), "SAME", 1,
                            (64, 224, 224, 3))   # stride 1
    assert not qstem.covers((7, 7, 64, 64), (2, 2), "SAME", 1,
                            (64, 224, 224, 64))  # big cin
    assert not qstem.covers((4, 4, 3, 64), (2, 2), "SAME", 1,
                            (64, 224, 224, 3))   # even k
