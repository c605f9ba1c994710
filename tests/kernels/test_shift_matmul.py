"""Pallas shift-matmul kernel tests — interpret mode on CPU vs a pure-jnp
reference (SURVEY.md §5.1). The same parametrizations run compiled on the
real chip via bench/kernel drives."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_tpu.kernels import shift_matmul
from tf2_tpu.transform import potq


def _ref_qmm(x_q, w_q, es, eb, relu):
    acc = jnp.dot(x_q.astype(jnp.int32), w_q.astype(jnp.int32),
                  preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es[None, :] + eb[None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _mk_case(m, k, n, seed=0):
    rng = np.random.RandomState(seed)
    x_q = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    w = rng.randn(k, n).astype(np.float32) * 0.05
    q, s = potq.fit_pot(w)
    packed = jnp.asarray(potq.pack_codes(potq.pot_encode_from_int8(q)))
    es = jnp.asarray(rng.uniform(1e-4, 1e-3, n), jnp.float32)
    eb = jnp.asarray(rng.randn(n), jnp.float32)
    return x_q, jnp.asarray(q), packed, es, eb


@pytest.mark.parametrize("m,k,n", [
    (32, 128, 128),     # minimal aligned
    (256, 512, 256),    # multi-block
    (8, 2048, 1000),    # FC layer: small M, ragged N
    (100, 576, 64),     # ragged M, small N (squeezenet-like)
])
@pytest.mark.parametrize("relu", [False, True])
def test_qmatmul_pot4_parity(m, k, n, relu):
    x_q, q, packed, es, eb = _mk_case(m, k, n)
    ref = _ref_qmm(x_q, q, es, eb, relu)
    out = shift_matmul.qmatmul_pot4(x_q, packed, es, eb, relu=relu,
                                    interpret=True)
    assert out.shape == (m, n) and out.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_qmatmul_int8_parity():
    rng = np.random.RandomState(1)
    m, k, n = 64, 384, 192
    x_q = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    w_q = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
    es = jnp.asarray(rng.uniform(1e-4, 1e-3, n), jnp.float32)
    eb = jnp.asarray(rng.randn(n), jnp.float32)
    ref = _ref_qmm(x_q, w_q, es, eb, True)
    out = shift_matmul.qmatmul_int8(x_q, w_q, es, eb, relu=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_decode_pot_exhaustive():
    """In-kernel decode must match the offline codebook for all 16 codes."""
    c = jnp.arange(16, dtype=jnp.int32)
    got = shift_matmul._decode_pot(c)
    want = potq.pot_decode(jnp.arange(16, dtype=jnp.uint8))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_accumulator_extremes():
    """int32 accumulation: worst-case |acc| = 127*64*K must not overflow
    or saturate through the epilogue."""
    m, k, n = 32, 2048, 128
    x_q = jnp.full((m, k), 127, jnp.int8)
    q = jnp.full((k, n), 64, jnp.int8)  # max PoT magnitude
    codes = potq.pot_encode_from_int8(np.asarray(q))
    packed = jnp.asarray(potq.pack_codes(codes))
    es = jnp.full((n,), 1e-7, jnp.float32)
    eb = jnp.zeros((n,), jnp.float32)
    ref = _ref_qmm(x_q, q, es, eb, False)
    out = shift_matmul.qmatmul_pot4(x_q, packed, es, eb, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # sanity: acc = 127*64*2048 = 16.6M < 2^31
    assert int(np.asarray(ref)[0, 0]) == round(127 * 64 * k * 1e-7)


def test_fused_qconv2d_1x1():
    from tf2_tpu.kernels import qconv as shift_conv
    rng = np.random.RandomState(2)
    n, h, w, cin, cout = 2, 8, 8, 64, 128
    x_q = jnp.asarray(rng.randint(-127, 128, (n, h, w, cin)), jnp.int8)
    wt = rng.randn(cin, cout).astype(np.float32) * 0.05
    q, s = potq.fit_pot(wt)
    packed = jnp.asarray(potq.pack_codes(potq.pot_encode_from_int8(q)))
    es = jnp.asarray(rng.uniform(1e-4, 1e-3, cout), jnp.float32)
    eb = jnp.zeros((cout,), jnp.float32)
    out = shift_conv.fused_qconv2d(
        x_q, packed, es, eb, strides=(1, 1), padding="SAME", groups=1,
        relu=True, wfmt="pot4", kshape=(1, 1, cin, cout), interpret=True)
    ref = _ref_qmm(x_q.reshape(-1, cin), jnp.asarray(q), es, eb, True)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1, cout),
                                  np.asarray(ref))
