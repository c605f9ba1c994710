"""Unit tests for PoT weight quantization (SURVEY.md §5.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf2_tpu.transform import potq


def test_codebook_roundtrip_exhaustive():
    """All 16 codes decode to PoT values and re-encode to canonical codes."""
    codes = jnp.arange(16, dtype=jnp.uint8)
    vals = potq.pot_decode(codes)
    expect = [0, 1, 2, 4, 8, 16, 32, 64, 0, -1, -2, -4, -8, -16, -32, -64]
    assert list(np.asarray(vals)) == expect
    re = potq.pot_encode_from_int8(vals)
    # code 8 (negative zero) canonicalizes to 0
    expect_codes = list(range(8)) + [0] + list(range(9, 16))
    assert list(np.asarray(re)) == expect_codes


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    for k in (6, 7, 128, 129):
        codes = jnp.asarray(rng.randint(0, 16, (k, 32)), jnp.uint8)
        packed = potq.pack_codes(codes)
        assert packed.shape == ((k + 1) // 2, 32)
        out = potq.unpack_codes(packed, k)
        assert (np.asarray(out) == np.asarray(codes)).all()


def test_round_mag_mse_nearest():
    """Midpoint rounding: each magnitude maps to its MSE-nearest PoT."""
    a = jnp.array([0.0, 0.49, 0.51, 1.4, 1.6, 2.9, 3.1, 47.9, 48.1, 500.0])
    mags = jnp.asarray(potq.POT_MAGS)[potq.pot_round_mag(a)]
    assert list(np.asarray(mags)) == [0, 0, 1, 1, 2, 2, 4, 32, 64, 64]


def test_fit_pot_exact_on_pot_weights():
    """Weights that ARE scaled PoT values must quantize losslessly."""
    rng = np.random.RandomState(1)
    scale_true = 0.01
    q_true = np.array([0, 1, -2, 4, -8, 16, -32, 64] * 16, np.float32).reshape(16, 8)
    w = jnp.asarray(scale_true * q_true)
    q, s = potq.fit_pot(w)
    w_hat = np.asarray(s)[None, :] * np.asarray(q, np.float32)
    np.testing.assert_allclose(w_hat, np.asarray(w), rtol=1e-6)


def test_fit_pot_beats_absmax_anchor():
    """The MSE scale search must not be worse than the absmax/64 anchor."""
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 16)) * 0.05
    q_fit, s_fit = potq.fit_pot(w)
    q_anchor, s_anchor = potq.fit_pot(w, n_candidates=1, span=0.0)
    err_fit = float(jnp.mean(jnp.square(w - s_fit * q_fit.astype(jnp.float32))))
    err_anchor = float(jnp.mean(jnp.square(w - s_anchor * q_anchor.astype(jnp.float32))))
    assert err_fit <= err_anchor * (1 + 1e-6)
    snr = potq.quantization_snr_db(w, s_fit * q_fit.astype(jnp.float32))
    # measured codebook limit for {0,±2^0..±2^6} on gaussians: ~14.8 dB
    assert snr > 14.0


def test_fit_int8_high_snr():
    w = jax.random.normal(jax.random.PRNGKey(2), (512, 8)) * 0.1
    q, s = potq.fit_int8(w)
    snr = potq.quantization_snr_db(w, s * q.astype(jnp.float32))
    assert snr > 30.0
    assert q.dtype == jnp.int8


def test_pot_values_are_int8_pot():
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32))
    q, _ = potq.fit_pot(w)
    vals = set(np.unique(np.asarray(q, np.int32)))
    allowed = {0} | {v for m in [1, 2, 4, 8, 16, 32, 64] for v in (m, -m)}
    assert vals <= allowed
