"""Native preprocessing library tests: C++ vs numpy reference parity."""
import numpy as np
import pytest

from tf2_tpu.utils import preproc


def test_native_builds_and_loads():
    assert preproc.have_native(), "native preproc .so failed to build/load"


def test_f32_parity_with_numpy():
    rng = np.random.RandomState(0)
    batch = rng.randint(0, 256, (3, 37, 53, 3), np.uint8)
    a = preproc.preprocess(batch, 32)
    b = preproc.preprocess(batch, 32, force_numpy=True)
    assert a.shape == b.shape == (3, 32, 32, 3)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_i8_parity_with_numpy():
    rng = np.random.RandomState(1)
    batch = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    a = preproc.preprocess(batch, 48, quant_scale=0.02)
    b = preproc.preprocess(batch, 48, quant_scale=0.02, force_numpy=True)
    assert a.dtype == np.int8
    # resize rounding can differ by 1 ulp -> at most one quantum, rarely
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99


def test_identity_resize_exact():
    """Same-size resize must reproduce the normalize exactly."""
    rng = np.random.RandomState(2)
    batch = rng.randint(0, 256, (1, 16, 16, 3), np.uint8)
    out = preproc.preprocess(batch, 16)
    want = ((batch[0] / 255.0 - preproc.IMAGENET_MEAN) /
            preproc.IMAGENET_STD).astype(np.float32)
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_upscale_shapes():
    rng = np.random.RandomState(3)
    batch = rng.randint(0, 256, (2, 8, 8, 3), np.uint8)
    out = preproc.preprocess(batch, 24)
    assert out.shape == (2, 24, 24, 3)
    assert np.isfinite(out).all()
