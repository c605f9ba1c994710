"""Bottleneck-chain kernel parity: fused_qblockchain (interpret) vs
reference_chain — must be bit-exact (int32 accumulation, identical
double-rounding in the c3/qadd epilogues)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tf2_tpu.kernels import qblocks


def _mk_block(rng, cin, cm, cout, down=False, relu=True):
    b = {
        "w1": rng.integers(-127, 128, (cin, cm), dtype=np.int8),
        "es1": rng.uniform(1e-4, 5e-3, cm).astype(np.float32),
        "eb1": (rng.normal(size=cm) * 0.3).astype(np.float32),
        "w2": rng.integers(-127, 128, (3, 3, cm, cm), dtype=np.int8),
        "es2": rng.uniform(1e-4, 5e-4, cm).astype(np.float32),
        "eb2": (rng.normal(size=cm) * 0.3).astype(np.float32),
        "w3": rng.integers(-127, 128, (cm, cout), dtype=np.int8),
        "es3": rng.uniform(1e-4, 5e-4, cout).astype(np.float32),
        "eb3": (rng.normal(size=cout) * 0.3).astype(np.float32),
        "sa_over_so": float(rng.uniform(0.5, 1.5)),
        "sb_over_so": float(rng.uniform(0.5, 1.5)),
        "relu": relu,
    }
    if down:
        b["wd"] = rng.integers(-127, 128, (cin, cout), dtype=np.int8)
        b["esd"] = rng.uniform(1e-4, 5e-4, cout).astype(np.float32)
        b["ebd"] = (rng.normal(size=cout) * 0.3).astype(np.float32)
    return b


@pytest.mark.parametrize("nblocks,down", [(1, False), (2, False), (3, False),
                                          (2, True)])
def test_chain_parity(nblocks, down):
    rng = np.random.default_rng(nblocks + 10 * down)
    cin = cout = 32
    cm = 8
    blocks = [_mk_block(rng, cin, cm, cout, down=(down and i == 0))
              for i in range(nblocks)]
    x = rng.integers(-127, 128, (2, 16, 16, cin), dtype=np.int8)
    ref = np.asarray(qblocks.reference_chain(jnp.asarray(x), blocks))
    out = np.asarray(qblocks.fused_qblockchain(jnp.asarray(x), blocks,
                                               interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_chain_parity_adversarial_extremes():
    rng = np.random.default_rng(99)
    blocks = [_mk_block(rng, 16, 8, 16)]
    x = np.full((1, 8, 8, 16), 127, dtype=np.int8)
    x[0, :2] = -127
    ref = np.asarray(qblocks.reference_chain(jnp.asarray(x), blocks))
    out = np.asarray(qblocks.fused_qblockchain(jnp.asarray(x), blocks,
                                               interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pad_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.integers(-127, 128, (2, 14, 14, 16), dtype=np.int8)
    xf = qblocks.pad_in(jnp.asarray(x))
    back = np.asarray(qblocks.unpad_out(xf, 14, 14))
    np.testing.assert_array_equal(back, x)
