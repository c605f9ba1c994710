"""Power-of-two ("shift") weight quantization — the heart of the Transform
Kit.

Scheme (ShiftCNN-style, arXiv 1706.02393, per SURVEY.md §3 R2): each weight
is approximated as ``w ≈ s_c · q`` where ``s_c`` is a per-output-channel
fp32 scale and ``q ∈ {0, ±1, ±2, ±4, ±8, ±16, ±32, ±64}`` — i.e. sign times
a power of two. On the FPGA reference this turns multiplies into arithmetic
shifts; on TPU we exploit that ``q`` fits int8, so the MXU computes the
int8×int8→int32 product directly (the "shift-add MAC analog"), and the
4-bit *code* representation halves weight HBM traffic with in-kernel decode.

4-bit code layout (bit 3 = sign, bits 2:0 = magnitude field m):
    m == 0          -> value 0 (sign ignored; canonical zero has sign 0)
    m in 1..7       -> magnitude 2^(m-1)  (1,2,4,...,64)
so ``decode(c) = (-1)^s * (m ? 1 << (m-1) : 0)``.

Scale fitting is per-channel brute force over a geometric candidate grid
minimizing MSE — cheap offline, and measurably better than the naive
absmax/64 anchor.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# The 8 magnitudes and the MSE-nearest decision midpoints between them.
POT_MAGS = np.array([0, 1, 2, 4, 8, 16, 32, 64], dtype=np.float32)
_POT_MIDPOINTS = (POT_MAGS[1:] + POT_MAGS[:-1]) / 2.0  # [0.5,1.5,3,6,12,24,48]
POT_MAX = 64.0


def pot_decode(codes: jax.Array) -> jax.Array:
    """uint8 4-bit codes (values 0..15) -> int8 PoT values."""
    c = codes.astype(jnp.int32)
    m = c & 7
    s = (c >> 3) & 1
    mag = jnp.where(m == 0, 0, jnp.left_shift(1, jnp.maximum(m - 1, 0)))
    return jnp.where(s == 1, -mag, mag).astype(jnp.int8)


def pot_encode_from_int8(q) -> np.ndarray:
    """int8 PoT values (validated by construction) -> uint8 4-bit codes.
    Pure numpy (offline path)."""
    q = np.asarray(q)
    a = np.abs(q.astype(np.int32))
    # m = position in POT_MAGS = 1 + log2(a) for a>0
    m = np.where(a == 0, 0, np.round(np.log2(np.maximum(a, 1))).astype(np.int32) + 1)
    s = (q < 0).astype(np.int32)
    s = np.where(m == 0, 0, s)  # canonical zero
    return (m | (s << 3)).astype(np.uint8)


def pot_round_mag(a):
    """Map nonnegative magnitudes to the MSE-nearest PoT magnitude index
    (0..7; index k>0 encodes magnitude 2^(k-1)). jnp- and np-compatible."""
    if isinstance(a, np.ndarray):
        return np.searchsorted(_POT_MIDPOINTS, a).astype(np.int32)
    return jnp.searchsorted(jnp.asarray(_POT_MIDPOINTS), a).astype(jnp.int32)


def pot_quantize_with_scale(w: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Quantize ``w`` (K, C) with per-channel ``scale`` (C,) -> int8 PoT.
    Pure numpy: the fitters are offline Transform-Kit tools and must not
    pay per-shape XLA compiles (TPU remote compile is ~tens of seconds)."""
    a = np.abs(w) / scale
    idx = pot_round_mag(a)
    mag = POT_MAGS[idx]
    return (np.sign(w) * mag).astype(np.int8)


def fit_pot(w, n_candidates: int = 33, span: float = 1.0
            ) -> tuple[np.ndarray, np.ndarray]:
    """Fit per-channel PoT quantization for ``w`` of shape (K, C) (output
    channel LAST). Returns (q_int8 (K, C), scale (C,)).

    Scale search: candidates ``absmax/POT_MAX · 2^t`` for t in
    [-span, span]; MSE-argmin per channel. With span=0 this degenerates to
    the absmax anchor. Pure numpy (offline path — no jit compiles).
    """
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=0)  # (C,)
    base = np.maximum(absmax, 1e-12) / POT_MAX
    ts = (np.linspace(-span, span, n_candidates) if n_candidates > 1
          else np.zeros((1,)))
    best_mse = np.full(w.shape[1], np.inf, np.float32)
    best_scale = base.copy()
    for t in ts:
        scale = (base * (2.0 ** t)).astype(np.float32)
        q = pot_quantize_with_scale(w, scale)
        mse = np.mean(np.square(w - scale[None, :] * q.astype(np.float32)), axis=0)
        better = mse < best_mse
        best_mse = np.where(better, mse, best_mse)
        best_scale = np.where(better, scale, best_scale)
    q = pot_quantize_with_scale(w, best_scale)
    return q, best_scale.astype(np.float32)


def fit_int8(w, n_candidates: int = 17, span: float = 0.3
             ) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel symmetric linear int8 fit for (K, C) weights (used for
    first/last layers kept at W8 per the ShiftCNN accuracy recipe).
    Returns (q_int8, scale). Pure numpy (offline path)."""
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=0)
    base = np.maximum(absmax, 1e-12) / 127.0
    ts = (np.linspace(-span, 0.0, n_candidates) if n_candidates > 1
          else np.zeros((1,)))
    best_mse = np.full(w.shape[1], np.inf, np.float32)
    best_scale = base.copy()
    for t in ts:
        scale = (base * (2.0 ** t)).astype(np.float32)
        q = np.clip(np.round(w / scale[None, :]), -127, 127)
        mse = np.mean(np.square(w - scale[None, :] * q), axis=0)
        better = mse < best_mse
        best_mse = np.where(better, mse, best_mse)
        best_scale = np.where(better, scale, best_scale)
    q = np.clip(np.round(w / best_scale[None, :]), -127, 127).astype(np.int8)
    return q, best_scale.astype(np.float32)


# ---- 4-bit packing ----------------------------------------------------------
# Codes pack 2-per-byte along the K (reduction) axis in GLOBAL SPLIT-HALF
# layout: byte[i] = code[i] | code[i + Kp/2] << 4 (Kp = K rounded to even).
# Chosen so the TPU kernel decodes with two nibble-extracts and a
# sublane-contiguous concat — codes [0..Kp/2) live in the low nibbles in
# order, codes [Kp/2..Kp) in the high nibbles — with NO interleave relayout
# (an even/odd packing would need a lane/sublane shuffle at MXU feed rate).

def pack_codes(codes) -> np.ndarray:
    """(K, C) uint8 4-bit codes -> (ceil(K/2), C) packed uint8 (split-half).
    Pure numpy (offline path)."""
    codes = np.asarray(codes)
    k = codes.shape[0]
    if k % 2:
        codes = np.concatenate([codes, np.zeros((1,) + codes.shape[1:], np.uint8)], 0)
    half = codes.shape[0] // 2
    lo = codes[:half].astype(np.uint8)
    hi = codes[half:].astype(np.uint8)
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_codes(packed: jax.Array, k: int) -> jax.Array:
    """(ceil(K/2), C) split-half packed -> (K, C) uint8 codes. jnp-traceable
    (used by the XLA fallback path at trace time)."""
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    out = jnp.concatenate([lo, hi], axis=0)
    return out[:k].astype(jnp.uint8)


def unpack_codes_np(packed: np.ndarray, k: int) -> np.ndarray:
    """numpy mirror of unpack_codes (host-side weight prep)."""
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    return np.concatenate([lo, hi], axis=0)[:k].astype(np.uint8)


def pot_decode_np(codes: np.ndarray) -> np.ndarray:
    """numpy mirror of pot_decode (host-side weight prep)."""
    c = codes.astype(np.int32)
    m = c & 7
    s = (c >> 3) & 1
    mag = np.where(m == 0, 0, np.left_shift(1, np.maximum(m - 1, 0)))
    return np.where(s == 1, -mag, mag).astype(np.int8)


def quantization_snr_db(w: jax.Array, w_hat: jax.Array) -> float:
    num = jnp.sum(jnp.square(w))
    den = jnp.sum(jnp.square(w - w_hat)) + 1e-30
    return float(10.0 * jnp.log10(num / den))
