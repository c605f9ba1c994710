"""Fused shift-quantized matmul Pallas TPU kernel.

The TPU analog of the reference's shift-add-MAC conv PE (SURVEY.md §3 R7):
weights live in HBM as 4-bit PoT codes (2/byte, split-half layout, see
transform/potq.py); the kernel decodes them on the VPU *inside* the matmul
pipeline — sign·2^(m-1) via integer shifts, the literal "shift" of ShiftCNN
— and feeds int8 tiles straight to the MXU (int8×int8→int32), then applies
the fused requantization epilogue in-register:

    y_q = clip(round(acc_i32 · eff_scale_c + eff_bias_c) [, relu])  -> int8

Serves qdense nodes (convs, including 1x1, route to kernels/qconv.py).

Grid: (M/BM, N/BN); K is kept whole per block (models here have K ≤ ~4.6k,
so x-blocks fit VMEM comfortably and Mosaic pipelines the K-dim matmul
internally). Ragged M/N edges rely on Pallas block masking.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Upper bound where a (BM, K) int8 x-block + decoded (K, BN) weight block
# still fit VMEM with double buffering.
_MAX_K = 16384


def _decode_pot(c_i32: jax.Array) -> jax.Array:
    """4-bit PoT code (int32 vector) -> int8 value: (-1)^s * 2^(m-1), m>0."""
    m = c_i32 & 7
    s = (c_i32 >> 3) & 1
    mag = jnp.where(m == 0, 0, jnp.left_shift(1, jnp.maximum(m - 1, 0)))
    return jnp.where(s == 1, -mag, mag).astype(jnp.int8)


def _qmm_pot4_kernel(x_ref, wp_ref, es_ref, eb_ref, o_ref, wdec_ref, *,
                     relu: bool):
    # Grid is (n_blocks, m_blocks) with m fastest: decode this N-tile's
    # weights ONCE (first m step) into VMEM scratch and reuse across all
    # m blocks — decoding per (m, n) made the VPU decode dominate the MXU
    # work (measured 3x slowdown on ResNet-50 1x1 layers).
    @pl.when(pl.program_id(1) == 0)
    def _decode():
        p = wp_ref[:].astype(jnp.int32)        # (K/2, BN) packed bytes
        wdec_ref[:] = jnp.concatenate(
            [_decode_pot(p & 0xF), _decode_pot((p >> 4) & 0xF)], axis=0)

    acc = jnp.dot(x_ref[:], wdec_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es_ref[:] + eb_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[:] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _qmm_int8_kernel(x_ref, w_ref, es_ref, eb_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es_ref[:] + eb_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[:] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _block_sizes(m: int, n: int, k: int) -> tuple[int, int]:
    """Pick (BM, BN) so grid-step count stays low (per-step overhead
    dominates at huge-M/small-K 1x1-conv shapes) while the whole working
    set fits the ~16MB scoped-VMEM limit: double-buffered x (BM*K int8)
    and out (BM*BN int8) blocks, the f32 accumulator (BM*BN*4), the
    double-buffered packed weights (K/2*BN) and the decode scratch (K*BN)."""
    bn = min(256, max(128, _round_up(n, 128)))
    # 8MB of the 16MB scoped-vmem limit: Mosaic's own stack/staging overhead
    # on top of this model measured ~4MB at bm=3328/k=1024 (compile-time
    # vmem OOM at a 12MB budget), so leave generous headroom
    budget = 8 * 1024 * 1024
    fixed = 2 * k * bn                    # packed (dbl) + decode scratch
    per_bm = 2 * k + 6 * bn               # x (dbl) + out (dbl) + f32 acc
    bm_cap = max(256, (budget - fixed) // per_bm // 256 * 256)
    bm = min(_round_up(m, 256) if m > 32 else 32, bm_cap, 8192)
    return bm, bn


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def qmatmul_pot4(x_q: jax.Array, packed: jax.Array, eff_scale: jax.Array,
                 eff_bias: jax.Array, relu: bool = False,
                 interpret: bool = False) -> jax.Array:
    """x_q (M, K) int8 · packed (K/2, N) uint8 -> (M, N) int8."""
    m, k = x_q.shape
    kh2, n = packed.shape
    assert kh2 * 2 == k, f"split-half packing mismatch: K={k} rows={kh2}"
    bm, bn = _block_sizes(m, n, k)
    # grid order (n, m): m iterates fastest so the scratch decode for an
    # N-tile is computed once and reused for every m block
    grid = (pl.cdiv(n, bn), pl.cdiv(m, bm))
    return pl.pallas_call(
        functools.partial(_qmm_pot4_kernel, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh2, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        scratch_shapes=[pltpu.VMEM((k, bn), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + kh2 * n + m * n,
            transcendentals=0),
        interpret=interpret,
    )(x_q, packed, eff_scale.reshape(1, -1), eff_bias.reshape(1, -1))


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def qmatmul_int8(x_q: jax.Array, w_q: jax.Array, eff_scale: jax.Array,
                 eff_bias: jax.Array, relu: bool = False,
                 interpret: bool = False) -> jax.Array:
    """x_q (M, K) int8 · w_q (K, N) int8 -> (M, N) int8."""
    m, k = x_q.shape
    _, n = w_q.shape
    bm, bn = _block_sizes(m, n, k)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    return pl.pallas_call(
        functools.partial(_qmm_int8_kernel, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + m * n,
            transcendentals=0),
        interpret=interpret,
    )(x_q, w_q, eff_scale.reshape(1, -1), eff_bias.reshape(1, -1))


def fused_qmatmul(x_q, wparam, eff_scale, eff_bias, relu: bool,
                  wfmt: str, kshape: tuple, interpret: bool = False):
    """Dispatch entry. Returns int8 (M, N) or None if unsupported shapes."""
    from . import dispatch as _d
    m, k = x_q.shape
    if k > _MAX_K or k % 2 or k < _d.pallas_min_k():
        return None
    if wfmt == "pot4":
        return qmatmul_pot4(x_q, wparam, eff_scale, eff_bias, relu=relu,
                            interpret=interpret)
    return qmatmul_int8(x_q, wparam, eff_scale, eff_bias, relu=relu,
                        interpret=interpret)
