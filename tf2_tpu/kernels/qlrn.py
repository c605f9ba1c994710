"""Fused int8 LRN: dequantize -> LRN -> requantize in ONE pass.

Why a fused op (v5e-1 profiles, 2026-08-21, GoogLeNet b64,
PROFILE_TRACE_googlenet.json): the quantized graph originally ran LRN as
dequantize -> lrn -> quantize in f32. Three window formulations measured
end-to-end and standalone:

  window formulation              C=64 (M=200704)   C=192 (M=200704)
  reduce_window over lanes (XLA)  (in-graph lrn_0+lrn_1 = 2.89 ms total)
  shifted lane slices (XLA fused)   236 us in-graph   1360 us in-graph
  banded 1x1 conv (XLA, unfused)   ~340 us in-graph    657 us in-graph
  Pallas: shifted lane slices       476 us              877 us
  Pallas: f32 band matmul (MXU)     228 us              476 us

The lane-dimension window is the enemy in every VPU formulation: NHWC
puts C on lanes, and int8/f32 lane-shift reads are the same Mosaic/XLA
weak spot that sank the per-op conv kernels (BASELINE.md §3.6). Putting
the window on the MXU as a matmul against a constant 0/1 band matrix
sidesteps lanes entirely; doing it INSIDE a Pallas kernel additionally
avoids the XLA fusion break around a conv (f32 HBM round-trips).

- ``reference_qlrn`` (jnp, runs everywhere): banded 1x1 conv — the best
  XLA formulation.
- ``fused_qlrn`` (Pallas, TPU): f32 band matmul in-kernel — int8 in,
  int8 out, one HBM round-trip. Routed per measured whole-graph win
  (kernels/dispatch._route_lrn).

Math (per element, shared by both paths):
    xf  = q * s_in;  sq = xf^2;  win = sq @ band
    t   = bias + alpha * win
    y   = xf * rsqrt(t) * sqrt(rsqrt(t))        # beta = 0.75 exact
    out = clip(round(y / s_out)) -> int8
General beta falls back to pow, matching graph/execute._lrn.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=16)
def band_matrix(c: int, r: int) -> np.ndarray:
    """(C, C) f32 0/1 band: win = sq @ band."""
    band = np.zeros((c, c), np.float32)
    for i in range(c):
        band[max(0, i - r):i + r + 1, i] = 1.0
    return band


def _epilogue(xf, win, alpha: float, beta: float, bias: float,
              s_out: float):
    t = bias + alpha * win
    if abs(beta - 0.75) < 1e-12:
        rs = jax.lax.rsqrt(t)
        y = xf * rs * jnp.sqrt(rs)
    else:
        y = xf / jnp.power(t, beta)
    return jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)


def _qlrn_kernel(x_ref, b_ref, o_ref, *, alpha, beta, bias, s_in, s_out):
    # f32 sq dot against the band. Measured dead end (r5, v5e-1
    # 2026-08-21, C=192 blk=2048): a base-128 digit split of q²
    # (hi=q²>>7, lo=q²&127, both exact in bf16, two bf16 digit dots,
    # exact-int window) reads 684 µs vs 476 here — the VPU digit prep +
    # second dot cost more than the f32 dot's 3-pass decomposition
    # saves. The kernel's remaining gap to its ~160 µs floor is Mosaic's
    # small-N (192) dot pipeline, not the dot dtype.
    xf = x_ref[...].astype(jnp.float32) * s_in
    sq = xf * xf
    win = jax.lax.dot_general(sq, b_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = _epilogue(xf, win, alpha, beta, bias, s_out)


@functools.partial(jax.jit, static_argnames=(
    "r", "alpha", "beta", "bias", "s_in", "s_out", "interpret"))
def _qlrn_call(x2d, *, r, alpha, beta, bias, s_in, s_out, interpret=False):
    m, c = x2d.shape
    blk = 2048
    while m % blk:  # m is B*H*W of zoo shapes; fall back to smaller blocks
        blk //= 2
    kern = functools.partial(_qlrn_kernel, alpha=alpha, beta=beta,
                             bias=bias, s_in=s_in, s_out=s_out)
    band = jnp.asarray(band_matrix(c, r))
    return pl.pallas_call(
        kern,
        grid=(m // blk,),
        in_specs=[pl.BlockSpec((blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * c, bytes_accessed=2 * m * c,
            transcendentals=0),
        interpret=interpret,
    )(x2d, band)


def fused_qlrn(x_q: jax.Array, *, radius: int, alpha: float, beta: float,
               bias: float, s_in: float, s_out: float,
               interpret: bool = False) -> jax.Array | None:
    """x_q int8 (..., C). Returns int8 same shape, or None when the shape
    is outside kernel coverage (caller falls back to reference_qlrn)."""
    c = x_q.shape[-1]
    m = 1
    for d in x_q.shape[:-1]:
        m *= d
    # coverage: band matrix + one (blk, C) f32 working set must fit VMEM
    if c > 1024 or m < 8 or (2048 * c * 4 * 4 + c * c * 4) > (14 << 20):
        return None
    blk = 2048
    while m % blk:
        blk //= 2
    if blk < 128:
        # odd M degrades the block fallback toward blk=1 (an M-step grid
        # of 1-row blocks); refuse below a sane sublane-row floor and let
        # dispatch take the reference path instead (ADVICE r4)
        return None
    y = _qlrn_call(x_q.reshape(m, c), r=radius, alpha=float(alpha),
                   beta=float(beta), bias=float(bias), s_in=float(s_in),
                   s_out=float(s_out), interpret=interpret)
    return y.reshape(x_q.shape)


def reference_qlrn(x_q: jax.Array, *, radius: int, alpha: float,
                   beta: float, bias: float, s_in: float,
                   s_out: float) -> jax.Array:
    """jnp reference (off-TPU executor path and XLA fallback): banded 1x1
    conv window — same math as the kernel (matmul against the same band),
    so the two paths agree to float-associativity.

    Measured dead end (r5, v5e-1 2026-08-21, C=192 standalone): moving
    the window to the INT8 MXU via a base-128 digit split of q²
    (two int8 band convs, exact) reads 962 µs vs 460 f32, and a bf16 sq
    conv ties f32 (456) — the sink is the MATERIALIZED sq tensor the XLA
    conv operand forces (154 MB f32), not the conv's 3-pass MXU cost.
    Killing that traffic needs the window computed in VMEM — that is the
    Pallas kernel below (int8-digit dots in-kernel), not a jnp rewrite."""
    xf = x_q.astype(jnp.float32) * s_in
    sq = xf * xf
    c = x_q.shape[-1]
    band = jnp.asarray(band_matrix(c, radius).reshape(1, 1, c, c))
    win = jax.lax.conv_general_dilated(
        sq.reshape((-1, 1, 1, c) if sq.ndim < 4 else sq.shape),
        band, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).reshape(sq.shape)
    return _epilogue(xf, win, alpha, beta, bias, s_out)
