"""Fused shift-quantized conv dispatch (Pallas path).

Strategy (TPU-first, SURVEY.md §8 step 3):
- 1x1 convs ARE matmuls over the flattened spatial dims — they route to the
  fused PoT matmul kernel (shift_matmul). Stride-s 1x1 convs subsample the
  input first (free strided slice at the XLA level). In ResNet-50 this
  covers the majority of conv FLOPs; SqueezeNet squeeze/expand-1x1 and all
  GoogLeNet reduce/projection layers too.
- KxK convs lower to implicit GEMM via a shifted-matmul decomposition
  (conv_kxk_s1) executed by the same Pallas kernel per tap, or return None
  to let dispatch fall back to XLA's native int8 conv (already MXU-mapped)
  — which keeps every shape correct while the dedicated implicit-GEMM
  kernel matures.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import shift_matmul
from .shift_matmul import _decode_pot

# whole-(padded)-image x-block + int32 acc must fit VMEM
_VMEM_IMG_LIMIT = 6 * 1024 * 1024


def _qconv_kxk_kernel(x_ref, wp_ref, es_ref, eb_ref, o_ref, wdec_ref, *,
                      kh: int, kw: int, cin: int, relu: bool, wfmt: str):
    """Implicit-GEMM KxK stride-1 conv, one (padded) image per grid step.

    x_ref: (1, H+kh-1, W+kw-1, C) int8 — pre-padded input
    wp/wdec: split-half packed codes -> decoded (K, BN) int8 (K = kh*kw*C),
             tap (i,j) occupying rows [(i*kw+j)*C, (i*kw+j+1)*C) (HWIO
             flatten order, matching transform/quantize's reshape(-1, cout))
    o_ref: (1, H, W, BN) int8

    The epilogue (scale+bias+relu+round+clip) runs in-register — the int32
    accumulator never touches HBM, which removes the clamp_convert HBM
    round-trip that dominates the XLA-lowered path (measured ~40% of
    ResNet-50 batch-64 runtime).
    """
    # decode weights once per cout-tile (grid dim 1 iterates images fastest)
    @pl.when(pl.program_id(1) == 0)
    def _decode():
        if wfmt == "pot4":
            p = wp_ref[:].astype(jnp.int32)
            wdec_ref[:] = jnp.concatenate(
                [_decode_pot(p & 0xF), _decode_pot((p >> 4) & 0xF)], axis=0)
        else:
            wdec_ref[:] = wp_ref[:]

    h = o_ref.shape[1]
    w = o_ref.shape[2]
    bn = o_ref.shape[3]
    acc = jnp.zeros((h * w, bn), jnp.int32)
    for i in range(kh):
        for j in range(kw):
            xs = x_ref[0, i:i + h, j:j + w, :].reshape(h * w, cin)
            wt = wdec_ref[(i * kw + j) * cin:(i * kw + j + 1) * cin, :]
            acc += jnp.dot(xs, wt, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es_ref[:] + eb_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    y = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    o_ref[0] = y.reshape(h, w, bn)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "cin", "cout",
                                             "relu", "wfmt", "interpret"))
def qconv_kxk_s1(x_pad: jax.Array, wparam: jax.Array, eff_scale: jax.Array,
                 eff_bias: jax.Array, kh: int, kw: int, cin: int, cout: int,
                 relu: bool, wfmt: str, interpret: bool = False) -> jax.Array:
    """x_pad (B, H+kh-1, W+kw-1, C) int8 -> (B, H, W, cout) int8."""
    b, hp, wp_, c = x_pad.shape
    h, w = hp - kh + 1, wp_ - kw + 1
    k = kh * kw * cin
    bn = min(256, max(128, -(-cout // 128) * 128))
    grid = (pl.cdiv(cout, bn), b)
    if wfmt == "pot4":
        w_spec = pl.BlockSpec((k // 2, bn), lambda j, i: (0, j),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((k, bn), lambda j, i: (0, j),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_qconv_kxk_kernel, kh=kh, kw=kw, cin=cin,
                          relu=relu, wfmt=wfmt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp, wp_, c), lambda j, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, bn), lambda j, i: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((k, bn), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * cout * k,
            bytes_accessed=b * hp * wp_ * c + k * cout + b * h * w * cout,
            transcendentals=0),
        interpret=interpret,
    )(x_pad, wparam, eff_scale.reshape(1, -1), eff_bias.reshape(1, -1))


def pallas_covers(kshape, strides, padding, groups: int, h: int = 224,
                  w: int = 224, cout_cap_bn: int = 256) -> bool:
    """Shared coverage predicate: does the Pallas path handle this conv?
    (Used by dispatch AND by the engine's predecode planner so they agree
    on which weights stay packed.)"""
    from . import dispatch as _d
    kh, kw, cin_g, cout = kshape
    if groups != 1:
        return False
    sh, sw = strides
    k = kh * kw * cin_g
    if k % 2 or k < _d.pallas_min_k():
        return False
    if kh == 1 and kw == 1:
        return sh == 1 and sw == 1 and isinstance(padding, str)
    if sh == 1 and sw == 1 and padding == "SAME" and kh % 2 and kw % 2:
        bn = min(cout_cap_bn, max(128, -(-cout // 128) * 128))
        vmem = ((h + kh - 1) * (w + kw - 1) * cin_g + h * w * bn * 4
                + k * bn * 2)
        return vmem <= _VMEM_IMG_LIMIT
    return False


def _pad_amount(size: int, k: int, stride: int) -> tuple[int, int]:
    """TF-style SAME padding."""
    out = -(-size // stride)
    total = max((out - 1) * stride + k - size, 0)
    return total // 2, total - total // 2


def fused_qconv2d(x_q: jax.Array, wparam: jax.Array, eff_scale, eff_bias,
                  strides, padding, groups: int, relu: bool, wfmt: str,
                  kshape: tuple, interpret: bool = False):
    """x_q NHWC int8 -> int8 NHWC, or None if this shape isn't covered."""
    kh, kw, cin_g, cout = kshape
    if groups != 1:
        return None
    sh, sw = strides
    if kh == 1 and kw == 1:
        if sh > 1 or sw > 1:
            # stride-2 1x1 (ResNet downsamples): materializing the strided
            # int8 subsample costs more than XLA's native strided conv —
            # measured to erase the kernel's win. Fall back.
            return None
        if not isinstance(padding, str):
            return None  # explicit padding on 1x1: rare; fallback
        n, h, w, c = x_q.shape
        if wfmt == "int8":
            wparam = wparam.reshape(-1, cout)  # HWIO (1,1,C,cout) -> (C,cout)
        y = shift_matmul.fused_qmatmul(
            x_q.reshape(n * h * w, c), wparam, eff_scale, eff_bias,
            relu=relu, wfmt=wfmt, kshape=(c, cout), interpret=interpret)
        if y is None:
            return None
        return y.reshape(n, h, w, cout)

    # KxK stride-1 SAME implicit GEMM (odd kernels)
    if (sh == 1 and sw == 1 and padding == "SAME" and kh % 2 and kw % 2
            and (kh * kw * cin_g) % 2 == 0
            and kh * kw * cin_g >= max(2, 0)):
        from . import dispatch as _d
        if kh * kw * cin_g < _d.pallas_min_k():
            return None
        n, h, w, c = x_q.shape
        bn = min(256, max(128, -(-cout // 128) * 128))
        k = kh * kw * cin_g
        vmem = ((h + kh - 1) * (w + kw - 1) * c      # x image block
                + h * w * bn * 4                      # int32/f32 acc values
                + k * bn * 2)                         # decoded + packed
        if vmem > _VMEM_IMG_LIMIT:
            return None
        ph, pw = kh // 2, kw // 2
        x_pad = jnp.pad(x_q, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        if wfmt == "int8":
            wparam = wparam.reshape(-1, cout)  # HWIO -> (K, cout)
        return qconv_kxk_s1(x_pad, wparam, eff_scale, eff_bias, kh, kw,
                            cin_g, cout, relu, wfmt, interpret=interpret)
    return None
