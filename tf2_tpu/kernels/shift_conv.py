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

import jax
import jax.numpy as jnp

from . import shift_matmul


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
        if isinstance(padding, str):
            if padding == "SAME" and (sh > 1):
                # SAME 1x1 stride-s == subsample then matmul when H % s
                # leaves the anchor at 0 (TF SAME starts at 0 for k=1)
                x_q = x_q[:, ::sh, ::sw, :]
            elif padding == "VALID" and sh > 1:
                x_q = x_q[:, ::sh, ::sw, :]
            elif sh > 1:
                return None
        else:
            return None  # explicit padding on 1x1: rare; fallback
        n, h, w, c = x_q.shape
        y = shift_matmul.fused_qmatmul(
            x_q.reshape(n * h * w, c), wparam, eff_scale, eff_bias,
            relu=relu, wfmt=wfmt, kshape=(c, cout), interpret=interpret)
        if y is None:
            return None
        return y.reshape(n, h, w, cout)
    return None
