"""Kernel dispatch — selects Pallas TPU kernels or jnp reference
implementations for the fused quantized ops.

Reference parity: the FPGA runtime binds each IR layer to a device kernel at
load time (SURVEY.md §3 R5/R7). Here binding is a pure-function choice made
at trace time: on TPU the hot ops call Pallas kernels (int8 MXU); elsewhere
(CPU tests, interpret mode) the jnp reference runs. Both consume the same
artifact; golden-parity tests pin them together.

Integer-conv strategy:
- "int": lax conv/dot on int8 with preferred_element_type=int32 — exact.
- "float": operands cast to fp32 and accumulated in fp32. Products of int8
  values are exact in fp32; sums stay exact while |acc| < 2^24, true for
  every layer in the zoo at calibrated ranges except adversarial worst-case.
Mode auto-resolves per backend; override with set_int_mode().
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph.ir import Node
from ..transform import potq

_INT_MODE: str | None = None      # None=auto, "int", "float"
_USE_PALLAS: bool | None = None   # None=auto (TPU yes), True/False force
_STEM_BF16: bool | None = None    # None=auto (TPU yes), True/False force
_STEM_BF16_MAX_CIN: int = 4       # bf16 stem path applies to cin <= this
# route a matmul/1x1-conv to the Pallas kernel only when its reduction dim
# is at least this (small-K layers are HBM-bound; XLA's fusion there wins)
_PALLAS_MIN_K: int = 0


def set_int_mode(mode: str | None):
    global _INT_MODE
    _INT_MODE = mode


def set_use_pallas(flag: bool | None, min_k: int | None = None):
    global _USE_PALLAS, _PALLAS_MIN_K
    _USE_PALLAS = flag
    if min_k is not None:
        _PALLAS_MIN_K = min_k


def set_stem_bf16(flag: bool | None):
    """Force (True/False) or auto-resolve (None: on for TPU) the bf16
    stem-conv path in qconv2d. Exactness is backend-independent — the knob
    exists for A/B timing and for exercising the path in CPU tests."""
    global _STEM_BF16
    _STEM_BF16 = flag


def pallas_min_k() -> int:
    return _PALLAS_MIN_K


def _int_mode() -> str:
    if _INT_MODE is not None:
        return _INT_MODE
    return "int"


def use_pallas() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    return jax.default_backend() == "tpu"


def route_conv(xshape, kshape, strides, groups, wfmt: str) -> bool:
    """True if this conv shape should take the Pallas kernel.

    Priority: explicit set_use_pallas() override > autotuned routing table
    (kernels/autotune.py, measured on the real chip) > default. The default
    is XLA's native int8 conv: the 2026-08-18 v5e per-shape sweep measured
    XLA winning every CNN-zoo conv shape (its conv+epilogue fusion is
    already MXU-optimal), so Pallas routes only where a sweep proved a win.
    """
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    if jax.default_backend() != "tpu":
        return False
    from . import autotune
    r = autotune.route(autotune.conv_key(xshape, kshape, strides, groups, wfmt))
    return r == "pallas"


def route_dense(xshape, kshape, wfmt: str) -> bool:
    """True if this dense shape should take the Pallas kernel (see
    route_conv for the decision hierarchy)."""
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    if jax.default_backend() != "tpu":
        return False
    from . import autotune
    r = autotune.route(autotune.dense_key(xshape, kshape, wfmt))
    return r == "pallas"


def decode_weight(node: Node, params) -> jax.Array:
    """Materialize the int8 weight tensor from the artifact params."""
    if node.attrs["wfmt"] == "pot4":
        kshape = tuple(node.attrs["kshape"])
        k = 1
        for d in kshape[:-1]:
            k *= d
        codes = potq.unpack_codes(params[node.params[0]], k)
        return potq.pot_decode(codes).reshape(kshape)
    return params[node.params[0]]


def _epilogue(acc_i32, eff_scale, eff_bias, relu: bool):
    y = acc_i32.astype(jnp.float32) * eff_scale + eff_bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _bf16_midconv_applies(node: Node, xshape) -> bool:
    """Mid-graph int8 convs with 4 < cin <= 32 at LARGE spatial size run
    faster on the bf16 MXU path (exact: int operands <= 127, f32 acc,
    K*127^2 < 2^24). Measured v5e-1 2026-08-21, whole-graph A/B:
    SSD s1a (cin32, 128^2) 3.17-3.21 -> 3.02-3.11 ms; but GoogLeNet's
    cin 16-48 branch convs at 14-28^2 REGRESS (2.91-3.02 -> 3.11 ms) and
    SqueezeNet's 56^2 fire expands tie — hence the h >= 64 gate."""
    kh, kw, cin, _ = node.attrs["kshape"]
    return (_int_mode() == "int" and 4 < cin <= 32
            and xshape[1] >= 64
            and node.attrs.get("groups", 1) == 1
            and kh * kw * cin * 127 * 127 < 2 ** 24
            and (jax.default_backend() == "tpu" if _STEM_BF16 is None
                 else _STEM_BF16))


def _stem_bf16_applies(node: Node) -> bool:
    kh, kw, cin, _ = node.attrs["kshape"]
    # groups==1 only: kshape[2] is per-GROUP cin, so a grouped/depthwise
    # conv would satisfy cin<=4 accidentally; the bf16 routing is only
    # measured for dense stems (ADVICE r3)
    return (_int_mode() == "int" and cin <= _STEM_BF16_MAX_CIN
            and node.attrs.get("groups", 1) == 1
            and kh * kw * cin * 127 * 127 < 2 ** 24
            and (jax.default_backend() == "tpu" if _STEM_BF16 is None
                 else _STEM_BF16))


def qconv2d(node: Node, params, x_q: jax.Array) -> jax.Array:
    eff_scale = params[node.params[1]]
    eff_bias = params[node.params[2]]
    if node.attrs.get("wfmt") == "wpack2":
        # W-axis pair-packed stem (graph/optimize.pack_phase_stem;
        # BASELINE.md §4.6): quantize values in-register, pad+pack 2
        # W-pixels into channels (zero-copy reshape), ONE bf16 conv with
        # stride (2,1) — the W stride is exactly one group step, so the
        # output is canonical NHWC with no phase un-interleave. Bit-exact:
        # int-valued operands <= 127 are exact in bf16, f32 accumulation.
        b_, h, w, cin = x_q.shape
        lo_w, hi_w = node.attrs["pack_pad_w"]
        xq = jnp.clip(jnp.round(x_q.astype(jnp.float32)
                                / node.attrs["s_in"]), -127, 127)
        xp = jnp.pad(xq, ((0, 0), (0, 0), (lo_w, hi_w), (0, 0)))
        xp = xp.reshape(b_, h, (w + lo_w + hi_w) // 2, 2 * cin)
        acc = lax.conv_general_dilated(
            xp.astype(jnp.bfloat16),
            params[node.params[0]].astype(jnp.bfloat16),
            (2, 1), (tuple(node.attrs["pack_pad_h"]), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return _epilogue(acc, eff_scale, eff_bias, node.attrs["relu"])
    if "s_in" in node.attrs:
        # fused input quantize (graph/optimize.fuse_stem_quantize): x is
        # the raw f32 image; quantize VALUES here so the whole chain
        # (quantize -> conv -> epilogue) is one XLA fusion with no int8
        # image materialization. The clip/round result is an integer
        # <= 127 — exact in f32/bf16 — so downstream math is unchanged.
        x_q = jnp.clip(jnp.round(x_q.astype(jnp.float32)
                                 / node.attrs["s_in"]), -127, 127)
        if not _stem_bf16_applies(node) and _int_mode() == "int":
            x_q = x_q.astype(jnp.int8)
    w_q = decode_weight(node, params)
    strides = tuple(node.attrs.get("strides", [1, 1]))
    padding = node.attrs.get("padding", "SAME")
    if not isinstance(padding, str):
        padding = [tuple(p) for p in padding]
    groups = node.attrs.get("groups", 1)

    if x_q.dtype == jnp.int8 and route_conv(
            x_q.shape, tuple(node.attrs["kshape"]), strides, groups,
            node.attrs["wfmt"]):
        from . import qconv
        y = qconv.fused_qconv2d(
            x_q, params[node.params[0]], eff_scale, eff_bias,
            strides=strides, padding=padding, groups=groups,
            relu=node.attrs["relu"], wfmt=node.attrs["wfmt"],
            kshape=tuple(node.attrs["kshape"]))
        if y is not None:
            return y
        # fall through: shape unsupported by the kernel — XLA path

    if _stem_bf16_applies(node):
        # Stem-shaped convs (cin <= 4): compute on a float MXU path.
        # EXACT either way: int8 magnitudes are integers <= 127 (exact in
        # bf16's 8 significand bits and trivially in f32), products
        # accumulate in f32, and worst-case |acc| = K*127^2 < 2^24 stays
        # inside f32's integer range, so the accumulator equals the int32
        # one bit-for-bit (tests/kernels/test_qconv.py).
        # WHY float at all: XLA lowers tiny-cin int8 convs with batch
        # minormost (64 of 128 lanes) + a relayout copy (round 3: bf16
        # stem 3.52 -> 3.48 ms whole-graph).
        # WHY f32 when the quantize is fused (round 4, v5e-1 2026-08-21,
        # standalone stem A/B): the fused-quantize output IS an
        # int-valued f32 tensor, and feeding it straight to the f32 conv
        # emitter skips the f32->bf16 convert AND the bf16 (2,1)-packing
        # relayout copy: 0.487 ms vs 0.756 ms bf16 (bit-exact, XLA's
        # 3-pass f32 decomposition is exact for <=127-int values whose
        # bf16 hi-split has zero lo residue).
        if "s_in" in node.attrs:
            acc = lax.conv_general_dilated(
                x_q, w_q.astype(jnp.float32), strides,
                padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.float32)
        else:
            acc = lax.conv_general_dilated(
                x_q.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16), strides,
                padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.float32)
    elif x_q.dtype == jnp.int8 and _bf16_midconv_applies(node, x_q.shape):
        acc = lax.conv_general_dilated(
            x_q.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16), strides,
            padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32)
    elif _int_mode() == "int":
        acc = lax.conv_general_dilated(
            x_q, w_q, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32)
    else:
        acc = lax.conv_general_dilated(
            x_q.astype(jnp.float32), w_q.astype(jnp.float32), strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32).astype(jnp.int32)
    return _epilogue(acc, eff_scale, eff_bias, node.attrs["relu"])


def qdense(node: Node, params, x_q: jax.Array,
           r_q: jax.Array | None = None) -> jax.Array:
    eff_scale = params[node.params[1]]
    eff_bias = params[node.params[2]]
    lead = x_q.shape[:-1]

    if r_q is not None:
        # residual folded into the epilogue (QuantSpec.fold_residual):
        # one fused pass, es/eb already requantized onto the add's grid
        w_q = decode_weight(node, params)
        if _int_mode() == "int":
            acc = jnp.dot(x_q, w_q, preferred_element_type=jnp.int32)
        else:
            acc = jnp.dot(x_q.astype(jnp.float32), w_q.astype(jnp.float32),
                          preferred_element_type=jnp.float32).astype(jnp.int32)
        y = (acc.astype(jnp.float32) * eff_scale + eff_bias
             + r_q.astype(jnp.float32) * node.attrs["radd_scale"])
        if node.attrs.get("relu"):
            y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    if route_dense(x_q.shape, tuple(node.attrs["kshape"]), node.attrs["wfmt"]):
        from . import shift_matmul
        y = shift_matmul.fused_qmatmul(
            x_q.reshape(-1, x_q.shape[-1]), params[node.params[0]],
            eff_scale, eff_bias,
            relu=node.attrs["relu"], wfmt=node.attrs["wfmt"],
            kshape=tuple(node.attrs["kshape"]))
        if y is not None:
            return y.reshape(*lead, y.shape[-1])

    w_q = decode_weight(node, params)
    if _int_mode() == "int":
        acc = jnp.dot(x_q, w_q, preferred_element_type=jnp.int32)
    else:
        acc = jnp.dot(x_q.astype(jnp.float32), w_q.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    return _epilogue(acc, eff_scale, eff_bias, node.attrs["relu"])


def qattention_core(node: Node, params, qkv_q: jax.Array) -> jax.Array:
    """Fused INT8 attention (SURVEY.md §6.7): int8 QK^T on the MXU, fp32
    softmax, probs requantized to unsigned-int8 range at fixed scale 1/127,
    int8 PV, epilogue requant to s_out. Exact-int32 accumulation both
    matmuls; reference path here, Pallas kernel in kernels/qattention.py."""
    heads, dim = node.attrs["heads"], node.attrs["dim"]
    s_in, s_out = node.attrs["s_in"], node.attrs["s_out"]
    n, t, _ = qkv_q.shape
    hd = dim // heads

    if _route_attn(qkv_q.shape, heads, dim):
        from . import qattention
        y = qattention.fused_qattention(qkv_q, heads=heads, dim=dim,
                                        s_in=s_in, s_out=s_out)
        if y is not None:
            return y

    q, k, v = jnp.split(qkv_q, 3, axis=-1)
    q = q.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    if _int_mode() == "int":
        logits = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                            preferred_element_type=jnp.int32)
        logits = logits.astype(jnp.float32)
    else:
        logits = jnp.einsum("nhqd,nhkd->nhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    logits = logits * (s_in * s_in / jnp.sqrt(jnp.float32(hd)))
    probs = jax.nn.softmax(logits, axis=-1)
    p_q = jnp.round(probs * 127.0).astype(jnp.int8)  # [0,1] -> [0,127]
    if _int_mode() == "int":
        acc = jnp.einsum("nhqk,nhkd->nhqd", p_q, v,
                         preferred_element_type=jnp.int32)
    else:
        acc = jnp.einsum("nhqk,nhkd->nhqd", p_q.astype(jnp.float32),
                         v.astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(jnp.int32)
    y = acc.astype(jnp.float32) * (s_in / (127.0 * s_out))
    y_q = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return y_q.transpose(0, 2, 1, 3).reshape(n, t, dim)


def _route_attn(qkv_shape, heads: int, dim: int) -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    if jax.default_backend() != "tpu":
        return False
    from . import autotune
    n, t, _ = qkv_shape
    return autotune.route(f"attn:b{n}:t{t}:h{heads}:d{dim}") == "pallas"


def qblockchain(node: Node, params, x_q: jax.Array) -> jax.Array:
    """Fused stride-1 bottleneck chain (graph/optimize.
    fuse_bottleneck_chains -> kernels/qblocks.py). Pallas on TPU, the
    bit-identical jnp reference elsewhere/when forced off."""
    from . import qblocks

    blocks = []
    pn = node.params
    i = 0
    for battrs in node.attrs["blocks"]:
        cm, cout = battrs["cm"], battrs["cout"]
        w1 = params[pn[i]]
        blk = {
            "w1": w1.reshape(-1, cm),
            "es1": params[pn[i + 1]], "eb1": params[pn[i + 2]],
            "w2": params[pn[i + 3]].reshape(3, 3, cm, cm),
            "es2": params[pn[i + 4]], "eb2": params[pn[i + 5]],
            "w3": params[pn[i + 6]].reshape(cm, cout),
            "es3": params[pn[i + 7]], "eb3": params[pn[i + 8]],
            "sa_over_so": np.float32(battrs["sa"] / battrs["so"]),
            "sb_over_so": np.float32(battrs["sb"] / battrs["so"]),
            "relu": battrs["relu"],
        }
        i += 9
        if battrs["down"]:
            blk["wd"] = params[pn[i]].reshape(-1, cout)
            blk["esd"] = params[pn[i + 1]]
            blk["ebd"] = params[pn[i + 2]]
            i += 3
        blocks.append(blk)

    use = (_USE_PALLAS if _USE_PALLAS is not None
           else jax.default_backend() == "tpu")
    if use:
        y = qblocks.fused_qblockchain(x_q, blocks)
        if y is not None:
            return y
    return qblocks.reference_chain(x_q, blocks)


def qlrn(node: Node, params, x_q: jax.Array) -> jax.Array:
    """Fused int8 LRN (graph/optimize.fuse_lrn_quantize ->
    kernels/qlrn.py). Pallas on TPU, same-math jnp reference elsewhere."""
    from . import qlrn as _qlrn

    kw = dict(radius=node.attrs.get("radius", 2),
              alpha=node.attrs.get("alpha", 1e-4),
              beta=node.attrs.get("beta", 0.75),
              bias=node.attrs.get("bias", 1.0),
              s_in=node.attrs["s_in"], s_out=node.attrs["s_out"])
    # Default is the jnp path: the int8-in/int8-out shifted-add chain is
    # pure elementwise+static-slices, which XLA fuses into ONE kernel —
    # measured v5e-1 2026-08-21 standalone (M=200704, C=64): XLA 0.145 ms
    # vs Pallas 0.425 ms (and the Pallas boundary perturbed neighboring
    # ops' layouts in-graph). The kernel stays routable per measured win.
    if _USE_PALLAS or (_USE_PALLAS is None
                       and jax.default_backend() == "tpu"
                       and _route_lrn(x_q.shape)):
        y = _qlrn.fused_qlrn(x_q, **kw)
        if y is not None:
            return y
    return _qlrn.reference_qlrn(x_q, **kw)


def _route_lrn(xshape) -> bool:
    from . import autotune
    c = xshape[-1]
    m = 1
    for d in xshape[:-1]:
        m *= d
    return autotune.route(f"lrn:m{m}:c{c}") == "pallas"


def qgelu(node: Node, params, x_q: jax.Array) -> jax.Array:
    """Fused dequantize -> gelu -> quantize (transform/quantize.py's
    int8-resident transformer path). Bit-identical to the unfused triple —
    same f32 ops in the same order — but keeps the (N,T,4*dim) MLP hidden
    tensor int8 at the fusion boundary instead of round-tripping f32
    through HBM (PROFILE_TRACE_vit_b16.json r4: the LN/GELU/dq glue
    fusions cost 12 x 419.7 us = 37% of the ViT step)."""
    s_in, s_out = node.attrs["s_in"], node.attrs["s_out"]
    y = jax.nn.gelu(x_q.astype(jnp.float32) * s_in)
    return jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)


def qlayernorm(node: Node, params, x_q: jax.Array) -> jax.Array:
    """LayerNorm on an int8 residual stream: int8 in -> int8 out.

    Normalization is scale-invariant — LN(s*x) == LN(x) up to the eps
    term — so the int8 codes are normalized directly (no dequantize, no
    f32 residual tensor in HBM). Exact-math equivalence to
    dequantize->layer_norm->quantize uses eps' = eps / s_in^2:
        (s*x - s*mu) / sqrt(s^2*var + eps) = (x - mu) / sqrt(var + eps/s^2).
    The affine (gamma, beta) and the output quantize fold into one
    multiply-add in-register."""
    gamma = params[node.params[0]].astype(jnp.float32)
    beta = params[node.params[1]].astype(jnp.float32)
    s_in, s_out = node.attrs["s_in"], node.attrs["s_out"]
    eps = node.attrs.get("eps", 1e-6) / (s_in * s_in)
    xf = x_q.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps) * (gamma / s_out) + (beta / s_out)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def qbias_add(node: Node, params, x_q: jax.Array) -> jax.Array:
    """Bias/positional-embedding add on the int8 grid: the param is
    pre-divided by s_out at quantize time (transform/quantize.py), so this
    is one fused multiply-add + requant, int8 in -> int8 out."""
    b_over_so = params[node.params[0]].astype(jnp.float32)
    ratio = node.attrs["s_in"] / node.attrs["s_out"]
    y = x_q.astype(jnp.float32) * ratio + b_over_so
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def qadd(node: Node, params, a_q, b_q) -> jax.Array:
    sa, sb, so = node.attrs["sa"], node.attrs["sb"], node.attrs["so"]
    y = a_q.astype(jnp.float32) * (sa / so) + b_q.astype(jnp.float32) * (sb / so)
    if node.attrs.get("relu"):
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def qconcat(node: Node, params, *xs) -> jax.Array:
    so = node.attrs["out_scale"]
    outs = []
    for x, si in zip(xs, node.attrs["in_scales"]):
        if abs(si - so) < 1e-12:
            outs.append(x)
        else:
            y = x.astype(jnp.float32) * (si / so)
            outs.append(jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8))
    return jnp.concatenate(outs, axis=node.attrs.get("axis", -1))
