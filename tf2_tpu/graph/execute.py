"""IR executor — interprets a Graph as a pure JAX function.

Reference parity: the FPGA host runtime walks the layer schedule enqueueing
device kernels per layer (SURVEY.md §4.3). Here the "schedule walk" happens
once at trace time: `execute(graph)` returns a pure fn(params, inputs) ->
outputs that XLA compiles whole — ping-pong buffers, fusion and scheduling
are the compiler's job, exactly as TPU-idiomatic design wants.

This module implements the FP32 / fake-quant reference semantics for every
op. The *quantized fused* ops (qconv2d/qdense/qadd) are dispatched through
`tf2_tpu.kernels.dispatch` which picks Pallas kernels on TPU with a jnp
fallback elsewhere.
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
from jax import lax

from .ir import Graph, Node

Params = Mapping[str, jax.Array]

# op name -> fn(node, params, *inputs) -> output
_OP_IMPLS: dict[str, Callable] = {}


def register_op(name: str):
    def deco(fn):
        _OP_IMPLS[name] = fn
        return fn
    return deco


def execute(graph: Graph, intermediates: bool = False):
    """Return fn(params, **inputs) -> outputs (tuple if multiple).

    With ``intermediates=True`` the function returns (outputs, dict of every
    value) — used by calibration to tap activation ranges (the JAX-traced
    analog of the reference's calibration forward hooks, SURVEY.md §4.1).
    """

    def fn(params: Params, **inputs):
        env: dict[str, jax.Array] = dict(inputs)
        for node in graph.nodes:
            impl = _OP_IMPLS.get(node.op)
            if impl is None:
                raise NotImplementedError(f"op {node.op!r} has no executor")
            args = [env[i] for i in node.inputs]
            # per-node profiler annotation (SURVEY.md §6.1): jax.profiler
            # traces attribute device time to "<op>:<node>" scopes
            with jax.named_scope(f"{node.op}:{node.name}"):
                env[node.name] = impl(node, params, *args)
        outs = tuple(env[o] for o in graph.outputs)
        result = outs[0] if len(outs) == 1 else outs
        if intermediates:
            return result, env
        return result

    return fn


def _pair(v) -> tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv_padding(padding, kh: int, kw: int):
    """Normalize padding attr to lax form."""
    if isinstance(padding, str):
        return padding
    p = [tuple(x) if isinstance(x, (list, tuple)) else (x, x) for x in padding]
    return p


@register_op("conv2d")
def _conv2d(node: Node, params: Params, x):
    w = params[node.params[0]]
    kh, kw = w.shape[0], w.shape[1]
    sh, sw = node.attrs.get("strides", [1, 1])
    groups = node.attrs.get("groups", 1)
    pad = conv_padding(node.attrs.get("padding", "SAME"), kh, kw)
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(sh, sw), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype != jnp.float64 else None,
    ).astype(x.dtype)
    if len(node.params) > 1:
        out = out + params[node.params[1]].astype(out.dtype)
    return out


@register_op("dense")
def _dense(node: Node, params: Params, x):
    w = params[node.params[0]]
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    out = out.astype(x.dtype)
    if len(node.params) > 1:
        out = out + params[node.params[1]].astype(out.dtype)
    return out


@register_op("batch_norm")
def _batch_norm(node: Node, params: Params, x):
    scale, offset, mean, var = (params[p].astype(jnp.float32) for p in node.params)
    eps = node.attrs.get("eps", 1e-5)
    inv = scale * lax.rsqrt(var + eps)
    return (x.astype(jnp.float32) * inv + (offset - mean * inv)).astype(x.dtype)


@register_op("layer_norm")
def _layer_norm(node: Node, params: Params, x):
    scale, offset = (params[p].astype(jnp.float32) for p in node.params)
    eps = node.attrs.get("eps", 1e-6)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * lax.rsqrt(var + eps) * scale + offset).astype(x.dtype)


@register_op("attention")
def _attention(node: Node, params: Params, x):
    """Standard MHSA for the ViT stretch config; small seq-len (197) so a
    plain XLA attention is fine; the Pallas fused path lives in kernels/."""
    wqkv, bqkv, wo, bo = (params[p] for p in node.params)
    heads = node.attrs["heads"]
    dim = node.attrs["dim"]
    hd = dim // heads
    n, t, _ = x.shape
    qkv = jnp.dot(x, wqkv.astype(x.dtype)) + bqkv.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(n, t, dim)
    return jnp.dot(out, wo.astype(x.dtype)) + bo.astype(x.dtype)


@register_op("attention_core")
def _attention_core(node: Node, params: Params, qkv):
    """Per-head QK^T → softmax → PV on a packed (N, T, 3*dim) qkv tensor.
    The projections live in separate dense nodes (models/vit.py) so they
    quantize via qdense; this core quantizes via qattention_core."""
    heads = node.attrs["heads"]
    dim = node.attrs["dim"]
    hd = dim // heads
    n, t, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(n, t, dim).astype(qkv.dtype)


@register_op("bias_add")
def _bias_add(node: Node, params: Params, x):
    return x + params[node.params[0]].astype(x.dtype)


@register_op("relu")
def _relu(node, params, x):
    return jnp.maximum(x, 0)


@register_op("relu6")
def _relu6(node, params, x):
    return jnp.clip(x, 0, 6)


@register_op("sigmoid")
def _sigmoid(node, params, x):
    return jax.nn.sigmoid(x)


@register_op("gelu")
def _gelu(node, params, x):
    return jax.nn.gelu(x)


@register_op("add")
def _add(node, params, a, b):
    return a + b


@register_op("mul")
def _mul(node, params, a, b):
    return a * b


@register_op("maxpool")
def _maxpool(node: Node, params, x):
    wh, ww = node.attrs["window"]
    sh, sw = node.attrs["strides"]
    pad = node.attrs.get("padding", "VALID")
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg = jnp.array(jnp.finfo(x.dtype).min, x.dtype)
    else:
        neg = jnp.array(jnp.iinfo(x.dtype).min, x.dtype)
    return lax.reduce_window(x, neg, lax.max, (1, wh, ww, 1), (1, sh, sw, 1), pad)


@register_op("avgpool")
def _avgpool(node: Node, params, x):
    wh, ww = node.attrs["window"]
    sh, sw = node.attrs["strides"]
    pad = node.attrs.get("padding", "VALID")
    xf = x.astype(jnp.float32)
    s = lax.reduce_window(xf, 0.0, lax.add, (1, wh, ww, 1), (1, sh, sw, 1), pad)
    if pad == "VALID":
        return (s / (wh * ww)).astype(x.dtype)
    ones = jnp.ones_like(xf[..., :1])
    cnt = lax.reduce_window(ones, 0.0, lax.add, (1, wh, ww, 1), (1, sh, sw, 1), pad)
    return (s / cnt).astype(x.dtype)


@register_op("global_avgpool")
def _global_avgpool(node, params, x):
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


@functools.lru_cache(maxsize=16)
def _lrn_band_kernel(c: int, r: int):
    """(1,1,C,C) f32 0/1 band matrix: win = sq @ band sums the 2r+1
    channel window as a 1x1 conv on the MXU."""
    import numpy as np
    band = np.zeros((1, 1, c, c), np.float32)
    for i in range(c):
        band[0, 0, max(0, i - r):i + r + 1, i] = 1.0
    return band  # numpy: becomes a trace-time constant at each use site


@register_op("lrn")
def _lrn(node: Node, params, x):
    r = node.attrs.get("radius", 2)
    alpha = node.attrs.get("alpha", 1e-4)
    beta = node.attrs.get("beta", 0.75)
    bias = node.attrs.get("bias", 1.0)
    xf = x.astype(jnp.float32)
    sq = jnp.square(xf)
    # Channel-window sum as a banded 1x1 conv: the channel axis is the
    # minormost (lane) dim in NHWC, and a lane-direction sliding
    # reduce_window is pathological on TPU — measured v5e-1 2026-08-21,
    # (64,56,56,192) whole-op A/B: reduce_window 3.90 ms, explicit
    # 5-term shifted-slice sum 3.17 ms, banded 1x1 conv 1.16 ms (3.3x;
    # max |err| 3.1e-5 from the f32 conv's bf16 3-pass decomposition).
    # The band matrix is a compile-time constant; MXU eats the window.
    win = lax.conv_general_dilated(
        sq, _lrn_band_kernel(sq.shape[-1], r), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    t = bias + alpha * win
    if abs(beta - 0.75) < 1e-12:
        # t^-0.75 = rsqrt(t) * sqrt(rsqrt(t)): 3 cheap VPU ops instead of
        # pow's exp(0.75*log(t)) transcendental pair. On GoogLeNet b64 the
        # two LRN layers cost 2.89 ms of a 6.67 ms step with pow
        # (PROFILE_TRACE_googlenet.json, v5e-1 2026-08-21) — the pow is
        # the entire sink; beta=0.75 is the canonical LRN exponent
        # (AlexNet/GoogLeNet) so this path covers the whole zoo.
        rs = lax.rsqrt(t)
        return (xf * rs * jnp.sqrt(rs)).astype(x.dtype)
    return (xf / jnp.power(t, beta)).astype(x.dtype)


@register_op("concat")
def _concat(node: Node, params, *xs):
    return jnp.concatenate(xs, axis=node.attrs.get("axis", -1))


@register_op("reshape")
def _reshape(node: Node, params, x):
    return x.reshape(node.attrs["shape"])


@register_op("flatten")
def _flatten(node, params, x):
    return x.reshape(x.shape[0], -1)


@register_op("transpose")
def _transpose(node: Node, params, x):
    return x.transpose(node.attrs["perm"])


@register_op("pad")
def _pad(node: Node, params, x):
    return jnp.pad(x, [tuple(p) for p in node.attrs["pads"]])


@register_op("space_to_depth")
def _space_to_depth(node: Node, params, x):
    """NHWC block-2 rearrange, batch-polymorphic (no hard batch dim in
    attrs). Channel order of the output is (dy, dx, c) — the stem
    space-to-depth pass (graph/optimize.py) packs weights to match."""
    b_, h, w, c = x.shape
    blk = node.attrs.get("block", 2)
    x = x.reshape(b_, h // blk, blk, w // blk, blk, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b_, h // blk, w // blk, blk * blk * c)


@register_op("slice_c")
def _slice_c(node: Node, params, x):
    return lax.slice_in_dim(x, node.attrs["lo"], node.attrs["hi"], axis=-1)


@register_op("prepend_token")
def _prepend_token(node: Node, params, x):
    tok = params[node.params[0]].astype(x.dtype)
    b = x.shape[0]
    return jnp.concatenate([jnp.broadcast_to(tok, (b, 1, x.shape[-1])), x],
                           axis=1)


@register_op("take_token")
def _take_token(node: Node, params, x):
    return x[:, node.attrs.get("idx", 0), :]


@register_op("softmax")
def _softmax(node, params, x):
    return jax.nn.softmax(x, axis=-1)


@register_op("dropout")
def _dropout(node, params, x):
    return x  # inference engine: dropout is identity


@register_op("identity")
def _identity(node, params, x):
    return x
