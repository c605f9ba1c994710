"""Executors for quantized/fused ops — registered into the graph executor,
implemented by kernels.dispatch (Pallas on TPU, jnp reference elsewhere)."""
from __future__ import annotations

import importlib

import jax.numpy as jnp

from .execute import register_op


class _LazyDispatch:
    """Defers the kernels import so graph<->kernels imports can't cycle."""

    def __getattr__(self, name):
        mod = importlib.import_module("tf2_tpu.kernels.dispatch")
        return getattr(mod, name)


dispatch = _LazyDispatch()


@register_op("quantize")
def _quantize(node, params, x):
    s = node.attrs["scale"]
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)


@register_op("dequantize")
def _dequantize(node, params, x):
    return x.astype(jnp.float32) * node.attrs["scale"]


@register_op("qconv2d")
def _qconv2d(node, params, x):
    return dispatch.qconv2d(node, params, x)


@register_op("qdense")
def _qdense(node, params, x, r=None):
    return dispatch.qdense(node, params, x, r)


@register_op("qattention_core")
def _qattention_core(node, params, qkv):
    return dispatch.qattention_core(node, params, qkv)


@register_op("qadd")
def _qadd(node, params, a, b):
    return dispatch.qadd(node, params, a, b)


@register_op("qblockchain")
def _qblockchain(node, params, x):
    return dispatch.qblockchain(node, params, x)


@register_op("qconcat")
def _qconcat(node, params, *xs):
    return dispatch.qconcat(node, params, *xs)


@register_op("qlrn")
def _qlrn(node, params, x):
    return dispatch.qlrn(node, params, x)


@register_op("qgelu")
def _qgelu(node, params, x):
    return dispatch.qgelu(node, params, x)


@register_op("qlayernorm")
def _qlayernorm(node, params, x):
    return dispatch.qlayernorm(node, params, x)


@register_op("qbias_add")
def _qbias_add(node, params, x):
    return dispatch.qbias_add(node, params, x)
