"""Fused INT8 attention-core Pallas TPU kernel (SURVEY.md §6.7; VERDICT r2
item 6 — this is the kernel dispatch.py names as the Pallas home of
``qattention_core``).

Semantics are pinned, element-for-element, to the jnp reference path in
kernels/dispatch.qattention_core:

    q, k, v  = split(qkv, 3, axis=-1)          # int8, per-head hd = dim/heads
    logits   = (QK^T)_i32 · s_in² / sqrt(hd)   # int8×int8→int32 on the MXU
    probs    = softmax_f32(logits)
    p_q      = round(probs · 127)  -> int8     # fixed 1/127 prob scale
    acc      = (P V)_i32                       # int8×int8→int32 on the MXU
    y_q      = clip(round(acc · s_in/(127·s_out)), ±127) -> int8

Design: one grid step processes a BATCH BLOCK of images across ALL heads
(static python loop over heads — heads are data-independent). Per head the
two matmuls run as bb-batched dots so the MXU sees (bb·T, hd)-scale work
per issue instead of 196×64 crumbs; the softmax row mask handles the
sublane padding of T (196 for ViT-B/16 is not a multiple of 8 — padded
key rows produce garbage logits columns which the mask sends to exp→0, so
padded V rows are multiplied by exact zeros).

VMEM working set per step (bb=8, ViT-B/16): qkv block 3.6 MB int8 +
per-head f32 logits 1.2 MB + output 1.2 MB — comfortably inside budget.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 9 * 1024 * 1024  # bb=4 at ViT-B/16 b64; a 13M budget
# admitting bb=8 measured EQUAL (272.9 vs 273.3 us, r5) — keep the
# smaller working set
_NEG = -1e30  # softmax mask value: avoids -inf NaN rows in sublane padding


def _qattn_kernel(qkv_ref, o_ref, *, heads: int, dim: int, t: int,
                  s_in: float, s_out: float):
    bb = qkv_ref.shape[0]
    hd = dim // heads
    qk_scale = jnp.float32(s_in * s_in / (hd ** 0.5))
    pv_scale = jnp.float32(s_in / (127.0 * s_out))
    # key-column validity mask over the (possibly sublane-padded) T axis
    col = lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
    for h in range(heads):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd]                  # (bb, t, hd)
        k = qkv_ref[:, :, dim + h * hd:dim + (h + 1) * hd]
        v = qkv_ref[:, :, 2 * dim + h * hd:2 * dim + (h + 1) * hd]
        logits = lax.dot_general(
            q, k, ((( 2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32).astype(jnp.float32) * qk_scale
        logits = jnp.where(col < t, logits, jnp.float32(_NEG))
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        # one fused scale: 127/sum as a reciprocal multiply (saves a full
        # (bb,t,t) VPU pass vs divide-then-multiply; r5)
        p_q = jnp.round(e * (127.0 / jnp.sum(e, axis=-1, keepdims=True))
                        ).astype(jnp.int8)                      # (bb, t, t)
        acc = lax.dot_general(
            p_q, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                   # (bb, t, hd)
        y = acc.astype(jnp.float32) * pv_scale
        o_ref[:, :, h * hd:(h + 1) * hd] = jnp.clip(
            jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _pick_bb(n: int, t: int, dim: int, heads: int) -> int:
    """Largest divisor of n (≤ 16) whose working set fits the budget."""
    hd = dim // heads
    best = 1
    for bb in range(1, min(n, 16) + 1):
        if n % bb:
            continue
        work = (2 * bb * t * 3 * dim          # qkv block (dbl-buffered)
                + 2 * bb * t * dim            # out block (dbl-buffered)
                + bb * t * t * 5              # f32 logits + int8 probs
                + bb * t * hd * 4)            # int32 acc
        if work <= _VMEM_BUDGET:
            best = bb
    return best


@functools.partial(jax.jit, static_argnames=("heads", "dim", "s_in", "s_out",
                                             "interpret"))
def _qattn_call(qkv_q, *, heads: int, dim: int, s_in: float, s_out: float,
                interpret: bool = False):
    n, t, three_dim = qkv_q.shape
    bb = _pick_bb(n, t, dim, heads)
    return pl.pallas_call(
        functools.partial(_qattn_kernel, heads=heads, dim=dim, t=t,
                          s_in=s_in, s_out=s_out),
        grid=(n // bb,),
        in_specs=[pl.BlockSpec((bb, t, three_dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, t, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, dim), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * heads * (2 * t * t * (dim // heads)),
            bytes_accessed=n * t * 3 * dim + n * t * dim,
            transcendentals=n * heads * t * t),
        interpret=interpret,
    )(qkv_q)


def fused_qattention(qkv_q: jax.Array, heads: int, dim: int, s_in: float,
                     s_out: float, interpret: bool = False):
    """qkv_q (N, T, 3·dim) int8 -> (N, T, dim) int8, or None if the shape
    is outside kernel coverage (dispatch falls back to the jnp path)."""
    if qkv_q.ndim != 3 or qkv_q.shape[-1] != 3 * dim:
        return None
    if dim % heads:
        return None
    n, t, _ = qkv_q.shape
    hd = dim // heads
    if hd % 2 or t > 4096:
        return None
    # a single head's logits must fit VMEM even at bb=1
    if t * t * 5 + 2 * t * 3 * dim + 2 * t * dim + t * hd * 4 > _VMEM_BUDGET:
        return None
    return _qattn_call(qkv_q, heads=heads, dim=dim, s_in=float(s_in),
                       s_out=float(s_out), interpret=interpret)
