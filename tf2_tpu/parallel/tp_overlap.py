"""Manually overlapped tensor-parallel matmul (SURVEY.md §8 hard-part 5;
VERDICT r2 item 9's prototype ask).

The TP layout (parallel/mesh.py) shards every layer's OUTPUT channels, so
layer L+1 needs layer L's channel shards all-gathered. GSPMD emits
all_gather(y) -> matmul as two serial phases; the classic collective-matmul
decomposition instead rides the gather chunks through a ring and issues a
partial matmul per hop, so the (k+1)-th chunk's ppermute overlaps the k-th
chunk's MXU work (XLA's latency-hiding scheduler hoists the async permute
start above the dot):

    acc_0   = y_local @ w_rows(self)
    chunk   = ppermute(y_local);  acc_1 = acc_0 + chunk @ w_rows(prev) ...

Semantics are exactly ``all_gather(y, tp) @ w`` with w row-sharded over
tp; parity is pinned by tests/dist/test_tp_overlap.py and the speed A/B
vs GSPMD is recorded by bench/tp_overlap_bench.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

shard_map = jax.shard_map


def _ring_body(i, carry, *, axis: str, n: int, w_full_rows):
    """One hop: multiply the chunk currently held, then pass it left."""
    acc, chunk = carry
    # chunk originated on device (self + i) mod n -> its rows of w
    idx = (lax.axis_index(axis) + i) % n
    kc = w_full_rows.shape[0] // n
    w_rows = lax.dynamic_slice_in_dim(w_full_rows, idx * kc, kc, axis=0)
    acc = acc + jnp.dot(chunk, w_rows, preferred_element_type=acc.dtype)
    perm = [(s, (s - 1) % n) for s in range(n)]
    chunk = lax.ppermute(chunk, axis, perm)
    return acc, chunk


def allgather_matmul(cfg, y_sharded: jax.Array, w: jax.Array,
                     acc_dtype=jnp.float32) -> jax.Array:
    """Compute all_gather(y, tp) @ w with ring-overlapped chunks.

    y_sharded: (M, K) with K sharded over cfg's tp axis (layer L's
    channel-sharded output). w: (K, N) replicated or K-row-sharded — the
    kernel slices the rows it needs per hop. Returns (M, N) replicated
    over tp (each device computes the full product — matching what GSPMD
    produces for the next output-channel-sharded layer's input).
    """
    axis = cfg.tp_axis
    n = cfg.tp

    def inner(y_local, w_full):
        m = y_local.shape[0]
        acc = jnp.zeros((m, w_full.shape[1]), acc_dtype)
        body = functools.partial(_ring_body, axis=axis, n=n, w_full_rows=w_full)
        acc, _ = lax.fori_loop(0, n, body, (acc, y_local), unroll=True)
        return acc

    return shard_map(
        inner, mesh=cfg.mesh,
        in_specs=(P(None, axis), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,  # lax.axis_index-dependent slicing defeats the
        # varying-manual-axes checker; the parity tests pin correctness
    )(y_sharded, w)


def gspmd_matmul(cfg, y_sharded: jax.Array, w: jax.Array,
                 acc_dtype=jnp.float32) -> jax.Array:
    """The GSPMD baseline: same math, sharding-annotated dot — XLA inserts
    the all_gather itself (serial gather -> matmul)."""
    out = jnp.dot(y_sharded, w, preferred_element_type=acc_dtype)
    return jax.lax.with_sharding_constraint(
        out, cfg.named(None, None))
