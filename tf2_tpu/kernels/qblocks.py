"""Fused residual-bottleneck CHAIN kernel — N stride-1 bottleneck blocks
(1x1 -> 3x3 -> 1x1 -> residual add, ResNet conv2_x..conv5_x interiors)
executed back-to-back in VMEM, one image per grid step.

Why (v5e-1 profile, 2026-08-20, ResNet-50 b64): the stride-1 interior
blocks cost ~1.7 ms of the 3.45 ms step under XLA. XLA already fuses
3x3+1x1+add per block, but every BLOCK boundary still round-trips the
full feature map through HBM — and C<128 stages pay a 2x lane-padding
tax on every trip. The per-op Pallas kernels measured even worse
(BASELINE.md §3.6): each call re-pays an XLA-side pad, a boundary layout
copy, and an HBM round-trip per conv. Chaining the whole block sequence
inside one kernel eliminates every intermediate HBM trip: the stage
reads its input once and writes its output once.

Data layout — padded-flat feature maps, (HP*WP, C) int8 per image:
    HP = H + 2, WP = W + 8 (pad top/bottom 1 row, left/right 4 cols;
    WP is a sublane multiple so 3x3 row taps are aligned slices).
The caller pads+reshapes the stage input ONCE in XLA (pad_in/unpad_out)
and the chain keeps the layout between blocks, so chained blocks have
ZERO XLA glue. Pad positions are re-zeroed before each 3x3 (the c1
epilogue bias makes them nonzero; see _interior_mask).

Per block, all in-register / VMEM:
    h  = relu-epilogue(x @ w1)            # 1x1, int8
    h  = mask(h); build rot[-1,0,+1]      # aligned-tap machinery
    a2 = sum_taps rot[dx][dy-shift] @ w2[dy,dx]   # 3x3 SAME, int32
    g  = relu-epilogue(a2)                # int8
    y3 = epilogue(g @ w3)                 # 1x1, no relu (int-valued f32)
    r  = x  (identity)  or  epilogue(x @ wd)      # optional downsample
    x  = clip(round(y3*(sa/so) + r*(sb/so)))      # qadd (+relu), int8
Bit-exact vs the node-by-node executor: int32 accumulation everywhere,
and the c3/qadd DOUBLE rounding is reproduced exactly.

Integration: graph/optimize.fuse_bottleneck_chains rewrites matching
node chains into a `qblockchain` node at engine load; the executor
dispatches here on TPU and to reference_chain (same math, jnp) off-TPU.

MEASURED VERDICT (v5e-1, 2026-08-21, ResNet-50 b64, checked two-point,
interleaved single-process A/B, bit-exact parity in every run):
baseline 3.456 ms; s1-only chain 3.973; s2-only 4.170; s3-only 4.276;
all four chains 6.023 ms. Every chain LOSES ~0.5-0.8 ms despite
eliminating its HBM round-trips. Diagnosis: Mosaic materializes the
full-size f32 epilogue intermediates (scale/bias/round/clip + masks,
~6 MB per block per image at stage 1) in VMEM between ops, where XLA's
conv emitter streams the same epilogue through registers during MXU
output drain; int8<->f32 conversions add (4,1)-packing relayouts on
top. Third independent design to hit this wall (per-op qconv,
BASELINE.md §3.6; qstem.py) — the measured-truth routing (all-XLA)
stands. Kept off by default (Engine(block_fusion=True) to reproduce).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_T, PAD_L = 1, 4   # top rows, left cols of the padded-flat layout


def pad_geometry(h: int, w: int) -> tuple[int, int]:
    # WP must be a multiple of 8 so the per-dy row offsets (dy-1)*WP of
    # the 3x3 taps are Mosaic-aligned sublane slices (extra right-pad
    # columns are masked/unpadded away like the rest)
    wp = -(-(w + 8) // 8) * 8
    return h + 2, wp


def pad_in(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, HP*WP, C] padded-flat (XLA, once per chain)."""
    b, h, w, c = x.shape
    hp, wp = pad_geometry(h, w)
    xp = jnp.pad(x, ((0, 0), (PAD_T, hp - h - PAD_T),
                     (PAD_L, wp - w - PAD_L), (0, 0)))
    return xp.reshape(b, hp * wp, c)


def unpad_out(y: jax.Array, h: int, w: int) -> jax.Array:
    """[B, HP*WP, C] -> [B, H, W, C]."""
    b, m, c = y.shape
    hp, wp = pad_geometry(h, w)
    return y.reshape(b, hp, wp, c)[:, PAD_T:PAD_T + h, PAD_L:PAD_L + w, :]


def _interior_mask(hp: int, wp: int, h: int, w: int):
    """(HP*WP, 1) bool: True on real pixels, False on padding."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp * wp, 1), 0)
    y = rows // wp
    x = rows % wp
    return ((y >= PAD_T) & (y < PAD_T + h)
            & (x >= PAD_L) & (x < PAD_L + w))


def _epi(acc, es, eb, relu: bool):
    y = acc.astype(jnp.float32) * es + eb
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127.0, 127.0)


def _qblockchain_kernel(x_ref, *refs, blocks: tuple, hp: int, wp: int,
                        h: int, w: int):
    """x_ref: (1, HP*WP, Cin) int8. refs: flattened per-block params —
    for each block: w1,es1,eb1, w2(9,Cm,Cm),es2,eb2, w3,es3,eb3,
    [wd,esd,ebd if down], saso, sbso — then the output ref last.
    blocks: per-block static meta dicts (keys: cm, cout, down, relu)."""
    out_ref = refs[-1]
    m = hp * wp
    x = x_ref[0]                                   # (M, Cin) int8
    mask = _interior_mask(hp, wp, h, w)
    it = iter(refs[:-1])

    for blk in blocks:
        w1 = next(it); es1 = next(it); eb1 = next(it)
        w2 = next(it); es2 = next(it); eb2 = next(it)
        w3 = next(it); es3 = next(it); eb3 = next(it)
        if blk["down"]:
            wd = next(it); esd = next(it); ebd = next(it)
        saso = next(it); sbso = next(it)

        acc1 = jax.lax.dot_general(
            x, w1[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        hmat = _epi(acc1, es1[:], eb1[:], True)
        hmat = jnp.where(mask, hmat, 0.0).astype(jnp.int8)  # re-zero pads

        # 3x3 tap machinery: extend by one pad row-of-rows top+bottom,
        # materialize the two lane... sublane-misaligned dx shifts ONCE,
        # then every tap (dy, dx) is an ALIGNED row slice (WP | 8)
        cm = hmat.shape[1]
        z = jnp.zeros((wp, cm), jnp.int8)
        hext = jnp.concatenate([z, hmat, z], 0)     # (M + 2*WP, Cm)
        rot = {
            0: jnp.concatenate([z[:1], hext[:-1]], 0),   # shift +1 (dx=-1)
            1: hext,
            2: jnp.concatenate([hext[1:], z[:1]], 0),    # shift -1 (dx=+1)
        }
        acc2 = None
        for dy in range(3):
            base = dy * wp
            for dx in range(3):
                tap = rot[dx][base:base + m]
                d = jax.lax.dot_general(
                    tap, w2[dy * 3 + dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc2 = d if acc2 is None else acc2 + d
        g = jnp.where(mask, _epi(acc2, es2[:], eb2[:], True), 0.0
                      ).astype(jnp.int8)

        acc3 = jax.lax.dot_general(
            g, w3[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y3 = _epi(acc3, es3[:], eb3[:], False)      # int-valued f32

        if blk["down"]:
            accd = jax.lax.dot_general(
                x, wd[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            r = _epi(accd, esd[:], ebd[:], False)
        else:
            r = x.astype(jnp.float32)
        ysum = y3 * saso[0, 0] + r * sbso[0, 0]
        if blk["relu"]:
            ysum = jnp.maximum(ysum, 0.0)
        x = jnp.clip(jnp.round(ysum), -127.0, 127.0).astype(jnp.int8)

    out_ref[0] = x


def _flatten_block_params(blocks_np) -> tuple[list, tuple]:
    """blocks_np: list of dicts with numpy arrays -> (operand list, static
    meta tuple). w2 is reshaped HWIO (3,3,Cm,Cm) -> (9, Cm, Cm)."""
    ops = []
    meta = []
    for b in blocks_np:
        cm = b["w1"].shape[1]
        cout = b["w3"].shape[1]
        ops += [b["w1"], b["es1"].reshape(1, -1), b["eb1"].reshape(1, -1),
                b["w2"].reshape(9, cm, cm),
                b["es2"].reshape(1, -1), b["eb2"].reshape(1, -1),
                b["w3"], b["es3"].reshape(1, -1), b["eb3"].reshape(1, -1)]
        down = "wd" in b
        if down:
            ops += [b["wd"], b["esd"].reshape(1, -1),
                    b["ebd"].reshape(1, -1)]
        ops += [np.float32(b["sa_over_so"]).reshape(1, 1),
                np.float32(b["sb_over_so"]).reshape(1, 1)]
        meta.append({"cm": cm, "cout": cout, "down": down,
                     "relu": bool(b["relu"])})
    return ops, tuple(tuple(sorted(m.items())) for m in meta)


@functools.partial(jax.jit, static_argnames=("meta", "h", "w", "interpret"))
def _qblockchain_call(x_flat, *ops, meta, h: int, w: int, interpret=False):
    blocks = tuple(dict(m) for m in meta)
    b, m, cin = x_flat.shape
    hp, wp = pad_geometry(h, w)
    cout = blocks[-1]["cout"]
    kern = functools.partial(_qblockchain_kernel, blocks=blocks, hp=hp,
                             wp=wp, h=h, w=w)
    in_specs = [pl.BlockSpec((1, m, cin), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for op in ops:
        nd = op.ndim
        in_specs.append(pl.BlockSpec(op.shape,
                                     (lambda i, _nd=nd: (0,) * _nd),
                                     memory_space=pltpu.VMEM))
    flops = 0
    k = cin  # running input-channel count: block i+1 reads block i's cout
    for blk in blocks:
        cm, co = blk["cm"], blk["cout"]
        flops += 2 * m * (cm * k + 9 * cm * cm + cm * co)
        if blk["down"]:
            flops += 2 * m * k * co
        k = co
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, m, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, cout), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops * b,
            bytes_accessed=x_flat.size + b * m * cout
            + sum(int(np.prod(o.shape)) for o in ops),
            transcendentals=0),
        interpret=interpret,
    )(x_flat, *ops)


_VMEM_BUDGET = 14 << 20  # ~16 MiB/core minus headroom for Mosaic temps


def covers(shape: tuple, blocks_np) -> bool:
    """Working-set bound: will one grid step (one image) of this chain fit
    VMEM? Mirrors qstem.covers so dispatch's XLA fallback is reachable for
    oversized chains instead of a Mosaic compile-time OOM (ADVICE r3).

    Per-image estimate: padded in/out maps + the widest block's live
    intermediates (f32 epilogue copy + int32 accumulator + the 3 rot tap
    views in int8 + a 2x-cout f32 add chain) + all resident weights."""
    b, h, w, cin = shape
    hp, wp = pad_geometry(h, w)
    m = hp * wp
    cout = blocks_np[-1]["w3"].shape[1]
    wbytes = 0
    for blk in blocks_np:
        for key in ("w1", "w2", "w3", "wd"):
            if key in blk:
                wbytes += int(np.prod(np.shape(blk[key])))
    per_block = 0
    for blk in blocks_np:
        cm = blk["w1"].shape[1]
        co = blk["w3"].shape[1]
        per_block = max(per_block, m * cm * (4 + 4 + 3) + m * co * 8)
    est = m * (cin + cout) + per_block + wbytes
    return est <= _VMEM_BUDGET


def fused_qblockchain(x: jax.Array, blocks_np, *, interpret=False):
    """x: [B, H, W, Cin] int8; blocks_np: list of per-block param dicts
    (w1/es1/eb1, w2 HWIO 3x3, es2/eb2, w3/es3/eb3, optional wd/esd/ebd,
    sa_over_so, sb_over_so, relu). Returns [B, H, W, Cout] int8, or None
    when the chain's working set exceeds VMEM (caller falls back to the
    jnp/XLA reference path)."""
    b, h, w, cin = x.shape
    if not covers(x.shape, blocks_np):
        return None
    ops, meta = _flatten_block_params(blocks_np)
    xf = pad_in(x)
    y = _qblockchain_call(xf, *[jnp.asarray(o) for o in ops], meta=meta,
                          h=h, w=w, interpret=interpret)
    return unpad_out(y, h, w)


def reference_chain(x: jax.Array, blocks_np) -> jax.Array:
    """Same math, plain jnp (the off-TPU executor path and the parity
    reference). Bit-identical to the kernel by construction."""
    for b in blocks_np:
        from jax import lax
        acc1 = jnp.dot(x, jnp.asarray(b["w1"]),
                       preferred_element_type=jnp.int32)
        h = _epi(acc1, jnp.asarray(b["es1"]), jnp.asarray(b["eb1"]), True
                 ).astype(jnp.int8)
        acc2 = lax.conv_general_dilated(
            h, jnp.asarray(b["w2"]), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        g = _epi(acc2, jnp.asarray(b["es2"]), jnp.asarray(b["eb2"]), True
                 ).astype(jnp.int8)
        acc3 = jnp.dot(g, jnp.asarray(b["w3"]),
                       preferred_element_type=jnp.int32)
        y3 = _epi(acc3, jnp.asarray(b["es3"]), jnp.asarray(b["eb3"]), False)
        if "wd" in b:
            accd = jnp.dot(x, jnp.asarray(b["wd"]),
                           preferred_element_type=jnp.int32)
            r = _epi(accd, jnp.asarray(b["esd"]), jnp.asarray(b["ebd"]),
                     False)
        else:
            r = x.astype(jnp.float32)
        y = y3 * np.float32(b["sa_over_so"]) + r * np.float32(b["sb_over_so"])
        if b["relu"]:
            y = jnp.maximum(y, 0.0)
        x = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    return x
