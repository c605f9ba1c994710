"""General fused shift-quantized conv Pallas TPU kernel.

THE device kernel of the runtime (reference parity: the FPGA conv PE array
with shift-add MACs, SURVEY.md §3 R7; redesigned per VERDICT r1 item 1).

The int32 accumulator lives in VMEM and int8 comes out directly, with the
whole epilogue (scale · acc + bias, ReLU, round, clip) in-register — the
TPU analog of the reference's conv→BN/ReLU→requant FIFO chain being one
streaming pipeline. (XLA's TPU conv emitter also fuses the epilogue —
confirmed by a 2026-08-19 jax.profiler trace — so the contest is purely
kernel quality; measured chip ceilings: ~234 TOP/s effective int8 via
MXU, ~611 GB/s HBM RMW.)

Design (differences from round 1's shift_conv.py, per VERDICT r1):
- Covers EVERY conv shape in the zoo: any (kh, kw), stride 1 and 2, SAME /
  VALID / explicit padding, ragged channel counts — no silent fallback for
  the 7x7 stem or stride-2 downsamples.
- Stride-1 KxK convs run as CONTIGUOUS-ROW implicit GEMM over the
  flattened (PH·PW, C) view with per-dx pre-rotated VMEM copies
  (_qconv_s1_kernel); stride-2 convs run on a phase-folded
  (PH/2, PW, 2C) free view (_qconv_s2_kernel); 1x1 stride-1 delegates to
  the matmul kernel. Each grid step is one accumulate+epilogue so Mosaic
  pipelines fetches/stores across steps.
- Grid order (batch, row-block, cout-tile) with the FULL decoded weight
  tensor resident in VMEM: the input block is fetched once per batch
  tile (a cout-outer grid refetched activations per tile — up to 8×
  input HBM traffic on deep layers).
- cin < 128 layers build an in-VMEM im2col patch matrix per row block so
  the MXU contracts K = kh·kw·cin per dot instead of wasting
  ≥ (128−cin) lanes per tap.
- 4-bit PoT weights decode once per call into the VMEM scratch
  (sign·2^(m−1) on the VPU — the literal ShiftCNN "shift"), then feed the
  MXU as int8 for every grid step; int8 weights skip decode.

Packed layout: split-half 2 codes/byte along K (transform/potq.pack_codes)
so decode is two nibble-extracts + a sublane-contiguous concat.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shift_matmul import _decode_pot

# VMEM working-set budget for block-size selection. The chip has ~16 MB more
# Mosaic needs headroom for stack/staging (round 1 measured compile-time OOM
# at a 12 MB budget on this machine).
_VMEM_BUDGET = 9 * 1024 * 1024


def _pad_amount(size: int, k: int, stride: int) -> tuple[int, int]:
    """TF-style SAME padding."""
    out = -(-size // stride)
    total = max((out - 1) * stride + k - size, 0)
    return total // 2, total - total // 2


def resolve_pads(padding, kh: int, kw: int, sh: int, sw: int,
                 h: int, w: int):
    """-> ((ph0, ph1), (pw0, pw1)) for SAME/VALID/explicit paddings."""
    if isinstance(padding, str):
        if padding.upper() == "VALID":
            return (0, 0), (0, 0)
        return _pad_amount(h, kh, sh), _pad_amount(w, kw, sw)
    (ph0, ph1), (pw0, pw1) = padding
    return (ph0, ph1), (pw0, pw1)


def _out_size(size: int, k: int, s: int, p0: int, p1: int) -> int:
    return (size + p0 + p1 - k) // s + 1


def _decode_step(wp_ref, wdec_ref, wfmt: str):
    """Decode ALL cout tiles' packed PoT weights into the VMEM scratch —
    once per pallas_call (first grid step): wdec[j] = int8 weights of cout
    tile j. Full-weight residency lets the grid iterate cout FASTEST so
    the input block is fetched once per batch tile (the cout-outer grid
    refetched activations per tile — up to 8× input HBM traffic on deep
    layers, measured 2026-08-19)."""
    n_cout, k, bn = wdec_ref.shape
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))
    def _():
        for j in range(n_cout):
            if wfmt == "pot4":
                p = wp_ref[:, j * bn:(j + 1) * bn].astype(jnp.int32)
                wdec_ref[j] = jnp.concatenate(
                    [_decode_pot(p & 0xF), _decode_pot((p >> 4) & 0xF)],
                    axis=0)
            else:
                wdec_ref[j] = wp_ref[:, j * bn:(j + 1) * bn]


def _qconv_s1_kernel(x_ref, wp_ref, es_ref, eb_ref, o_ref, wdec_ref,
                     *rot_refs, kh: int, kw: int, cin: int, pw: int,
                     relu: bool, wfmt: str, im2col: bool):
    """Stride-1 conv as a CONTIGUOUS-ROW implicit GEMM.

    Key idea: with the padded image flattened to X2 = (PH·PW, C), output
    position (r, x) reads X2[(r+dy)·PW + (x+dx)] for tap (dy, dx) — a
    UNIFORM shift. Computing a row block over all x ∈ [0, PW) (not just
    [0, OW)) makes every tap a single contiguous dynamic row-slice of
    X2 — no 4D reshapes, no per-row relayouts (which measured 4–11× off
    SOL in the blocked-4D variant). The (PW−OW)/PW extra columns (≤7–13%
    for the zoo) are computed and discarded by one small output slice.
    For 1×1 convs PW == OW: zero waste, a pure GEMM.

    Alignment/rotation strategy: Mosaic requires dynamic sublane offsets
    ≡ 0 (mod 8). The wrapper pads PW to a multiple of 8 so base and dy·PW
    are aligned; the dx ∈ [1, kw) shifts are materialized ONCE per input
    block into VMEM scratches (``rot_refs``, rot[dx-1][q] = X2[q+dx]) and
    amortized over every row-block and dy — per-tap sublane rotations of
    the (M, C) patch measured as expensive as the MXU dot itself at
    BN=128 (2026-08-19).

    x_ref:  (BB, PH·PW, C) int8; o_ref: (BB, BH, OW, BN) int8
    wp_ref: (K/2, COUTp) packed pot4 or (K, COUTp) int8
    wdec_ref: (N_COUT, K, BN) scratch — full decoded weights
    Grid (n_batch, n_rowblk, n_cout), cout fastest: x fetched once per
    batch tile, rotations amortized over every (rowblk, cout) step.
    """
    _decode_step(wp_ref, wdec_ref, wfmt)
    bb, bh, ow, bn = o_ref.shape
    nb = x_ref.shape[1]
    mp = bb * bh * pw
    base = pl.program_id(1) * bh * pw
    j = pl.program_id(2)

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _rotate():
        # one whole-block shift per dx; tail rows stay garbage — they are
        # only read into the discarded wrap columns (x >= OW)
        for dx in range(1, kw):
            rot_refs[dx - 1][:, :nb - dx, :] = x_ref[:, dx:, :]

    def tap(dy, dx):
        ref = x_ref if dx == 0 else rot_refs[dx - 1]
        start = pl.multiple_of(base + dy * pw, 8)
        return ref[:, pl.ds(start, bh * pw), :].reshape(mp, cin)

    if im2col:
        patches = jnp.concatenate(
            [tap(dy, dx) for dy in range(kh) for dx in range(kw)], axis=1)
        acc = jnp.dot(patches, wdec_ref[j],
                      preferred_element_type=jnp.int32)
    else:
        acc = jnp.zeros((mp, bn), jnp.int32)
        for dy in range(kh):
            for dx in range(kw):
                wt = wdec_ref[j, (dy * kw + dx) * cin:
                              (dy * kw + dx + 1) * cin, :]
                acc += jnp.dot(tap(dy, dx), wt,
                               preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es_ref[:] + eb_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    y = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    y = y.reshape(bb, bh, pw, bn)
    o_ref[:] = y if pw == ow else y[:, :, :ow, :]


def _qconv_s2_kernel(x_ref, wp_ref, es_ref, eb_ref, o_ref, wdec_ref, *,
                     kh: int, kw: int, cin: int, relu: bool, wfmt: str,
                     im2col: bool):
    """Stride-2 conv on a PHASE-FOLDED input view.

    The wrapper reshapes the padded image (PH, PW, C) — for free, it is a
    contiguous view — to X'' = (PH/2, PW, 2C) where
    ``X''[R, (hp)*PW/2 + q, (wp)*C + c] = x[2R + hp, 2q + wp, c]``:
    both stride-2 phases of H land side by side on the sublane axis and
    both W phases on the LANE axis. A stride-2 tap (dy, dx) then reads

        X''[r + dy//2, (dy%2)*PW/2 + dx//2 + x, (dx%2)*C + c]

    — a plain slice whose lane offset is a multiple of C (free for
    C ≥ 128) and whose sublane offset is misaligned only when dx ≥ 2
    (one relayout for a third of a 3x3's taps, none for 1x1). This
    replaced reshape-and-drop subsampling, which paid two whole-value
    relayouts per tap (measured 6.8× off SOL).

    x_ref: (BB, PH/2, PW, 2C) int8; o_ref: (BB, BH, OW, BN) int8.
    Grid (n_batch, n_rowblk, n_cout), cout fastest.
    """
    _decode_step(wp_ref, wdec_ref, wfmt)
    bb, bh, ow, bn = o_ref.shape
    pw2 = x_ref.shape[2] // 2
    m = bb * bh * ow
    oh0 = pl.program_id(1) * bh
    j = pl.program_id(2)

    def tap(dy, dx):
        rows = x_ref[:, pl.ds(oh0 + dy // 2, bh), :, :]
        w0 = (dy % 2) * pw2 + dx // 2
        c0 = (dx % 2) * cin
        return rows[:, :, w0:w0 + ow, c0:c0 + cin].reshape(m, cin)

    if im2col:
        patches = jnp.concatenate(
            [tap(dy, dx) for dy in range(kh) for dx in range(kw)], axis=1)
        acc = jnp.dot(patches, wdec_ref[j],
                      preferred_element_type=jnp.int32)
    else:
        acc = jnp.zeros((m, bn), jnp.int32)
        for dy in range(kh):
            for dx in range(kw):
                wt = wdec_ref[j, (dy * kw + dx) * cin:
                              (dy * kw + dx + 1) * cin, :]
                acc += jnp.dot(tap(dy, dx), wt,
                               preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * es_ref[:] + eb_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[:] = jnp.clip(jnp.round(y), -127.0, 127.0
                        ).astype(jnp.int8).reshape(bb, bh, ow, bn)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_blocks(b: int, ph: int, pw: int, cin: int, oh: int, ow: int,
                 cout: int, kh: int, kw: int, sh: int) -> tuple[int, int, int]:
    """(BB, BH, BN) under the VMEM budget.

    Targets: dot M = BB·BH·OW in ~[512, 2048] (MXU row utilization without
    a bloated accumulator), BN 256 when cout allows, whole padded image(s)
    as the input block.
    """
    bn = min(256, max(128, _round_up(cout, 128)))
    k = kh * kw * cin
    # the s1 contiguous-GEMM kernel computes PW-wide rows; the strided
    # kernel computes OW-wide rows
    rw = pw if sh == 1 else ow

    coutp = _round_up(cout, bn)

    def fits(bb: int, bh: int) -> bool:
        m = bb * bh * rw * (k // cin if cin < 128 and k <= 2048 else 1)
        x_blk = 2 * bb * ph * pw * cin          # dbl-buffered input
        rot = (kw - 1) * bb * ph * pw * cin if sh == 1 else 0  # dx scratches
        o_blk = 2 * bb * oh * ow * bn           # dbl-buffered output
        w_blk = k * coutp + (k // 2) * coutp    # full decode scratch + packed
        acc = bb * bh * rw * bn * 8             # int32 acc + f32 epilogue
        return x_blk + rot + o_blk + w_blk + acc + m * cin <= _VMEM_BUDGET

    # batch block: grow while the per-step M stays sane and VMEM fits
    bb = 1
    while (bb * 2 <= b and b % (bb * 2) == 0 and bb * 2 * oh * ow * bn <= 2**21
           and fits(bb * 2, 1)):
        bb *= 2
    # row block: largest divisor of oh with M = BB·BH·RW ≤ ~4096 that fits
    # (must divide: row blocks are a grid dimension; a ragged tail would
    # misalign the reads against Pallas's masked stores). Big M blocks:
    # the 2026-08-19 GEMM sweep measured int8 MXU rate rising from ~200 to
    # ~350 TOP/s between M-block 1k and 4k.
    target = max(1, 4096 // (bb * rw))
    bh = 1
    for d in range(1, oh + 1):
        if oh % d == 0 and d <= target and fits(bb, d):
            bh = d
    return bb, bh, bn


def covers(kshape, strides, padding, groups: int, xshape) -> bool:
    """Does the Pallas path handle this conv? (consulted by dispatch AND
    the engine's predecode planner so they agree on what stays packed)."""
    kh, kw, cin, cout = kshape
    if groups != 1:
        return False
    if len(xshape) != 4:
        return False
    b, h, w, c = xshape
    sh, sw = strides
    if sh > 2 or sw > 2 or sh != sw:
        return False
    (ph0, ph1), (pw0, pw1) = resolve_pads(padding, kh, kw, sh, sw, h, w)
    php, pwp = h + ph0 + ph1, w + pw0 + pw1
    oh = _out_size(h, kh, sh, ph0, ph1)
    ow = _out_size(w, kw, sw, pw0, pw1)
    if oh < 1 or ow < 1:
        return False
    # full decoded weights must be VMEM-resident (see _decode_step)
    k = kh * kw * cin
    if k * _round_up(cout, 128) > 4 * 1024 * 1024:
        return False
    # whole padded image must fit the input block at BB=1, BH=1
    bb, bh, bn = _pick_blocks(b, php, pwp, cin, oh, ow, cout, kh, kw, sh)
    m = bb * bh * ow
    x_blk = 2 * bb * php * pwp * cin
    o_blk = 2 * bb * oh * ow * bn
    w_blk = 2 * k * _round_up(cout, bn)
    if x_blk + o_blk + w_blk + 8 * m * bn > _VMEM_BUDGET:
        return False
    return True


@functools.partial(jax.jit, static_argnames=(
    "kh", "kw", "sh", "sw", "cin", "cout", "oh", "ow", "relu", "wfmt",
    "interpret"))
def _qconv_call(x_pad, wparam, eff_scale, eff_bias, *, kh, kw, sh, sw,
                cin, cout, oh, ow, relu, wfmt, interpret=False):
    b, php, pwp, c = x_pad.shape
    k = kh * kw * cin
    bb, bh, bn = _pick_blocks(b, php, pwp, cin, oh, ow, cout, kh, kw, sh)
    im2col = cin < 128 and k <= 2048
    n_cout = pl.cdiv(cout, bn)
    coutp = n_cout * bn
    # pad cout so the full-weight decode scratch has uniform tiles; the
    # pad copy is tiny (weights <= ~1 MB) and jit-cached per shape
    if coutp != cout:
        wparam = jnp.pad(wparam, ((0, 0), (0, coutp - cout)))
        eff_scale = jnp.pad(eff_scale.reshape(-1), (0, coutp - cout))
        eff_bias = jnp.pad(eff_bias.reshape(-1), (0, coutp - cout))
    kp = k // 2 if wfmt == "pot4" else k
    # grid: batch slowest (x block fetched ONCE per batch tile), cout
    # fastest over the resident decoded weights
    grid = (pl.cdiv(b, bb), oh // bh, n_cout)
    w_spec = pl.BlockSpec((kp, coutp), lambda i, hb, j: (0, 0),
                          memory_space=pltpu.VMEM)
    rot_scratch = []
    if sh == 1 and sw == 1:
        kern = functools.partial(_qconv_s1_kernel, kh=kh, kw=kw, cin=cin,
                                 pw=pwp, relu=relu, wfmt=wfmt, im2col=im2col)
        x_arg = x_pad.reshape(b, php * pwp, c)   # free: contiguous
        x_spec = pl.BlockSpec((bb, php * pwp, c),
                              lambda i, hb, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        rot_scratch = [pltpu.VMEM((bb, php * pwp, c), jnp.int8)
                       for _ in range(kw - 1)]
    else:  # sh == sw == 2: phase-folded view (free reshape, see s2 kernel)
        kern = functools.partial(_qconv_s2_kernel, kh=kh, kw=kw, cin=cin,
                                 relu=relu, wfmt=wfmt, im2col=im2col)
        x_arg = x_pad.reshape(b, php // 2, pwp, 2 * c)
        x_spec = pl.BlockSpec((bb, php // 2, pwp, 2 * c),
                              lambda i, hb, j: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            x_spec,
            w_spec,
            pl.BlockSpec((1, bn), lambda i, hb, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, hb, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, bh, ow, bn),
                               lambda i, hb, j: (i, hb, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((n_cout, k, bn), jnp.int8)] + rot_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * oh * ow * cout * k,
            bytes_accessed=(b * php * pwp * c + wparam.size
                            + b * oh * ow * cout),
            transcendentals=0),
        interpret=interpret,
    )(x_arg, wparam, eff_scale.reshape(1, -1), eff_bias.reshape(1, -1))


def fused_qconv2d(x_q: jax.Array, wparam: jax.Array, eff_scale, eff_bias,
                  strides, padding, groups: int, relu: bool, wfmt: str,
                  kshape: tuple, interpret: bool = False):
    """x_q NHWC int8 -> int8 NHWC, or None if this shape isn't covered."""
    kh, kw, cin, cout = kshape
    if not covers(kshape, strides, padding, groups, x_q.shape):
        return None
    if wfmt == "pot4" and (kh * kw * cin) % 2:
        return None
    sh, sw = strides
    b, h, w, c = x_q.shape
    (ph0, ph1), (pw0, pw1) = resolve_pads(padding, kh, kw, sh, sw, h, w)
    oh = _out_size(h, kh, sh, ph0, ph1)
    ow = _out_size(w, kw, sw, pw0, pw1)

    if kh == 1 and kw == 1 and sh == 1 and sw == 1:
        # 1x1 stride-1 IS a GEMM over flattened (B·H·W, C): route to the
        # matmul kernel — always sublane-aligned, zero padding waste.
        from . import shift_matmul
        if wfmt == "int8":
            wparam = wparam.reshape(-1, cout)
        y = shift_matmul.fused_qmatmul(
            x_q.reshape(b * h * w, c), wparam, eff_scale, eff_bias,
            relu=relu, wfmt=wfmt, kshape=(c, cout), interpret=interpret)
        if y is None:
            return None
        return y.reshape(b, h, w, cout)

    if sh == 1 and sw == 1:
        # contiguous-GEMM kernel alignment (Mosaic: dynamic sublane offsets
        # must be multiples of 8): pad PW to a multiple of 8
        pw1 += -(w + pw0 + pw1) % 8
    else:
        # phase-folded s2 view: taps read up to row oh-1 + (kh-1)//2 and
        # folded col OW-1 + PW/2 + (kw-1)//2 — extend pads to cover, then
        # PH even (H-phase fold) and PW a multiple of 16 (folded sublane
        # offsets (dy%2)·PW/2 + dx//2 must hit multiples of 8)
        ph1 += max(0, sh * oh + kh - 1 - (h + ph0 + ph1))
        pw1 += max(0, sw * ow + kw - 1 - (w + pw0 + pw1))
        ph1 += (h + ph0 + ph1) % 2
        pw1 += -(w + pw0 + pw1) % 16
    if ph0 or ph1 or pw0 or pw1:
        x_q = jnp.pad(x_q, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    if wfmt == "int8":
        wparam = wparam.reshape(-1, cout)  # HWIO -> (K, cout)
    return _qconv_call(x_q, wparam, eff_scale, eff_bias, kh=kh, kw=kw,
                       sh=sh, sw=sw, cin=cin, cout=cout, oh=oh, ow=ow,
                       relu=relu, wfmt=wfmt, interpret=interpret)
