"""Specialized Pallas stem kernel: odd-k, stride-2, small-cin conv — the
ResNet/GoogLeNet 7x7/s2 image stem.

Why a dedicated kernel (v5e-1 profile, 2026-08-20, ResNet-50 b64): XLA
lowers the cin=3 stem with BATCH minormost (64 of 128 lanes) plus a
separate relayout copy of the quantized image — quantize (149 us incl.
copy) + conv (481 us) = 630 us of a 3.41 ms step, ~6x the stem's memory
speed-of-light. The generic qconv kernel (qconv.py) is no better here:
its (M, cin) patch views degenerate at cin=3 (3 of 128 lanes).

Design — transposed implicit GEMM over a PHASE-FOLDED image:

- An XLA prologue (fold_image, fused with the input quantize) emits
      xfold[n, (c,hp), p, (wp,q)]   int8   [B, 2*cin, PROWS, 2*QP]
  where input row r = 2p + hp and column w = 2q + wp (after SAME
  padding). Stride-2 phases become separate planes / lane-halves, so a
  stride-2 tap (dy, dx) of the original conv is a CONTIGUOUS row window
  (shift dy//2) and lane window (roll dx//2) of plane (c, dy%2) — no
  strided memory access anywhere in the kernel. q is padded to a lane
  multiple so every window is a full native tile.
- Per grid step (image n, block of BH output rows) the kernel loads each
  plane's aligned row window once, builds the K x M patch value with one
  static sublane-slice + lane-roll per tap, and contracts on the MXU:
      acc[(row,q), co] = sum_k patch[k, (row,q)] * W[k, co]
  with W the (K, cout) tap-reordered stem weight.
- Epilogue (scale*acc + bias, ReLU, round, clip -> int8) in-register;
  output is standard NHWC int8 [B, OH, OW, cout] (stores masked to OW),
  drop-in for the maxpool that follows every zoo stem.

Reference parity: TF2's FPGA conv PE consumed the camera image through
the same memory-reader dataflow as every other layer (SURVEY.md §3
R7/R8); on TPU the stem's cin=3 makes it the one conv that needs its own
data path to keep the MXU fed.

MEASURED VERDICT (v5e-1, 2026-08-20, b64 ResNet-50 stem, checked
two-point timing): bit-exact, but NOT faster — fold prologue 425-558 us
(XLA emits a generic slow path for the 6D f32 transpose; SOL ~62 us)
plus kernel ~970 us (v2: whole-tile BH=32 pieces + leading-dim
dot_general; v1's per-tap (16,128)->(1,2048) flatten was ~1.3 ms) vs
XLA's fused quantize+copy+conv at ~630 us in-graph. The MXU contraction
itself is ~55 us — the loss is Mosaic's int8 relayout cost for the 147
tap-stack, the same failure mode the in-context sweep measured for the
generic qconv kernel on every zoo shape (BASELINE.md §3.6). Kept as a
tested, documented experiment: routing never selects it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _norm_padding(padding):
    if isinstance(padding, str):
        return padding
    return tuple(tuple(p) for p in padding)


@functools.lru_cache(maxsize=None)
def stem_geometry(h: int, w: int, kh: int, kw: int, padding="SAME"):
    """Fold geometry for a khxkw/s2 conv on an (h, w) image.

    With the image padded by (ph0, pw0) on top/left, output (oy, ox) tap
    (dy, dx) reads padded row r' = 2oy + dy = 2p + hp and column
    w' = 2ox + dx = 2q + wp, i.e. plane (dy%2, dx%2), row p = oy + dy//2,
    column q = ox + dx//2.
    """
    from .qconv import resolve_pads
    (ph0, ph1), (pw0, pw1) = resolve_pads(padding, kh, kw, 2, 2, h, w)
    oh = (h + ph0 + ph1 - kh) // 2 + 1
    ow = (w + pw0 + pw1 - kw) // 2 + 1
    # p rows: enough for the last ROW BLOCK's window — blocks are 32-row
    # aligned and the final block is store-masked, so its reads must stay
    # in bounds: pad p to ceil(oh/32)*32 + max(dy//2)
    prows = _round_up(oh, 32) + (kh - 1) // 2
    qcols = ow + (kw - 1) // 2
    qp = _round_up(qcols, 128)
    return dict(ph0=ph0, pw0=pw0, oh=oh, ow=ow, prows=prows, qcols=qcols,
                qp=qp, dymax=(kh - 1) // 2, dxmax=(kw - 1) // 2)


def fold_image(x: jax.Array, kh: int, kw: int, padding="SAME",
               scale: float | None = None) -> jax.Array:
    """[B, H, W, C] (f32 with ``scale``, else int8) -> int8 xfold
    [B, 2C, PROWS, 2*QP]: planes (c, hp), lanes (wp, q), q lane-padded.
    With ``scale`` the quantize happens in the same expression so XLA
    fuses quantize + fold into one pass over the image."""
    b, h, w, c = x.shape
    g = stem_geometry(h, w, kh, kw, _norm_padding(padding))
    if scale is not None:
        x = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
    hp_ext = 2 * g["prows"]
    wp_ext = 2 * g["qcols"]
    bottom = hp_ext - g["ph0"] - h
    right = wp_ext - g["pw0"] - w
    xp = jnp.pad(x, ((0, 0), (g["ph0"], max(0, bottom)),
                     (g["pw0"], max(0, right)), (0, 0)))
    xp = xp[:, :hp_ext, :wp_ext, :]
    # [b, (p, hp), (q, wp), c] -> [b, c, hp, p, wp, q]
    xf = xp.reshape(b, g["prows"], 2, g["qcols"], 2, c)
    xf = xf.transpose(0, 5, 2, 1, 4, 3)
    if g["qp"] != g["qcols"]:
        xf = jnp.pad(xf, ((0, 0),) * 5 + ((0, g["qp"] - g["qcols"]),))
    xf = xf.reshape(b, 2 * c, g["prows"], 2 * g["qp"])
    # one extra zero lane-tile so per-tap windows (lane offset wp*QP + dx//2,
    # width QP) never run off the end — Mosaic has no int8 lane-rotate, so
    # the kernel uses plain static unaligned lane slices instead of rolls
    return jnp.pad(xf, ((0, 0), (0, 0), (0, 0), (0, 128)))


@functools.lru_cache(maxsize=None)
def stem_taps(kh: int, kw: int, cin: int) -> tuple:
    """Tap metadata in the kernel's K order (c, dy, dx):
    (plane=(c*2 + dy%2), row_shift=dy//2, wp=dx%2, lane_roll=dx//2)."""
    return tuple((c * 2 + dy % 2, dy // 2, dx % 2, dx // 2)
                 for c in range(cin)
                 for dy in range(kh)
                 for dx in range(kw))


def fold_weight(w_q: np.ndarray) -> np.ndarray:
    """(kh, kw, cin, cout) int8 -> (Kp, cout) rows in stem_taps order,
    K padded to a sublane multiple with zero rows (zero weights null out
    whatever garbage the padded patch rows contain)."""
    kh, kw, cin, cout = w_q.shape
    rows = [w_q[dy, dx, c, :]
            for c in range(cin) for dy in range(kh) for dx in range(kw)]
    wmat = np.stack(rows, 0).astype(np.int8)
    kp = _round_up(wmat.shape[0], 32)
    out = np.zeros((kp, cout), np.int8)
    out[:wmat.shape[0]] = wmat
    return out


def _qstem_kernel(x_ref, w_ref, es_ref, eb_ref, o_ref, *,
                  taps: tuple, planes: int, bh: int, qp: int, kp: int,
                  win: int, relu: bool):
    """x_ref: (1, PLANES, PROWS, 2*QP) int8 — whole folded image resident.
    w_ref: (KP, COUT) int8. o_ref: (1, BH, OWP, COUT) int8 (masked store).

    BH is a multiple of 8 so the dynamic row-window start (hb*BH) meets
    Mosaic's sublane alignment; per-tap row shifts (dy//2 in [0, win-BH])
    are STATIC slices of the loaded window value."""
    oy0 = pl.program_id(1) * bh

    rows = []
    for pi in range(planes):
        wnd = x_ref[0, pi, pl.ds(oy0, win), :]      # (win, 2*QP) int8
        rows.append(wnd)
    parts = []
    for (plane, dys, wp, dxs) in taps:
        # static unaligned lane window: lane l holds q = l + dx//2; lanes
        # past the valid q range read zero padding / the next phase half,
        # and map to ox >= OW which the output store masks away
        blk = rows[plane][dys:dys + bh, wp * qp + dxs:wp * qp + dxs + qp]
        parts.append(blk)
    nt = len(parts)
    # stack taps on a leading dim (each piece stays a native (BH, QP) tile
    # — no sublane->lane flattening relayout) and contract dim 0 on the
    # MXU; K padding rows multiply zero weight rows, so garbage is fine
    patch = jnp.stack(parts, axis=0)                 # (NT, BH, QP)
    acc = jax.lax.dot_general(
        patch, w_ref[:nt, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)            # (BH, QP, COUT)
    y = acc.astype(jnp.float32) * es_ref[:] + eb_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    y = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    o_ref[:] = y[jnp.newaxis, :, :o_ref.shape[2], :]


@functools.partial(jax.jit, static_argnames=(
    "kh", "kw", "h", "w", "padding", "relu", "interpret"))
def _qstem_call(xfold, wmat, eff_scale, eff_bias, *, kh, kw, h, w,
                padding, relu, interpret=False):
    b, planes, prows, lanes2 = xfold.shape
    g = stem_geometry(h, w, kh, kw, padding)
    oh, ow, qp = g["oh"], g["ow"], g["qp"]
    kp, cout = wmat.shape
    cin = planes // 2
    taps = stem_taps(kh, kw, cin)
    # BH = 32: patch pieces are whole native int8 tiles (32, 128), the
    # dynamic window start (hb*32) meets Mosaic's sublane alignment, and
    # the final partial block is handled by the masked output store (the
    # fold pads p rows to cover its window)
    bh = min(32, _round_up(oh, 32))
    win = bh + g["dymax"]
    owp = _round_up(ow, 128)
    grid = (b, -(-oh // bh))
    kern = functools.partial(_qstem_kernel, taps=taps, planes=planes,
                             bh=bh, qp=qp, kp=kp, win=win, relu=relu)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, planes, prows, lanes2),
                         lambda i, hb: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, cout), lambda i, hb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, hb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, hb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, owp, cout),
                               lambda i, hb: (i, hb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, cout), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * oh * ow * cout * kp,
            bytes_accessed=xfold.size + wmat.size + b * oh * ow * cout,
            transcendentals=0),
        interpret=interpret,
    )(xfold, wmat, eff_scale.reshape(1, -1), eff_bias.reshape(1, -1))


def covers(kshape, strides, padding, groups: int, xshape) -> bool:
    kh, kw, cin, cout = kshape
    if groups != 1 or len(xshape) != 4:
        return False
    if tuple(strides) != (2, 2) or kh != kw or kh % 2 == 0 or cin > 4:
        return False
    b, h, w, c = xshape
    g = stem_geometry(h, w, kh, kw, _norm_padding(padding))
    if g["oh"] < 1 or g["ow"] < 1:
        return False
    # folded image must fit VMEM alongside patch + acc (see _qstem_call)
    if 2 * cin * g["prows"] * 2 * g["qp"] > 4 * 1024 * 1024:
        return False
    return True


def fused_qstem(x: jax.Array, w_q, eff_scale, eff_bias, *, padding,
                relu: bool, scale: float | None = None,
                interpret: bool = False):
    """Fold(+quantize) + stem conv. x: [B,H,W,C] f32 (with ``scale``) or
    int8; w_q: HWIO int8. Returns NHWC int8 [B,OH,OW,cout] or None."""
    kh, kw, cin, cout = w_q.shape
    if not covers((kh, kw, cin, cout), (2, 2), padding, 1, x.shape):
        return None
    padding = _norm_padding(padding)
    b, h, w, c = x.shape
    xfold = fold_image(x, kh, kw, padding, scale=scale)
    wmat = fold_weight(np.asarray(w_q))
    es = jnp.asarray(eff_scale, jnp.float32).reshape(-1)
    eb = jnp.asarray(eff_bias, jnp.float32).reshape(-1)
    return _qstem_call(xfold, jnp.asarray(wmat), es, eb, kh=kh, kw=kw,
                       h=h, w=w, padding=padding, relu=relu,
                       interpret=interpret)
