"""Load-time graph optimization passes (runtime side of the graph
compiler, SURVEY.md §3 R5: "derive per-layer kernel parameters").

space_to_depth_stem: CNN stems convolve a 3-channel image with a large
strided kernel (ResNet-50: 7x7/s2). K = kh*kw*cin = 147 with cin = 3 maps
terribly onto the 128-lane MXU (measured 0.58 ms of a 3.6 ms ResNet-50
batch-64 forward — ~16% of runtime in <2% of the FLOPs). The classic fix:
rearrange the input 2x2 space-to-depth (NHWC -> H/2, W/2, 4C) and convolve
with the equivalent 4x4/s1 VALID kernel over 12 channels — identical math,
MXU-friendly reduction layout.

Derivation: out[oy,ox] = sum_{i,j,c} xp[2oy+i, 2ox+j, c] * w[i,j,c] with xp
the SAME-padded image. Writing i = 2a+dy, j = 2b+dx (dy,dx in {0,1}):
out[oy,ox] = sum_{a,b,dy,dx,c} s2d(xp)[oy+a, ox+b, (dy,dx,c)] * w[2a+dy,
2b+dx, c] — a VALID stride-1 conv of the space-to-depth tensor with the
7->8 zero-padded weight reshaped to (4, 4, 4*cin, cout). Padding with int8
zeros is exact for symmetric quantization (q=0 <=> 0.0).
"""
from __future__ import annotations

import logging

import numpy as np

from .ir import Graph, Node, TensorSpec

log = logging.getLogger(__name__)


def fuse_stem_quantize(graph: Graph, params) -> tuple[Graph, dict]:
    """Fold the input `quantize` node into its consuming stem qconv2d.

    The quantized image only exists to feed the stem; materializing it in
    int8 costs a full write + a layout copy (v5e-1 profile 2026-08-20:
    61 + 88 us of a 3.4 ms ResNet-50 b64 step). Deleting the quantize
    node and stamping its scale onto the conv (attr "s_in") lets the
    executor quantize VALUES in-register inside the conv fusion — exact,
    because dispatch.qconv2d's small-cin path computes on bf16/int where
    clip(round(x/s)) is representable exactly (integers <= 127).

    Applies when: a quantize node consumes a graph input and its only
    consumer is a qconv2d with cin <= 4. Runs at engine load, like
    predecode.
    """
    quants = {n.name: n for n in graph.nodes if n.op == "quantize"
              and n.inputs[0] in graph.inputs}
    if not quants:
        return graph, dict(params)
    consumers: dict[str, list[Node]] = {q: [] for q in quants}
    for n in graph.nodes:
        for i in n.inputs:
            if i in quants:
                consumers[i].append(n)
    fuse: dict[str, Node] = {}
    outputs = set(graph.outputs)
    for qname, cons in consumers.items():
        # the quantize node must not itself be a graph output — deleting
        # it would orphan the output reference (ADVICE r3)
        if qname in outputs:
            continue
        if len(cons) == 1 and cons[0].op == "qconv2d" \
                and cons[0].attrs["kshape"][2] <= 4:
            fuse[qname] = cons[0]
    if not fuse:
        return graph, dict(params)
    new_nodes = []
    stems = {c.name: q for q, c in fuse.items()}
    for n in graph.nodes:
        if n.name in fuse:
            continue  # quantize node deleted
        if n.name in stems:
            q = quants[stems[n.name]]
            attrs = dict(n.attrs, s_in=float(q.attrs["scale"]))
            new_nodes.append(Node(n.name, n.op, (q.inputs[0],), n.params,
                                  attrs))
        else:
            new_nodes.append(n)
    g = Graph(graph.name, dict(graph.inputs), graph.outputs, new_nodes,
              dict(graph.params), dict(graph.meta))
    g.validate()
    return g, dict(params)


def pack_phase_stem(graph: Graph, params) -> tuple[Graph, dict]:
    """W-axis pair-packing for strided cin<=4 stems — the round-5 answer
    to the stem question (VERDICT r4 task 2; BASELINE.md §4.6).

    A k×k/s2 conv on (B,H,W,cin<=4) maps terribly onto the MXU: XLA's
    emitter keeps batch minormost for cin<64 and pays relayout converts
    (ResNet conv1: 532 us in-graph vs a ~150 us floor). Packing 2
    consecutive W-pixels into channels (W' = W/2, cin' = 2*cin) makes
    the W stride exactly ONE GROUP STEP, so the conv becomes a single
    stride-(2,1) conv with kernel (k, ceil(k/2), 2*cin, cout) — no
    output phases, canonical NHWC output, nothing downstream perturbed.
    Tap j of output ox sits at packed position 2*ox + j = group ox+b,
    in-pair pixel dw with j = 2b + dw.

    Bit-exact: quantized values are integers <= 127 (exact in bf16),
    accumulation f32, K*127^2 < 2^24. Measured v5e-1 2026-08-21,
    standalone conv1 B=64: 543 us vs 631 us shipped f32 path; whole-graph
    ResNet-50 b64 3.52 -> 3.44 ms. Richer packings are FASTER standalone
    but poison the graph: S=8 phase-packing (K=336, 4 phase banks,
    zero-copy un-phase reshape) reads 378 us alone but the downstream
    maxpool inherits the phase layout and reduce_window explodes
    (102 -> 1,592 us; whole-graph 3.52 -> 4.91 ms), and phase-space
    pooling via 64-lane slices costs 4.2 ms of lane shifts. The pair
    packing keeps all of the layout fix that matters and none of the
    boundary damage.

    Runs at engine load AFTER fuse_stem_quantize (needs the fused s_in —
    the packed path quantizes values in-register)."""
    from .shapes import activation_shapes

    try:
        shapes = activation_shapes(graph, params)
    except Exception:
        return graph, dict(params)
    new_nodes: list[Node] = []
    new_params = dict(params)
    new_specs = dict(graph.params)
    changed = False
    for n in graph.nodes:
        if not (n.op == "qconv2d" and "s_in" in n.attrs
                and n.attrs.get("wfmt") == "int8"
                and tuple(n.attrs.get("strides", [1, 1])) == (2, 2)
                and n.attrs.get("groups", 1) == 1):
            new_nodes.append(n)
            continue
        kh, kw, cin, cout = n.attrs["kshape"]
        xshape = shapes.get(n.inputs[0])
        pad = n.attrs.get("padding", "SAME")
        if (xshape is None or cin > 4 or kh != kw
                or pad not in ("SAME", "VALID")):
            new_nodes.append(n)
            continue
        _, h, w, _ = xshape
        if pad == "SAME":
            ow = -(-w // 2)
            tot_w = max(0, (ow - 1) * 2 + kw - w)
            lo_w = tot_w // 2
            oh = -(-h // 2)
            tot_h = max(0, (oh - 1) * 2 + kh - h)
            lo_h, hi_h = tot_h // 2, tot_h - tot_h // 2
        else:
            ow = (w - kw) // 2 + 1
            oh = (h - kh) // 2 + 1
            lo_w = lo_h = hi_h = 0
        t_w = (kw + 1) // 2                  # W' kernel taps (pairs)
        wq = np.asarray(params[n.params[0]])  # (kh,kw,cin,cout) int8
        wp = np.zeros((kh, t_w, 2 * cin, cout), np.int8)
        for j in range(kw):
            b_, dw = divmod(j, 2)
            wp[:, b_, dw * cin:(dw + 1) * cin, :] = wq[:, j, :, :]
        wpad = 2 * (ow - 1 + t_w)
        names = (f"{n.name}.wpack",) + tuple(n.params[1:])
        new_params[names[0]] = wp
        new_specs[names[0]] = TensorSpec(wp.shape, "int8")
        new_params.pop(n.params[0], None)
        new_specs.pop(n.params[0], None)
        attrs = dict(n.attrs, wfmt="wpack2", pack_kshape=list(wp.shape),
                     pack_pad_w=[lo_w, wpad - w - lo_w],
                     pack_pad_h=[lo_h, hi_h], pack_ow=ow, pack_oh=oh)
        new_nodes.append(Node(n.name, "qconv2d", n.inputs, names, attrs))
        changed = True
    if not changed:
        return graph, dict(params)
    g = Graph(graph.name, dict(graph.inputs), graph.outputs, new_nodes,
              new_specs, dict(graph.meta))
    g.validate()
    return g, new_params


def merge_sibling_1x1(graph: Graph, params) -> tuple[Graph, dict]:
    """Merge sibling 1×1 qconv2d nodes that read the SAME input into one
    wide conv + static channel slices (VERDICT r4 task 3: GoogLeNet's
    inception heads b1/b3r/b5r all read the block input).

    Exact: a 1×1 conv is a matmul over channels; concatenating the weight
    along cout and the per-channel es/eb vectors computes the identical
    epilogue per output channel — each branch's own out_scale lives in its
    slice of es/eb, so downstream consumers (concat, 3×3/5×5 convs) see
    bit-identical int8 values. Wins three ways: one read of x instead of
    three, one wide MXU call instead of N∈{16..96} lane-starved calls
    (inc3a: cout 16 = 12.5% lane occupancy → merged 176), one epilogue
    pass. The slices are cheap (int8, ≤5 MB) relative to the re-reads
    they replace.

    Extension (r5b): a single 1×1 sibling merges INTO a 3×3 sibling by
    zero-padding its kernel to 3×3 (exact under SAME padding — zero taps
    contribute nothing). 9× the 1×1's MACs, but on a bandwidth-starved
    model one wide conv + one input read wins: SqueezeNet fire expand
    pairs measured standalone (int8, b64, bit-exact): 56²/E64 276→161 µs,
    28²/E192 151→123, 14²/E256 30→37 — LOSES below h≈20, so the mixed
    merge is gated on input h ≥ 20 (the identical-k merge has no MAC
    waste and stays ungated).

    Runs at engine load AFTER predecode (weights must be int8-decoded;
    pot4 artifacts decode there on the XLA route)."""
    from collections import defaultdict

    from .shapes import activation_shapes

    try:
        shapes = activation_shapes(graph, params)
    except Exception:
        shapes = {}

    groups: dict[tuple, list[Node]] = defaultdict(list)
    for n in graph.nodes:
        if (n.op == "qconv2d" and n.attrs.get("wfmt") == "int8"
                and tuple(n.attrs["kshape"][:2]) in ((1, 1), (3, 3))
                and tuple(n.attrs.get("strides", [1, 1])) == (1, 1)
                and n.attrs.get("groups", 1) == 1
                and "s_in" not in n.attrs
                and (tuple(n.attrs["kshape"][:2]) == (1, 1)
                     or n.attrs.get("padding", "SAME") == "SAME")):
            key = (n.inputs[0], bool(n.attrs.get("relu")))
            groups[key].append(n)

    merges: dict[tuple, tuple[list[Node], int]] = {}
    for key, sibs in groups.items():
        ones = [s for s in sibs if tuple(s.attrs["kshape"][:2]) == (1, 1)]
        threes = [s for s in sibs if tuple(s.attrs["kshape"][:2]) == (3, 3)]
        xshape = shapes.get(key[0])
        h = xshape[1] if xshape else 0
        if ones and threes and h >= 20:
            merges[key] = (ones + threes, 3)     # pad 1×1s into a 3×3 merge
        elif len(ones) >= 2:
            merges[key] = (ones, 1)              # classic same-k merge
    if not merges:
        return graph, dict(params)
    new_params = dict(params)
    new_specs = dict(graph.params)
    replaced: dict[str, tuple[str, int, int]] = {}  # node -> (merged, lo, hi)
    merged_nodes: dict[str, Node] = {}  # first-sibling name -> merged node
    for (src, relu), (sibs, km) in merges.items():
        ws, ess, ebs = [], [], []
        lo = 0
        for s in sibs:
            kh, kw, cin, cout = s.attrs["kshape"]
            w = np.asarray(new_params[s.params[0]]).reshape(kh, kw, cin, cout)
            if kh != km:
                p = (km - kh) // 2
                w = np.pad(w, ((p, p), (p, p), (0, 0), (0, 0)))
            ws.append(w)
            ess.append(np.asarray(new_params[s.params[1]]))
            ebs.append(np.asarray(new_params[s.params[2]]))
            replaced[s.name] = (f"{src}__m1x1", lo, lo + cout)
            lo += cout
        cin = ws[0].shape[2]
        mname = f"{src}__m1x1"
        wm = np.concatenate(ws, axis=3)
        pn = (f"{mname}.wq", f"{mname}.es", f"{mname}.eb")
        new_params[pn[0]] = wm.astype(np.int8)
        new_params[pn[1]] = np.concatenate(ess).astype(np.float32)
        new_params[pn[2]] = np.concatenate(ebs).astype(np.float32)
        for nm in pn:
            new_specs[nm] = TensorSpec(new_params[nm].shape,
                                       str(new_params[nm].dtype))
        for s in sibs:
            for old in s.params:
                new_params.pop(old, None)
                new_specs.pop(old, None)
        first = sibs[0]
        attrs = {"relu": relu, "wfmt": "int8",
                 "in_scale": first.attrs.get("in_scale"),
                 "out_scales": [s.attrs.get("out_scale") for s in sibs],
                 "strides": [1, 1], "padding": "SAME", "groups": 1,
                 "kshape": [km, km, cin, lo]}
        merged_nodes[first.name] = Node(mname, "qconv2d", (src,), pn, attrs)
    new_nodes: list[Node] = []
    for n in graph.nodes:
        if n.name in replaced:
            if n.name in merged_nodes:
                new_nodes.append(merged_nodes[n.name])
            mname, lo, hi = replaced[n.name]
            new_nodes.append(Node(n.name, "slice_c", (mname,), (),
                                  {"lo": lo, "hi": hi}))
        else:
            new_nodes.append(n)
    g = Graph(graph.name, dict(graph.inputs), graph.outputs, new_nodes,
              new_specs, dict(graph.meta))
    g.validate()
    return g, new_params


def patchify_stem(graph: Graph, params) -> tuple[Graph, dict]:
    """conv2d with stride == kernel (non-overlapping patches — the ViT
    patch embedding) is EXACTLY a reshape/transpose/reshape + dense: every
    output position reads every input element of its patch once, so
    out[b, oy, ox, :] = patch(b, oy, ox) @ W.reshape(kh*kw*cin, cout).

    Why: XLA's conv emitter keeps batch minormost (64 of 128 lanes) for
    any cin < 64 conv and pays relayout copies around it (BASELINE.md
    §3.9, the stem pathology). As a dense, the MXU sees K = kh*kw*cin
    (768 for ViT-B/16) on proper lanes. Measured v5e-1 2026-08-21: the
    in-graph patch_embed group cost 375 us/step b64 as a conv; the dense
    form ~170 us (see BASELINE.md §4.6).

    Runs on the FOLDED FP graph (transform/pipeline.py) so calibration
    and quantization see the dense. Exact in fp32 up to dot-vs-conv
    accumulation order."""
    from .shapes import activation_shapes

    try:
        shapes = activation_shapes(graph, params)
    except Exception:
        return graph, dict(params)
    new_nodes: list[Node] = []
    new_params = dict(params)
    new_specs = dict(graph.params)
    changed = False
    for n in graph.nodes:
        if n.op != "conv2d":
            new_nodes.append(n)
            continue
        w = np.asarray(params[n.params[0]])
        kh, kw, cin, cout = w.shape
        sh, sw = n.attrs.get("strides", [1, 1])
        pad = n.attrs.get("padding", "SAME")
        xshape = shapes.get(n.inputs[0])
        if (xshape is None or (sh, sw) != (kh, kw) or (kh, kw) == (1, 1)
                or n.attrs.get("groups", 1) != 1
                or xshape[1] % kh or xshape[2] % kw
                or (pad != "VALID" and not (pad == "SAME"))):
            new_nodes.append(n)
            continue
        b_, h, wd, _ = xshape
        oh, ow = h // kh, wd // kw
        r1 = f"{n.name}__p1"
        tr = f"{n.name}__pt"
        r2 = f"{n.name}__p2"
        new_nodes.append(Node(r1, "reshape", (n.inputs[0],), (),
                              {"shape": [b_, oh, kh, ow, kw, cin],
                               "batch_leading": True}))
        new_nodes.append(Node(tr, "transpose", (r1,), (),
                              {"perm": [0, 1, 3, 2, 4, 5]}))
        new_nodes.append(Node(r2, "reshape", (tr,), (),
                              {"shape": [b_, oh, ow, kh * kw * cin],
                               "batch_leading": True}))
        new_nodes.append(Node(n.name, "dense", (r2,), n.params, {}))
        w2d = w.reshape(kh * kw * cin, cout)
        new_params[n.params[0]] = w2d
        new_specs[n.params[0]] = TensorSpec(w2d.shape, str(w2d.dtype))
        changed = True
    if not changed:
        return graph, dict(params)
    g = Graph(graph.name, dict(graph.inputs), graph.outputs, new_nodes,
              new_specs, dict(graph.meta))
    g.validate()
    return g, new_params


def hoist_input_quantize(graph: Graph, params) -> tuple[Graph, dict]:
    """Move quantize nodes UP through single-consumer reshape / transpose /
    flatten chains so the layout copies move int8 bytes (4x less HBM
    traffic than f32). Quantize is elementwise, these ops are permutations
    — exact commutation. Main beneficiary: the patchified ViT stem, whose
    patch transpose otherwise runs on the f32 image."""
    _LAYOUT = {"reshape", "transpose", "flatten"}
    node_map = {n.name: n for n in graph.nodes}
    consumers: dict[str, list[str]] = {}
    for n in graph.nodes:
        for i in n.inputs:
            consumers.setdefault(i, []).append(n.name)
    outputs = set(graph.outputs)
    moved = False
    nodes = list(graph.nodes)
    for q in [n for n in nodes if n.op == "quantize"]:
        chain: list[Node] = []
        cur = q.inputs[0]
        while (cur in node_map and node_map[cur].op in _LAYOUT
               and len(consumers.get(cur, [])) == 1
               and cur not in outputs):
            chain.append(node_map[cur])
            cur = node_map[cur].inputs[0]
        if not chain:
            continue
        # chain[-1] reads `cur` (source); q reads chain[0]
        src = cur
        top = chain[-1]
        # rewire: q reads src; top reads q; q's consumers read chain[0]
        for cname in consumers.get(q.name, []):
            c = node_map[cname]
            node_map[cname] = Node(c.name, c.op,
                                   tuple(chain[0].name if i == q.name else i
                                         for i in c.inputs),
                                   c.params, c.attrs)
        node_map[q.name] = Node(q.name, "quantize", (src,), (), dict(q.attrs))
        node_map[top.name] = Node(top.name, top.op, (q.name,), top.params,
                                  dict(top.attrs))
        moved = True
    if not moved:
        return graph, dict(params)
    # rebuild in topological order: emit q right before its (new) consumer
    order: list[Node] = []
    emitted: set[str] = set(graph.inputs)
    remaining = {n.name: node_map[n.name] for n in graph.nodes}
    while remaining:
        progress = False
        for name in list(remaining):
            n = remaining[name]
            if all(i in emitted or i not in remaining for i in n.inputs):
                order.append(n)
                emitted.add(name)
                del remaining[name]
                progress = True
        if not progress:  # cycle — bail out, return original
            return graph, dict(params)
    g = Graph(graph.name, dict(graph.inputs), graph.outputs, order,
              dict(graph.params), dict(graph.meta))
    g.validate()
    return g, dict(params)


def fuse_lrn_quantize(graph: Graph, params) -> tuple[Graph, dict]:
    """Fold dequantize -> lrn -> quantize into one ``qlrn`` node
    (kernels/qlrn.py: int8 in, int8 out, one pass over the tensor).

    Why: XLA cannot fuse across the LRN channel-window op, so the f32
    intermediates round-trip HBM — ~860 us/step on GoogLeNet b64 against
    an int8-traffic floor of ~95 us (PROFILE_TRACE_googlenet.json,
    2026-08-21). Applies when the dequantize and lrn each have exactly
    one consumer and none of the three nodes is a graph output. Runs at
    engine load, like predecode.
    """
    by_name = {n.name: n for n in graph.nodes}
    consumers: dict[str, list[Node]] = {}
    for n in graph.nodes:
        for i in n.inputs:
            consumers.setdefault(i, []).append(n)
    outputs = set(graph.outputs)

    # quantize->monotone-passthrough commutation: maxpool/reshape/etc
    # between lrn and its quantize commute with round/clip (both
    # monotone non-decreasing; max-then-quantize == quantize-then-max),
    # so the chain dq -> lrn -> P* -> quantize rewrites to
    # qlrn -> P*(int8) exactly. One theoretical edge (ADVICE r4): a
    # SAME-padded maxpool window made ENTIRELY of padding yields the pad
    # identity, which is -inf in f32 (-> quantize -> -127) but -128 in
    # int8 after the rewrite. Unreachable for every zoo pool geometry
    # (windows always overlap real pixels: pad < window on all sides),
    # so "exact" holds on real graphs; noted for the next geometry.
    _commuting = {"maxpool", "reshape", "flatten", "identity", "dropout",
                  "transpose", "pad"}

    rewrites: dict[str, tuple] = {}  # quantize name -> (dq, lrn, chain, q)
    dead: set[str] = set()
    for dq in graph.nodes:
        if dq.op != "dequantize" or dq.name in outputs:
            continue
        cons = consumers.get(dq.name, [])
        if len(cons) != 1 or cons[0].op != "lrn" or cons[0].name in outputs:
            continue
        lrn = cons[0]
        chain: list[Node] = []
        cur = lrn
        q = None
        while True:
            nxt = consumers.get(cur.name, [])
            if len(nxt) != 1 or cur.name in outputs:
                break
            if nxt[0].op == "quantize":
                q = nxt[0]
                break
            if nxt[0].op in _commuting:
                cur = nxt[0]
                chain.append(cur)
                continue
            break
        if q is None:
            continue
        rewrites[q.name] = (dq, lrn, chain, q)
        dead.update((dq.name, lrn.name))
        dead.update(n.name for n in chain)
    if not rewrites:
        return graph, dict(params)

    new_nodes: list[Node] = []
    for n in graph.nodes:
        if n.name in dead:
            continue
        if n.name in rewrites:
            dq, lrn, chain, q = rewrites[n.name]
            attrs = {"radius": lrn.attrs.get("radius", 2),
                     "alpha": lrn.attrs.get("alpha", 1e-4),
                     "beta": lrn.attrs.get("beta", 0.75),
                     "bias": lrn.attrs.get("bias", 1.0),
                     "s_in": float(dq.attrs["scale"]),
                     "s_out": float(q.attrs["scale"])}
            qlrn_name = f"{lrn.name}__qlrn" if chain else q.name
            new_nodes.append(Node(qlrn_name, "qlrn", (dq.inputs[0],), (),
                                  attrs))
            prev = qlrn_name
            for i, p in enumerate(chain):
                # re-emit the passthrough on int8; last one takes the
                # quantize's name so downstream references resolve
                pname = q.name if i == len(chain) - 1 else p.name
                new_nodes.append(Node(pname, p.op, (prev,), p.params,
                                      dict(p.attrs)))
                prev = pname
        else:
            new_nodes.append(n)
    g = Graph(graph.name, dict(graph.inputs), graph.outputs, new_nodes,
              dict(graph.params), dict(graph.meta))
    g.validate()
    return g, dict(params)


def _is_qconv(n: Node | None, k: int, relu: bool) -> bool:
    return (n is not None and n.op == "qconv2d"
            and tuple(n.attrs["kshape"][:2]) == (k, k)
            and tuple(n.attrs.get("strides", [1, 1])) == (1, 1)
            and n.attrs.get("groups", 1) == 1
            and bool(n.attrs.get("relu")) == relu
            and n.attrs.get("wfmt") == "int8"
            and (k == 1 or n.attrs.get("padding", "SAME") == "SAME"))


def fuse_bottleneck_chains(graph: Graph, params) -> tuple[Graph, dict]:
    """Rewrite runs of stride-1 residual bottleneck blocks
    (qconv2d 1x1 relu -> qconv2d 3x3 relu -> qconv2d 1x1 -> qadd, with an
    identity or 1x1 downsample residual) into fused `qblockchain` nodes
    executed by kernels/qblocks.py — one VMEM-resident Pallas call per
    chain on TPU, eliminating every intermediate HBM round-trip.

    Only applies post-predecode (weights must be int8). Matching is
    conservative: every intermediate value must have exactly the
    consumers the block structure implies.
    """
    from .shapes import activation_shapes
    try:
        shapes = activation_shapes(graph, params)
    except Exception:
        return graph, dict(params)
    by_name = {n.name: n for n in graph.nodes}
    consumers: dict[str, list[Node]] = {}
    for n in graph.nodes:
        for i in n.inputs:
            consumers.setdefault(i, []).append(n)
    outputs = set(graph.outputs)

    def cons(name):
        return consumers.get(name, [])

    def match_block(c1: Node):
        """c1 -> (block_meta, nodes, x_name, out_name) or None."""
        if not _is_qconv(c1, 1, True):
            return None
        x_name = c1.inputs[0]
        if c1.name in outputs or len(cons(c1.name)) != 1:
            return None
        c2 = cons(c1.name)[0]
        if not _is_qconv(c2, 3, True) or c2.name in outputs \
                or len(cons(c2.name)) != 1:
            return None
        if c2.attrs["kshape"][2] != c2.attrs["kshape"][3]:
            return None
        c3 = cons(c2.name)[0]
        if not _is_qconv(c3, 1, False) or c3.name in outputs \
                or len(cons(c3.name)) != 1:
            return None
        add = cons(c3.name)[0]
        if add.op != "qadd":
            return None
        other = [i for i in add.inputs if i != c3.name]
        if len(other) != 1:
            return None
        r = other[0]
        down = None
        if r != x_name:
            dn = by_name.get(r)
            if (not _is_qconv(dn, 1, False) or dn.inputs[0] != x_name
                    or dn.name in outputs or len(cons(dn.name)) != 1):
                return None
            down = dn
        # qadd input order: a = c3 branch, b = residual (dispatch.qadd
        # applies sa to inputs[0]); bail if reversed
        if add.inputs[0] != c3.name:
            return None
        nodes = [c1, c2, c3, add] + ([down] if down else [])
        meta = {"c1": c1.name, "c2": c2.name, "c3": c3.name,
                "add": add.name, "down": down.name if down else None,
                "relu": bool(add.attrs.get("relu")),
                "sa": float(add.attrs["sa"]), "sb": float(add.attrs["sb"]),
                "so": float(add.attrs["so"])}
        return meta, nodes, x_name, add.name

    # collect blocks keyed by input
    blocks_by_input: dict[str, tuple] = {}
    for n in graph.nodes:
        m = match_block(n)
        if m:
            blocks_by_input.setdefault(m[2], m)

    # build maximal chains: next block's x == this block's add output AND
    # the add's consumers are exactly {next c1, next add}
    used = set()
    chains = []
    for x0, blk in sorted(blocks_by_input.items(),
                          key=lambda kv: graph.nodes.index(
                              by_name[kv[1][0]["c1"]])):
        if blk[0]["c1"] in used:
            continue
        chain = [blk]
        used.update(nd.name for nd in blk[1])
        while True:
            out = chain[-1][3]
            nxt = blocks_by_input.get(out)
            if nxt is None or nxt[0]["c1"] in used or out in outputs:
                break
            # out's consumers must be exactly the next block's entry ops:
            # c1 + the residual taker (the add itself, or its downsample)
            expected = {nxt[0]["c1"],
                        nxt[0]["down"] or nxt[0]["add"]}
            if {c.name for c in cons(out)} != expected:
                break
            chain.append(nxt)
            used.update(nd.name for nd in nxt[1])
        chains.append(chain)

    chains = [c for c in chains if len(c) >= 1]
    if not chains:
        return graph, dict(params)

    # rewrite: replace each chain's nodes with one qblockchain node at the
    # position of the last add
    drop: dict[str, tuple] = {}   # last-add name -> chain
    dead: set[str] = set()
    for chain in chains:
        for meta, nodes, _, _ in chain:
            dead.update(nd.name for nd in nodes)
        drop[chain[-1][3]] = chain

    new_nodes: list[Node] = []
    for n in graph.nodes:
        if n.name in drop:
            chain = drop[n.name]
            x_name = chain[0][2]
            xs = shapes[x_name]
            pnames: list[str] = []
            battrs = []
            for meta, nodes, _, _ in chain:
                c1, c2, c3 = (by_name[meta["c1"]], by_name[meta["c2"]],
                              by_name[meta["c3"]])
                pnames += list(c1.params) + list(c2.params) + list(c3.params)
                down = by_name[meta["down"]] if meta["down"] else None
                if down is not None:
                    pnames += list(down.params)
                battrs.append({
                    "down": down is not None, "relu": meta["relu"],
                    "sa": meta["sa"], "sb": meta["sb"], "so": meta["so"],
                    "cm": c1.attrs["kshape"][3],
                    "cout": c3.attrs["kshape"][3],
                })
            new_nodes.append(Node(n.name, "qblockchain", (x_name,),
                                  tuple(pnames),
                                  {"blocks": battrs, "h": xs[1],
                                   "w": xs[2]}))
        elif n.name in dead:
            continue
        else:
            new_nodes.append(n)
    g = Graph(graph.name, dict(graph.inputs), graph.outputs, new_nodes,
              dict(graph.params), dict(graph.meta))
    g.validate()
    return g, dict(params)


def _same_pads(size: int, k: int, s: int) -> tuple[int, int]:
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def space_to_depth_stem(graph: Graph, params,
                        input_hw: tuple[int, int] | None = None
                        ) -> tuple[Graph, dict]:
    """Rewrite the first qconv2d stem (odd kxk, stride 2, SAME, small cin)
    into pad + space_to_depth + VALID stride-1 qconv2d. Returns the
    (possibly unchanged) graph and params.

    Requires the stem weight in int8 (run AFTER the engine's predecode so a
    pot4 stem has been materialized — ADVICE r1). input_hw, if omitted, is
    derived from the stem conv's actual input via activation_shapes (the
    graph input may not feed the stem unchanged — ADVICE r1)."""
    stem = None
    for n in graph.nodes:
        if n.op == "qconv2d":
            kh, kw, cin, cout = n.attrs["kshape"]
            sh, sw = n.attrs.get("strides", [1, 1])
            if (sh == sw == 2 and kh == kw and kh % 2 == 1 and kh > 1
                    and cin <= 8 and n.attrs.get("groups", 1) == 1
                    and n.attrs.get("padding", "SAME") == "SAME"
                    and n.attrs.get("wfmt") == "int8"):
                stem = n
            else:
                log.warning("space_to_depth_stem: first conv %s does not "
                            "match the stem pattern (wfmt=%s k=%dx%d s=%dx%d"
                            " cin=%d); rewrite skipped", n.name,
                            n.attrs.get("wfmt"), kh, kw, sh, sw, cin)
            break  # only the first conv is a stem candidate
    if stem is None:
        return graph, dict(params)

    kh, kw, cin, cout = stem.attrs["kshape"]
    if input_hw is None:
        from .shapes import activation_shapes
        xs = activation_shapes(graph, params)[stem.inputs[0]]
        if len(xs) != 4:
            log.warning("space_to_depth_stem: stem input %s is not 4D (%s); "
                        "rewrite skipped", stem.inputs[0], xs)
            return graph, dict(params)
        input_hw = (xs[1], xs[2])
    h, w = input_hw
    ph0, ph1 = _same_pads(h, kh, 2)
    pw0, pw1 = _same_pads(w, kw, 2)
    # padded extent must be even and cover the last window
    hp = h + ph0 + ph1
    wp = w + pw0 + pw1
    ph1 += hp % 2
    pw1 += wp % 2

    # weight: (kh, kw, cin, cout) -> zero-pad taps to 2*ceil(k/2), then
    # fold (dy, dx) into channels matching the executor's s2d order
    w_q = np.asarray(params[stem.params[0]])
    ke = kh + (kh % 2)  # 7 -> 8
    wpad = np.zeros((ke, ke, cin, cout), w_q.dtype)
    wpad[:kh, :kw] = w_q
    # (2a+dy, 2b+dx, c, o) -> (a, b, dy, dx, c, o) -> (a, b, (dy,dx,c), o)
    w4 = (wpad.reshape(ke // 2, 2, ke // 2, 2, cin, cout)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(ke // 2, ke // 2, 4 * cin, cout))

    new_params = dict(params)
    new_params[stem.params[0]] = w4
    new_specs = dict(graph.params)
    new_specs[stem.params[0]] = TensorSpec(w4.shape, str(w4.dtype))

    # Domain choice (measured on v5e-1, 2026-08-20): rearranging the INT8
    # tensor costs more than the stem saves — the quantized image's layout
    # puts C=3 in 4-sublane tiles and N in lanes, so an int8 s2d transpose
    # runs at <40% lane occupancy (round-2 A/B: 4.09 ms vs 3.66 ms whole
    # graph). Hoisting pad+s2d BEFORE the producing `quantize` node runs
    # the rearrange in f32 where XLA fuses it into the quantize pass over
    # the image (one read of the f32 input either way), and the conv then
    # sees cin=12 directly. Padding f32 zeros quantizes to q=0 — exact for
    # the symmetric scheme, same argument as the int8-zero padding above.
    quant = None
    for n in graph.nodes:
        if n.name == stem.inputs[0] and n.op == "quantize":
            consumers = [m for m in graph.nodes if n.name in m.inputs]
            if len(consumers) == 1:
                quant = n
            break

    pad_name = f"{stem.name}__s2d_pad"
    s2d_name = f"{stem.name}__s2d"
    pads_attr = {"pads": [[0, 0], [ph0, ph1], [pw0, pw1], [0, 0]]}
    attrs = dict(stem.attrs, strides=[1, 1], padding="VALID",
                 kshape=[ke // 2, ke // 2, 4 * cin, cout])
    new_nodes: list[Node] = []
    for n in graph.nodes:
        if quant is not None and n.name == quant.name:
            # f32 domain: pad + s2d feed the quantize node itself
            new_nodes.append(Node(pad_name, "pad", (quant.inputs[0],), (),
                                  pads_attr))
            new_nodes.append(Node(s2d_name, "space_to_depth", (pad_name,), (),
                                  {"block": 2}))
            new_nodes.append(Node(quant.name, quant.op, (s2d_name,),
                                  quant.params, dict(quant.attrs)))
            continue
        if n.name != stem.name:
            new_nodes.append(n)
            continue
        if quant is not None:
            new_nodes.append(Node(stem.name, stem.op, stem.inputs,
                                  stem.params, attrs))
        else:
            # int8 domain fallback (stem input not a single-consumer
            # quantize output)
            new_nodes.append(Node(pad_name, "pad", (stem.inputs[0],), (),
                                  pads_attr))
            new_nodes.append(Node(s2d_name, "space_to_depth", (pad_name,), (),
                                  {"block": 2}))
            new_nodes.append(Node(stem.name, stem.op, (s2d_name,),
                                  stem.params, attrs))
    g = Graph(graph.name, dict(graph.inputs), graph.outputs, new_nodes,
              new_specs, dict(graph.meta))
    g.validate()
    return g, new_params
