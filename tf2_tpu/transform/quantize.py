"""Graph quantizer — rewrites an FP32 IR graph into a fused quantized graph.

Reference parity: TF2's TransForm Kit marks requant points and emits a
compressed graph the runtime executes with shift-add MACs (SURVEY.md §4.2).
Here the rewrite produces fused ``qconv2d``/``qdense``/``qadd``/``qconcat``
nodes that carry 4-bit-packed PoT codes (or per-channel int8 for first/last
layers, the ShiftCNN accuracy recipe) plus precomputed requant vectors:

    acc_i32 = conv_int8(x_q, decode(codes))
    y_q     = clip(round(acc_i32 * eff_scale_c + eff_bias_c))      # epilogue
    eff_scale_c = s_in * s_w_c / s_out ;  eff_bias_c = b_c / s_out

Activations stay int8 through conv/pool/add/concat chains; ops with no
integer semantics (lrn, softmax, avgpool, ...) run fp32 behind dequantize
nodes. The epilogue algebra is exactly what the Pallas kernels fuse
in-register (kernels/qconv.py), so the jnp reference path and the
kernel path share one artifact.
"""
from __future__ import annotations

import dataclasses
from typing import Mapping

import numpy as np

from ..graph.ir import Graph, Node, TensorSpec
from . import potq

# ops that pass int8 through unchanged (same scale)
_PASSTHROUGH = {"maxpool", "reshape", "flatten", "identity", "dropout",
                "transpose", "pad", "take_token"}


@dataclasses.dataclass
class QuantSpec:
    """Per-model quantization policy."""
    weight_bits: int = 4              # 4 => PoT codes; 8 => linear int8
    first_last_w8: bool = True        # keep first/last layers at W8
    act_estimator: str = "percentile"
    pot_candidates: int = 33
    bias_correct: bool = True         # fold mean quant error into eff_bias
                                      # (transform/bias_correct.py)
    int8_residual: bool = True        # transformers: keep the residual
                                      # stream int8 through layer_norm /
                                      # gelu / bias_add (qlayernorm, qgelu,
                                      # qbias_add) instead of dropping to
                                      # the f32 dq/q sandwich. r4 profile:
                                      # the f32 glue cost 37% of ViT's step
    fold_residual: bool = True        # qadd(x, qdense_out) with a single-
                                      # consumer dense: requant the dense
                                      # straight to the add's grid and add
                                      # the residual inside the epilogue —
                                      # deletes a standalone int8 pass over
                                      # the (N,T,D) stream per residual
                                      # (24 passes/step in ViT-B/16). One
                                      # fewer intermediate rounding than
                                      # the unfused pair (slightly MORE
                                      # accurate; semantics live in the
                                      # artifact so all backends agree)
    equalize_concat: bool = True      # force concat-branch producers onto
                                      # the concat's scale so qconcat is a
                                      # PURE concat (no per-input rescale
                                      # chains; GoogLeNet's 9 inception
                                      # concats each rescale up to 4 int8
                                      # tensors otherwise). Producers'
                                      # eff_scales absorb the change; only
                                      # single-consumer inputs are touched


@dataclasses.dataclass
class QuantizedArtifact:
    graph: Graph
    params: dict[str, np.ndarray]

    def size_bytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self.params.values())


def _fit_weight(w: np.ndarray, bits: int, spec: QuantSpec):
    """w: (K, C). Returns (q_int8, w_scale (C,), codes_packed_or_None)."""
    if bits == 4:
        q, s = potq.fit_pot(w, n_candidates=spec.pot_candidates)
        packed = potq.pack_codes(potq.pot_encode_from_int8(q))
        return q, s, packed
    q, s = potq.fit_int8(w)
    return q, s, None


def quantize_graph(graph: Graph, params: Mapping[str, np.ndarray],
                   act_scales: Mapping[str, float],
                   spec: QuantSpec | None = None) -> QuantizedArtifact:
    """Rewrite ``graph`` (BN already folded) into a quantized graph.

    ``act_scales`` comes from transform.calibrate on the folded graph and
    must contain every float value name referenced here.
    """
    spec = spec or QuantSpec()
    graph.validate()
    node_map = graph.node_map()
    consumers = graph.consumers()

    if spec.equalize_concat:
        # Rescale-free concats: every single-consumer input of a concat is
        # re-calibrated to the concat's own scale. The branch conv's
        # epilogue then emits int8 directly on the concat grid (eff_scale
        # absorbs it) and dispatch.qconcat's |si - so| < 1e-12 fast path
        # makes the concat a byte-copy. Branch ranges in inception blocks
        # are near-identical, so the coarser grid costs little accuracy
        # (golden rel_err measured before/after in BASELINE.md §4.2).
        act_scales = dict(act_scales)
        for node in graph.nodes:
            if node.op != "concat" or node.name not in act_scales:
                continue
            for i in node.inputs:
                if i in act_scales and len(consumers.get(i, [])) == 1:
                    act_scales[i] = act_scales[node.name]

    # "first layer" = first conv/dense on any path from a graph input,
    # tracing through layout/passthrough ops (the patchified ViT stem puts
    # reshape/transpose between the image and its embedding dense)
    from_input = set(graph.inputs)
    for n in graph.nodes:
        if n.op in _PASSTHROUGH and n.inputs[0] in from_input:
            from_input.add(n.name)
    first_names = {n.name for n in graph.nodes
                   if n.op in ("conv2d", "dense") and
                   any(i in from_input for i in n.inputs)}
    last_name = next((n.name for n in reversed(graph.nodes)
                      if n.op in ("conv2d", "dense")), None)

    new_nodes: list[Node] = []
    new_params: dict[str, np.ndarray] = {}
    new_specs: dict[str, TensorSpec] = {}
    # value name (original graph) -> (value name in new graph, scale or None)
    val: dict[str, tuple[str, float | None]] = {
        i: (i, None) for i in graph.inputs}
    qcache: dict[str, str] = {}   # fp value -> inserted quantize node name
    dqcache: dict[str, str] = {}  # q8 value -> inserted dequantize node name
    fused: set[str] = set()       # node names consumed by fusion (skip)

    def add_param(name: str, arr: np.ndarray) -> str:
        new_params[name] = arr
        new_specs[name] = TensorSpec(tuple(arr.shape), str(arr.dtype))
        return name

    def get_q8(orig: str) -> tuple[str, float]:
        """New-graph int8 value for original value ``orig``."""
        nv, s = val[orig]
        if s is not None:
            return nv, s
        if orig in qcache:
            return qcache[orig], act_scales[orig] if orig in act_scales else None
        scale = float(act_scales[orig])
        qname = f"{orig}__q"
        new_nodes.append(Node(qname, "quantize", (nv,), (), {"scale": scale}))
        qcache[orig] = qname
        return qname, scale

    def get_fp(orig: str) -> str:
        nv, s = val[orig]
        if s is None:
            return nv
        if orig in dqcache:
            return dqcache[orig]
        dqname = f"{orig}__dq"
        new_nodes.append(Node(dqname, "dequantize", (nv,), (), {"scale": s}))
        dqcache[orig] = dqname
        return dqname

    def relu_fusion(node: Node) -> tuple[bool, str]:
        """If node's sole consumer is a relu, fuse it: the emitted q-node
        takes the relu's name so downstream references resolve."""
        cons = consumers.get(node.name, [])
        if len(cons) == 1 and cons[0].op == "relu" and node.name in graph.outputs:
            return False, node.name
        if len(cons) == 1 and cons[0].op == "relu":
            fused.add(cons[0].name)
            return True, cons[0].name
        return False, node.name

    for node in graph.nodes:
        if node.name in fused:
            continue

        if node.op in ("conv2d", "dense"):
            has_relu, out_name = relu_fusion(node)
            xin, s_in = get_q8(node.inputs[0])
            s_out = float(act_scales[out_name])
            w = np.asarray(params[node.params[0]], np.float32)
            if node.op == "conv2d":
                kh, kw, cin_g, cout = w.shape
                w2d = w.reshape(-1, cout)
            else:
                cout = w.shape[-1]
                w2d = w
            bits = spec.weight_bits
            if spec.first_last_w8 and (node.name in first_names or
                                       node.name == last_name):
                bits = 8
            q, w_scale, packed = _fit_weight(w2d, bits, spec)
            b = (np.asarray(params[node.params[1]], np.float32)
                 if len(node.params) > 1 else np.zeros((cout,), np.float32))
            eff_scale = np.asarray(s_in * w_scale / s_out, np.float32)
            eff_bias = np.asarray(b / s_out, np.float32)
            p = []
            attrs = {"relu": has_relu, "in_scale": s_in, "out_scale": s_out,
                     "wbits": bits}
            if packed is not None:
                p.append(add_param(f"{out_name}.wp", packed))
                attrs["wfmt"] = "pot4"
            else:
                p.append(add_param(f"{out_name}.wq", q.reshape(w.shape).astype(np.int8)
                                   if node.op == "conv2d" else q.astype(np.int8)))
                attrs["wfmt"] = "int8"
            p.append(add_param(f"{out_name}.es", eff_scale))
            p.append(add_param(f"{out_name}.eb", eff_bias))
            if node.op == "conv2d":
                attrs.update(strides=node.attrs.get("strides", [1, 1]),
                             padding=node.attrs.get("padding", "SAME"),
                             groups=node.attrs.get("groups", 1),
                             kshape=[kh, kw, cin_g, cout])
                new_nodes.append(Node(out_name, "qconv2d", (xin,), tuple(p), attrs))
            else:
                attrs["kshape"] = [w.shape[0], cout]
                new_nodes.append(Node(out_name, "qdense", (xin,), tuple(p), attrs))
            val[out_name] = (out_name, s_out)
            if node.name != out_name:
                val[node.name] = (out_name, s_out)  # pre-relu refs (shouldn't occur)
            continue

        if node.op == "add":
            _, sa = val[node.inputs[0]]
            _, sb = val[node.inputs[1]]
            if sa is not None and sb is not None:
                has_relu, out_name = relu_fusion(node)
                s_out = float(act_scales[out_name])
                a, _ = get_q8(node.inputs[0])
                bq, _ = get_q8(node.inputs[1])
                if spec.fold_residual:
                    folded = False
                    for d_orig, r_new, s_r in ((node.inputs[1], a, sa),
                                               (node.inputs[0], bq, sb)):
                        nv, s_mid = val[d_orig]
                        if s_mid is None or d_orig in graph.outputs or \
                                len(consumers.get(d_orig, [])) != 1:
                            continue
                        idx = next((i for i in range(len(new_nodes) - 1, -1, -1)
                                    if new_nodes[i].name == nv), None)
                        if idx is None or new_nodes[idx].op != "qdense":
                            continue
                        cand = new_nodes[idx]
                        if cand.attrs.get("relu"):
                            # relu-before-add: the epilogue applies relu
                            # once at the end, which would change
                            # relu(d)+r into relu(d+r) — don't fold
                            continue
                        # requant the dense directly onto the add's grid
                        # (skip the intermediate s_mid rounding) and add
                        # the residual in-epilogue: one fused pass
                        ratio = np.float32(s_mid / s_out)
                        new_params[cand.params[1]] = np.asarray(
                            new_params[cand.params[1]] * ratio, np.float32)
                        new_params[cand.params[2]] = np.asarray(
                            new_params[cand.params[2]] * ratio, np.float32)
                        attrs = dict(cand.attrs)
                        attrs.update(out_scale=s_out,
                                     radd_scale=float(s_r / s_out),
                                     relu=has_relu)
                        new_nodes[idx] = Node(out_name, "qdense",
                                              (cand.inputs[0], r_new),
                                              cand.params, attrs)
                        val[out_name] = (out_name, s_out)
                        val[d_orig] = (out_name, s_out)
                        folded = True
                        break
                    if folded:
                        continue
                new_nodes.append(Node(out_name, "qadd", (a, bq), (),
                                      {"sa": sa, "sb": sb, "so": s_out,
                                       "relu": has_relu}))
                val[out_name] = (out_name, s_out)
                continue
            # fall through to fp path

        if node.op == "concat":
            states = [val[i] for i in node.inputs]
            if all(s is not None for _, s in states):
                s_out = float(act_scales[node.name])
                new_nodes.append(Node(node.name, "qconcat",
                                      tuple(nv for nv, _ in states), (),
                                      {"in_scales": [s for _, s in states],
                                       "out_scale": s_out,
                                       "axis": node.attrs.get("axis", -1)}))
                val[node.name] = (node.name, s_out)
                continue

        if node.op == "attention_core":
            nv, s_in = val[node.inputs[0]]
            if s_in is not None:
                # int8 QK^T and int8 PV with fp32 softmax between
                # (SURVEY.md §6.7). Probs are quantized at the fixed scale
                # 1/127 (softmax output ∈ [0,1]); only calibrated
                # graph-value scales are needed — s_in is the qkv dense's
                # output scale, s_out this node's calibrated scale.
                s_out = float(act_scales[node.name])
                new_nodes.append(Node(node.name, "qattention_core", (nv,), (),
                                      {"heads": node.attrs["heads"],
                                       "dim": node.attrs["dim"],
                                       "s_in": s_in, "s_out": s_out}))
                val[node.name] = (node.name, s_out)
                continue
            # fp input: fall through to the default fp path

        if node.op == "lrn":
            nv, s_in = val[node.inputs[0]]
            if s_in is not None and node.name in act_scales:
                # first-class quantized LRN (kernels/qlrn.py): int8 in ->
                # int8 out in one fused pass, keeping the int8 chain alive
                # through the pool/concat ops that follow (GoogLeNet:
                # lrn_1 -> maxpool_1 -> {quantize, inception pool branch}
                # made the load-time dq->lrn->q fusion unmatchable —
                # quantize-time emission is the structural fix; v5e-1
                # 2026-08-21: the unfused chain cost ~860 us/step b64)
                s_out = float(act_scales[node.name])
                new_nodes.append(Node(node.name, "qlrn", (nv,), (), {
                    "radius": node.attrs.get("radius", 2),
                    "alpha": node.attrs.get("alpha", 1e-4),
                    "beta": node.attrs.get("beta", 0.75),
                    "bias": node.attrs.get("bias", 1.0),
                    "s_in": s_in, "s_out": s_out}))
                val[node.name] = (node.name, s_out)
                continue
            # fp input: fall through to the default fp path

        if spec.int8_residual and node.op == "layer_norm":
            nv, s_in = val[node.inputs[0]]
            if s_in is not None and node.name in act_scales:
                # int8-resident LN (dispatch.qlayernorm): normalization is
                # scale-invariant so the int8 codes normalize directly; the
                # affine + requant fold into one in-register FMA. Keeps the
                # (N,T,D) residual stream int8 across the whole block.
                s_out = float(act_scales[node.name])
                for pname in node.params:
                    add_param(pname, np.asarray(params[pname]))
                new_nodes.append(Node(node.name, "qlayernorm", (nv,),
                                      node.params,
                                      {"eps": node.attrs.get("eps", 1e-6),
                                       "s_in": s_in, "s_out": s_out}))
                val[node.name] = (node.name, s_out)
                continue
            # fp input: fall through to the default fp path

        if spec.int8_residual and node.op == "gelu":
            nv, s_in = val[node.inputs[0]]
            if s_in is not None and node.name in act_scales:
                # exact fusion of dq -> gelu -> q (same f32 math): the MLP
                # hidden (N,T,4D) tensor stays int8 at fusion boundaries
                s_out = float(act_scales[node.name])
                new_nodes.append(Node(node.name, "qgelu", (nv,), (),
                                      {"s_in": s_in, "s_out": s_out}))
                val[node.name] = (node.name, s_out)
                continue

        if spec.int8_residual and node.op == "bias_add":
            nv, s_in = val[node.inputs[0]]
            if s_in is not None and node.name in act_scales:
                # bias/pos-embed add on the int8 grid; param pre-divided by
                # s_out so the op is one FMA + requant
                s_out = float(act_scales[node.name])
                b = np.asarray(params[node.params[0]], np.float32)
                p = add_param(f"{node.name}.bq",
                              np.asarray(b / s_out, np.float32))
                new_nodes.append(Node(node.name, "qbias_add", (nv,), (p,),
                                      {"s_in": s_in, "s_out": s_out}))
                val[node.name] = (node.name, s_out)
                continue

        if spec.int8_residual and node.op == "prepend_token":
            nv, s_in = val[node.inputs[0]]
            if s_in is not None:
                # pre-quantize the class token onto the stream's grid:
                # the op itself is dtype-generic (concat of a broadcast
                # param), so the int8 graph reuses it with an int8 param
                tok = np.asarray(params[node.params[0]], np.float32)
                p = add_param(f"{node.name}.tq", np.clip(
                    np.round(tok / s_in), -127, 127).astype(np.int8))
                new_nodes.append(Node(node.name, "prepend_token", (nv,),
                                      (p,), dict(node.attrs)))
                val[node.name] = (node.name, s_in)
                continue

        if node.op in _PASSTHROUGH:
            nv, s = val[node.inputs[0]]
            new_nodes.append(Node(node.name, node.op, (nv,), node.params,
                                  dict(node.attrs)))
            val[node.name] = (node.name, s)
            continue

        # default: fp op — dequantize any int8 inputs, keep params
        fp_inputs = tuple(get_fp(i) for i in node.inputs)
        new_nodes.append(Node(node.name, node.op, fp_inputs, node.params,
                              dict(node.attrs)))
        for pname in node.params:
            add_param(pname, np.asarray(params[pname]))
        val[node.name] = (node.name, None)

    outputs = tuple(get_fp(o) for o in graph.outputs)
    g = Graph(graph.name, dict(graph.inputs), outputs, new_nodes, new_specs,
              {**graph.meta, "quantized": True,
               "weight_bits": spec.weight_bits})
    g.validate()
    return QuantizedArtifact(g, new_params)
