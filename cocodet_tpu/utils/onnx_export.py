"""jaxpr -> ONNX exporter: serialize any supported jittable forward
(dense, channel-slimmed, or w8a8 fake-int8) straight to an ONNX file —
no torch, no python ``onnx`` package.

Role parity: ref tools/export_onnx.py (torch.onnx route, fixed reference
topology) and demo/ncnn + demo/OpenVINO consumption (ref
demo/ncnn/cpp/yolox.cpp:282-290 loads an onnx-converted param/bin pair).
The torch donor cannot express channel-slimmed widths or the w8a8 graph;
this exporter traces OUR model's jaxpr and emits the graph 1:1, so the
pruned+slim competition artifact class exports directly.

Design:

- ``jax.make_jaxpr`` gives the closed jaxpr; consts (the weights) become
  ONNX initializers, eqns become nodes via a per-primitive emitter table.
- Layout: jax tensors are NHWC; ONNX Conv/MaxPool are NCHW.  Each conv /
  pool is wrapped in Transpose pairs computed FROM the eqn's
  dimension_numbers (correctness first — consumers like onnx2ncnn /
  OpenVINO mo fold inverse-transpose chains, and the in-repo numpy
  evaluator doesn't care).
- Constant folding: any eqn whose inputs are all constants is evaluated
  eagerly (iota grids, broadcast scaffolding, quant-scale math) and lands
  as an initializer instead of graph nodes.
- int8: ``convert_element_type`` to int8/int32 is emitted as a float Cast
  — by the time the w8a8 graph converts, values are already rounded and
  clipped onto the integer grid, so float carriage is value-faithful (the
  QDQ convention: quantize/dequantize simulated in float, runtimes fuse).
- Verification: ``cocodet_tpu.utils.onnx_io`` parses + evaluates the
  emitted file with numpy; tests/test_onnx_export.py closes the loop
  against the jax forward.

Writer follows onnx.proto3 field numbers (mirrors onnx_io's parser).
"""

from __future__ import annotations

import struct
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

# ---------------------------------------------------------------------------
# protobuf writer primitives
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1  # two's-complement for negatives
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _int_field(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _str_field(field: int, s: str) -> bytes:
    return _len_field(field, s.encode())


# TensorProto.DataType
_DTYPE_CODES = {
    np.dtype(np.float32): 1,
    np.dtype(np.int8): 3,
    np.dtype(np.int32): 6,
    np.dtype(np.int64): 7,
    np.dtype(np.bool_): 9,
}


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    if arr.dtype not in _DTYPE_CODES:
        arr = arr.astype(np.float32)
    out = b""
    for d in arr.shape:
        out += _int_field(1, d)
    out += _int_field(2, _DTYPE_CODES[arr.dtype])
    out += _str_field(8, name)
    out += _len_field(9, arr.tobytes())  # raw_data, little-endian
    return out


def _attr(name: str, value: Any) -> bytes:
    out = _str_field(1, name)
    if isinstance(value, bool):
        out += _tag(3, 0) + _varint(int(value)) + _int_field(20, 2)
    elif isinstance(value, int):
        out += _tag(3, 0) + _varint(value) + _int_field(20, 2)
    elif isinstance(value, float):
        out += _tag(2, 5) + struct.pack("<f", value) + _int_field(20, 1)
    elif isinstance(value, (bytes, str)):
        raw = value.encode() if isinstance(value, str) else value
        out += _len_field(4, raw) + _int_field(20, 3)
    elif isinstance(value, (list, tuple)) and value \
            and isinstance(value[0], float):
        payload = b"".join(struct.pack("<f", float(v)) for v in value)
        out += _len_field(7, payload) + _int_field(20, 6)
    elif isinstance(value, (list, tuple)):
        payload = b"".join(_varint(int(v) & ((1 << 64) - 1)) for v in value)
        out += _len_field(8, payload) + _int_field(20, 7)
    else:
        raise TypeError(f"attr {name}: {type(value)}")
    return out


def _node(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
          name: str = "", **attrs) -> bytes:
    out = b""
    for i in inputs:
        out += _str_field(1, i)
    for o in outputs:
        out += _str_field(2, o)
    out += _str_field(3, name or f"{op_type}_{outputs[0]}")
    out += _str_field(4, op_type)
    for k, v in attrs.items():
        out += _len_field(5, _attr(k, v))
    return out


def _value_info(name: str, shape: Sequence[int], dtype_code: int = 1
                ) -> bytes:
    dims = b""
    for d in shape:
        dims += _len_field(1, _int_field(1, d))  # Dimension.dim_value
    tensor_type = _int_field(1, dtype_code) + _len_field(2, dims)
    type_proto = _len_field(1, tensor_type)
    return _str_field(1, name) + _len_field(2, type_proto)


def _model_proto(nodes: List[bytes], initializers: List[bytes],
                 inputs: List[bytes], outputs: List[bytes],
                 opset: int = 13, graph_name: str = "cocodet") -> bytes:
    graph = b""
    for n in nodes:
        graph += _len_field(1, n)
    graph += _str_field(2, graph_name)
    for t in initializers:
        graph += _len_field(5, t)
    for vi in inputs:
        graph += _len_field(11, vi)
    for vi in outputs:
        graph += _len_field(12, vi)
    opset_import = _str_field(1, "") + _int_field(2, opset)
    model = (_int_field(1, 8)  # ir_version
             + _str_field(2, "cocodet_tpu")  # producer_name
             + _len_field(7, graph)
             + _len_field(8, opset_import))
    return model


# ---------------------------------------------------------------------------
# jaxpr walker
# ---------------------------------------------------------------------------


class _Graph:
    """Accumulates nodes + constants; only constants actually referenced
    by a node (or graph output) are serialized — intermediate consts
    (pre-transpose kernels, fold inputs) are dropped."""

    def __init__(self):
        self.nodes: List[tuple] = []  # (op, inputs, outputs, attrs)
        self.consts: Dict[str, np.ndarray] = {}  # name -> known value
        self.counter = 0

    def fresh(self, hint: str = "t") -> str:
        self.counter += 1
        return f"{hint}_{self.counter}"

    def add_const(self, arr: np.ndarray, hint: str = "c") -> str:
        name = self.fresh(hint)
        self.consts[name] = np.asarray(arr)
        return name

    def emit(self, op: str, inputs: Sequence[str], n_out: int = 1,
             hint: Optional[str] = None, **attrs) -> List[str]:
        outs = [self.fresh(hint or op.lower()) for _ in range(n_out)]
        self.nodes.append((op, list(inputs), outs, attrs))
        return outs

    def serialize_nodes(self) -> List[bytes]:
        return [_node(op, ins, outs, **attrs)
                for op, ins, outs, attrs in self.nodes]

    def serialize_live_consts(self) -> List[bytes]:
        live = {n for _, ins, _, _ in self.nodes for n in ins}
        return [_tensor_proto(nm, arr) for nm, arr in self.consts.items()
                if nm in live]


_ELEMENTWISE = {
    "add": "Add", "mul": "Mul", "sub": "Sub", "div": "Div",
    "max": "Max", "min": "Min", "pow": "Pow",
}
_UNARY = {
    "logistic": "Sigmoid", "exp": "Exp", "neg": "Neg", "sign": "Sign",
    "round": "Round", "tanh": "Tanh", "sqrt": "Sqrt", "abs": "Abs",
    "floor": "Floor",
}


class JaxprToOnnx:
    def __init__(self):
        self.g = _Graph()
        self.env: Dict[Any, str] = {}

    # ---- value plumbing ----
    def read(self, var) -> str:
        from jax.extend.core import Literal

        if isinstance(var, Literal):
            return self.g.add_const(np.asarray(var.val), "lit")
        return self.env[var]

    def known(self, name: str) -> Optional[np.ndarray]:
        return self.g.consts.get(name)

    # ---- emitters ----
    def convert(self, closed_jaxpr, example_args, input_names):
        jaxpr = closed_jaxpr.jaxpr
        for cv, cval in zip(jaxpr.constvars, closed_jaxpr.consts):
            self.env[cv] = self.g.add_const(np.asarray(cval), "w")
        assert len(jaxpr.invars) == len(input_names), \
            (len(jaxpr.invars), input_names)
        for iv, nm in zip(jaxpr.invars, input_names):
            self.env[iv] = nm
        self.walk(jaxpr)
        return [self.read(ov) for ov in jaxpr.outvars]

    def walk(self, jaxpr):
        for eqn in jaxpr.eqns:
            self.eqn(eqn)

    def eqn(self, eqn):
        prim = eqn.primitive.name
        ins = [self.read(v) for v in eqn.invars]

        # ---- recurse into call-like primitives ----
        if prim in ("pjit", "jit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "checkpoint",
                    "custom_jvp_call_jaxpr"):
            inner = (eqn.params.get("jaxpr")
                     or eqn.params.get("call_jaxpr")
                     or eqn.params.get("fun_jaxpr"))
            inner_jaxpr = inner.jaxpr if hasattr(inner, "jaxpr") else inner
            consts = getattr(inner, "consts", [])
            saved = self.env
            self.env = dict(saved)
            for cv, cval in zip(inner_jaxpr.constvars, consts):
                self.env[cv] = self.g.add_const(np.asarray(cval), "w")
            for iv, nm in zip(inner_jaxpr.invars, ins):
                self.env[iv] = nm
            self.walk(inner_jaxpr)
            out_names = [self.read(ov) for ov in inner_jaxpr.outvars]
            self.env = saved
            for ov, nm in zip(eqn.outvars, out_names):
                self.env[ov] = nm
            return

        # ---- constant folding (capped: folding a broadcast of a bias
        # into a full feature-map-sized initializer would bloat the file;
        # those stay as Reshape+Expand nodes instead) ----
        out_elems = sum(int(np.prod(ov.aval.shape))
                        for ov in eqn.outvars if hasattr(ov, "aval"))
        if out_elems <= (1 << 16) \
                and all(self.known(n) is not None for n in ins):
            import jax

            with jax.default_device(jax.devices("cpu")[0]):
                vals = [self.known(n) for n in ins]
                outs = eqn.primitive.bind(
                    *[np.asarray(v) for v in vals], **eqn.params)
            outs = outs if eqn.primitive.multiple_results else [outs]
            for ov, val in zip(eqn.outvars, outs):
                self.env[ov] = self.g.add_const(np.asarray(val), "cf")
            return

        handler = getattr(self, f"op_{prim}", None)
        if handler is None:
            raise NotImplementedError(
                f"onnx_export: unsupported primitive '{prim}' "
                f"(params: {list(eqn.params)})")
        out_names = handler(ins, eqn)
        outs = (eqn.outvars if eqn.primitive.multiple_results
                else eqn.outvars[:1])
        for ov, nm in zip(outs, out_names):
            self.env[ov] = nm

    # ---- broadcasting helper: jax eqns carry explicit broadcast_in_dim;
    # ONNX elementwise ops broadcast numpy-style, so we materialize the
    # aligned shape with Reshape and let Expand handle the rest ----
    def op_broadcast_in_dim(self, ins, eqn):
        shape = eqn.params["shape"]
        bd = eqn.params["broadcast_dimensions"]
        aligned = [1] * len(shape)
        for src_ax, dst_ax in enumerate(bd):
            aligned[dst_ax] = -1  # filled by Reshape 0/-1 semantics below
        # Reshape needs concrete dims: use the input's dims at bd slots
        in_shape = eqn.invars[0].aval.shape
        for src_ax, dst_ax in enumerate(bd):
            aligned[dst_ax] = int(in_shape[src_ax])
        shp = self.g.add_const(np.asarray(aligned, np.int64), "shape")
        r = self.g.emit("Reshape", [ins[0], shp], hint="bcast_r")[0]
        tgt = self.g.add_const(np.asarray(shape, np.int64), "shape")
        return self.g.emit("Expand", [r, tgt], hint="bcast")

    def _binary(self, onnx_op, ins):
        return self.g.emit(onnx_op, ins)

    def op_convert_element_type(self, ins, eqn):
        # float carriage for everything (see module docstring): values on
        # integer grids stay exact in f32; bf16 rounds are dropped (the
        # export target computes f32 anyway).
        return self.g.emit("Cast", ins, to=1)

    def op_reshape(self, ins, eqn):
        assert eqn.params.get("dimensions") is None, "reshape w/ dimensions"
        shp = self.g.add_const(
            np.asarray(eqn.params["new_sizes"], np.int64), "shape")
        return self.g.emit("Reshape", [ins[0], shp])

    def op_transpose(self, ins, eqn):
        return self.g.emit("Transpose", ins,
                           perm=list(eqn.params["permutation"]))

    def op_concatenate(self, ins, eqn):
        return self.g.emit("Concat", ins, axis=int(eqn.params["dimension"]))

    def op_slice(self, ins, eqn):
        starts = np.asarray(eqn.params["start_indices"], np.int64)
        ends = np.asarray(eqn.params["limit_indices"], np.int64)
        steps = np.asarray(eqn.params["strides"] or
                           [1] * len(starts), np.int64)
        axes = np.arange(len(starts), dtype=np.int64)
        return self.g.emit("Slice", [
            ins[0], self.g.add_const(starts, "starts"),
            self.g.add_const(ends, "ends"),
            self.g.add_const(axes, "axes"),
            self.g.add_const(steps, "steps")])

    def op_rev(self, ins, eqn):
        # rev via Slice with negative steps
        dims = eqn.params["dimensions"]
        shape = eqn.invars[0].aval.shape
        starts = np.asarray([shape[d] - 1 for d in dims], np.int64)
        ends = np.asarray([-(2 ** 31)] * len(dims), np.int64)
        steps = np.asarray([-1] * len(dims), np.int64)
        axes = np.asarray(list(dims), np.int64)
        return self.g.emit("Slice", [
            ins[0], self.g.add_const(starts, "starts"),
            self.g.add_const(ends, "ends"),
            self.g.add_const(axes, "axes"),
            self.g.add_const(steps, "steps")])

    def op_clamp(self, ins, eqn):
        # lax.clamp(min, x, max)
        return self.g.emit("Clip", [ins[1], ins[0], ins[2]])

    def op_integer_pow(self, ins, eqn):
        y = self.g.add_const(np.float32(eqn.params["y"]), "pow")
        return self.g.emit("Pow", [ins[0], y])

    def op_select_n(self, ins, eqn):
        # select_n(pred, on_false, on_true) with bool pred -> Where
        assert len(ins) == 3, "select_n with >2 cases"
        return self.g.emit("Where", [ins[0], ins[2], ins[1]])

    def op_conv_general_dilated(self, ins, eqn):
        p = eqn.params
        dn = p["dimension_numbers"]
        lhs_spec, rhs_spec, out_spec = dn
        ndim = len(lhs_spec)
        assert ndim == 4, "only 2-D convs"
        assert tuple(p["lhs_dilation"]) == (1, 1), "transposed conv"
        strides = [int(s) for s in p["window_strides"]]
        pads = p["padding"]  # ((lo,hi), (lo,hi))
        dilations = [int(d) for d in p["rhs_dilation"]]
        groups = int(p["feature_group_count"])

        # operand -> NCHW
        x_perm = [lhs_spec[0], lhs_spec[1]] + list(lhs_spec[2:])
        x = self.g.emit("Transpose", [ins[0]], perm=x_perm, hint="nchw")[0]
        # kernel -> OIHW.  rhs_spec = (out_ax, in_ax, *spatial_ax)
        k_perm = [rhs_spec[0], rhs_spec[1]] + list(rhs_spec[2:])
        kval = self.known(ins[1])
        if kval is not None:
            k = self.g.add_const(
                np.transpose(np.asarray(kval, np.float32), k_perm), "W")
        else:
            k = self.g.emit("Transpose", [ins[1]], perm=k_perm,
                            hint="Wt")[0]
        y = self.g.emit(
            "Conv", [x, k], hint="conv",
            strides=strides,
            pads=[int(pads[0][0]), int(pads[1][0]),
                  int(pads[0][1]), int(pads[1][1])],
            dilations=dilations, group=groups)[0]
        # NCHW -> out layout: out_spec gives where (N, C, *sp) LAND.
        inv = [0] * ndim
        for src, dst in enumerate([out_spec[0], out_spec[1]]
                                  + list(out_spec[2:])):
            inv[dst] = src
        return self.g.emit("Transpose", [y], perm=inv, hint="nhwc")

    def op_reduce_window_max(self, ins, eqn):
        p = eqn.params
        wd = p["window_dimensions"]
        ws = p["window_strides"]
        pads = p["padding"]
        assert tuple(p["base_dilation"]) == (1,) * len(wd)
        assert tuple(p["window_dilation"]) == (1,) * len(wd)
        assert len(wd) == 4 and wd[0] == 1 and wd[3] == 1, \
            f"non-NHWC pool window {wd}"
        assert pads[0] == (0, 0) and pads[3] == (0, 0)
        x = self.g.emit("Transpose", [ins[0]], perm=[0, 3, 1, 2],
                        hint="nchw")[0]
        y = self.g.emit(
            "MaxPool", [x], hint="pool",
            kernel_shape=[int(wd[1]), int(wd[2])],
            strides=[int(ws[1]), int(ws[2])],
            pads=[int(pads[1][0]), int(pads[2][0]),
                  int(pads[1][1]), int(pads[2][1])])[0]
        return self.g.emit("Transpose", [y], perm=[0, 2, 3, 1],
                           hint="nhwc")

    def op_squeeze(self, ins, eqn):
        shp = self.g.add_const(
            np.asarray(eqn.outvars[0].aval.shape, np.int64), "shape")
        return self.g.emit("Reshape", [ins[0], shp])

    def op_expand_dims(self, ins, eqn):
        shp = self.g.add_const(
            np.asarray(eqn.outvars[0].aval.shape, np.int64), "shape")
        return self.g.emit("Reshape", [ins[0], shp])

    def op_stop_gradient(self, ins, eqn):
        return [ins[0]]

    def op_copy(self, ins, eqn):
        return [ins[0]]


def _make_elementwise(onnx_op):
    def handler(self, ins, eqn):
        return self.g.emit(onnx_op, ins)

    return handler


for _jprim, _onnx in _ELEMENTWISE.items():
    setattr(JaxprToOnnx, f"op_{_jprim}", _make_elementwise(_onnx))
for _jprim, _onnx in _UNARY.items():
    setattr(JaxprToOnnx, f"op_{_jprim}", _make_elementwise(_onnx))


def export_fn_to_onnx(fn: Callable, example_args, out_path: str,
                      input_names: Sequence[str] = ("images",),
                      output_names: Sequence[str] = ("output",),
                      opset: int = 13) -> int:
    """Trace ``fn(*example_args)`` and write ONNX; returns byte count.

    Inputs/outputs must be (pytrees of) arrays; names map positionally to
    the FLATTENED inputs/outputs.
    """
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        closed = jax.make_jaxpr(fn)(*example_args)
    conv = JaxprToOnnx()
    flat_in, _ = jax.tree_util.tree_flatten(example_args)
    assert len(flat_in) == len(input_names), \
        f"{len(flat_in)} inputs need {len(flat_in)} names"
    out_vals = conv.convert(closed, flat_in, list(input_names))
    assert len(out_vals) == len(output_names), \
        (f"{len(out_vals)} outputs need names", output_names)

    # bind each output to its requested name with an Identity node (also
    # covers outputs that constant-folded all the way to initializers,
    # e.g. anchor grids)
    for nm, want in zip(out_vals, output_names):
        conv.g.nodes.append(("Identity", [nm], [want], {}))

    in_infos = [
        _value_info(nm, v.shape)
        for nm, v in zip(input_names, flat_in)
    ]
    out_avals = closed.jaxpr.outvars
    out_infos = [
        _value_info(nm, ov.aval.shape)
        for nm, ov in zip(output_names, out_avals)
    ]
    blob = _model_proto(conv.g.serialize_nodes(),
                        conv.g.serialize_live_consts(), in_infos,
                        out_infos, opset=opset)
    with open(out_path, "wb") as f:
        f.write(blob)
    return len(blob)
