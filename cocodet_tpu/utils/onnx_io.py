"""Self-contained ONNX artifact tooling: a minimal protobuf-wire reader and
a numpy evaluator for the op set the YOLOX export emits.

Why hand-rolled: this environment ships neither the ``onnx`` package nor
``onnxruntime``, yet the reference's deliverable includes an ONNX artifact
plus a runnable demo (ref tools/export_onnx.py:56-113,
demo/ONNXRuntime/onnx_inference.py).  tools/export_onnx.py produces the
artifact through torch's C++ serializer (validated by the compiled-in
``torch._C._check_onnx_proto`` checker); this module independently parses
the protobuf bytes and executes the graph with numpy so the artifact can be
verified — and demoed — with zero external dependencies.

Scope: the subset of ONNX used by the exported detectors — Conv, Sigmoid,
Mul, Add, Concat, MaxPool, Resize(nearest), Slice, Transpose, Reshape,
Constant, Shape/Gather/Unsqueeze (shape-compute residue), Softmax, Split,
Pow, Exp, Div, Sub, MatMul, Gemm.  Unknown ops raise loudly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# protobuf wire-format reader (schema subset of onnx.proto)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) triples of one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


_TENSOR_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16,
                  5: np.int16, 6: np.int32, 7: np.int64, 9: np.bool_,
                  10: np.float16, 11: np.float64, 12: np.uint32,
                  13: np.uint64}


def _signed(v: int) -> int:
    """varint -> two's-complement int64 (negative axes etc.)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = None
    raw = b""
    name = ""
    i32: List[int] = []
    i64: List[int] = []
    f32: List[float] = []
    f64: List[float] = []
    for field, wire, val in _fields(buf):
        if field == 1:
            dims.append(_signed(val))
        elif field == 2:
            dtype = val
        elif field == 4 and wire == 2:  # packed float_data
            f32.extend(np.frombuffer(val, np.float32).tolist())
        elif field == 4 and wire == 5:
            f32.append(np.frombuffer(val, np.float32)[0])
        elif field == 5 and wire == 2:  # packed int32_data
            pos = 0
            while pos < len(val):
                v, pos = _read_varint(val, pos)
                i32.append(_signed(v))
        elif field == 5 and wire == 0:
            i32.append(_signed(val))
        elif field == 7 and wire == 2:  # packed int64_data
            pos = 0
            while pos < len(val):
                v, pos = _read_varint(val, pos)
                i64.append(_signed(v))
        elif field == 7 and wire == 0:
            i64.append(_signed(val))
        elif field == 8:
            name = val.decode()
        elif field == 9:
            raw = val
        elif field == 10 and wire == 2:  # packed double_data
            f64.extend(np.frombuffer(val, np.float64).tolist())
    np_dtype = _TENSOR_DTYPES[dtype]
    if raw:
        arr = np.frombuffer(raw, np_dtype)
    elif f32:
        arr = np.asarray(f32, np.float32).astype(np_dtype)
    elif f64:
        arr = np.asarray(f64, np.float64).astype(np_dtype)
    elif i64:
        arr = np.asarray(i64, np.int64).astype(np_dtype)
    elif i32:
        arr = np.asarray(i32, np.int64).astype(np_dtype)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr


def _parse_attribute(buf: bytes) -> Tuple[str, Any]:
    name = ""
    atype = None
    f = i = s = t = None
    floats: List[float] = []
    ints: List[int] = []
    strings: List[bytes] = []
    for field, wire, val in _fields(buf):
        if field == 1:
            name = val.decode()
        elif field == 20:
            atype = val
        elif field == 2:
            f = np.frombuffer(val, np.float32)[0]
        elif field == 3:
            i = _signed(val)
        elif field == 4:
            s = val
        elif field == 5:
            t = parse_tensor(val)[1]
        elif field == 7:
            if wire == 2:
                floats.extend(np.frombuffer(val, np.float32).tolist())
            else:
                floats.append(np.frombuffer(val, np.float32)[0])
        elif field == 8:
            if wire == 2:
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    ints.append(_signed(v))
            else:
                ints.append(_signed(val))
        elif field == 9:
            strings.append(val)
    value = {1: f, 2: i, 3: s, 4: t, 6: floats, 7: ints, 8: strings}.get(
        atype)
    return name, value


class OnnxNode:
    __slots__ = ("op_type", "inputs", "outputs", "attrs", "name")

    def __init__(self):
        self.op_type = ""
        self.inputs: List[str] = []
        self.outputs: List[str] = []
        self.attrs: Dict[str, Any] = {}
        self.name = ""


def _parse_node(buf: bytes) -> OnnxNode:
    node = OnnxNode()
    for field, _, val in _fields(buf):
        if field == 1:
            node.inputs.append(val.decode())
        elif field == 2:
            node.outputs.append(val.decode())
        elif field == 3:
            node.name = val.decode()
        elif field == 4:
            node.op_type = val.decode()
        elif field == 5:
            k, v = _parse_attribute(val)
            node.attrs[k] = v
    return node


def _value_info_name(buf: bytes) -> str:
    for field, _, val in _fields(buf):
        if field == 1:
            return val.decode()
    return ""


class OnnxModel:
    def __init__(self):
        self.nodes: List[OnnxNode] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self.inputs: List[str] = []
        self.outputs: List[str] = []
        self.opset: int = 0
        self.ir_version: int = 0


def load_onnx(path_or_bytes) -> OnnxModel:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            data = fh.read()
    model = OnnxModel()
    graph_buf = None
    for field, _, val in _fields(data):
        if field == 1:
            model.ir_version = val
        elif field == 7:
            graph_buf = val
        elif field == 8:  # opset_import
            for f2, _, v2 in _fields(val):
                if f2 == 2:
                    model.opset = max(model.opset, v2)
    if graph_buf is None:
        raise ValueError("no graph in ONNX file")
    for field, _, val in _fields(graph_buf):
        if field == 1:
            model.nodes.append(_parse_node(val))
        elif field == 5:
            name, arr = parse_tensor(val)
            model.initializers[name] = arr
        elif field == 11:
            model.inputs.append(_value_info_name(val))
        elif field == 12:
            model.outputs.append(_value_info_name(val))
    # graph inputs that have initializers are weights, not runtime inputs
    model.inputs = [n for n in model.inputs
                    if n not in model.initializers]
    return model


# ---------------------------------------------------------------------------
# numpy evaluator
# ---------------------------------------------------------------------------


def _conv(x, w, b, attrs):
    """Grouped 2D convolution, NCHW/OIHW (ONNX Conv)."""
    strides = attrs.get("strides", [1, 1])
    pads = attrs.get("pads", [0, 0, 0, 0])
    dilations = attrs.get("dilations", [1, 1])
    groups = attrs.get("group", 1) or 1
    if any(d != 1 for d in dilations):
        raise NotImplementedError("dilated conv")
    n, cin, h, wdt = x.shape
    cout, cin_g, kh, kw = w.shape
    x = np.pad(x, ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])))
    oh = (x.shape[2] - kh) // strides[0] + 1
    ow = (x.shape[3] - kw) // strides[1] + 1
    # im2col per group, contracted with a single matmul
    out = np.empty((n, cout, oh, ow), np.float32)
    cpg = cout // groups
    for g in range(groups):
        xg = x[:, g * cin_g:(g + 1) * cin_g]
        cols = np.empty((n, cin_g * kh * kw, oh * ow), np.float32)
        idx = 0
        for dy in range(kh):
            for dx in range(kw):
                patch = xg[:, :, dy:dy + oh * strides[0]:strides[0],
                           dx:dx + ow * strides[1]:strides[1]]
                cols[:, idx * cin_g:(idx + 1) * cin_g] = patch.reshape(
                    n, cin_g, -1)
                idx += 1
        # weight layout matching the col order (dy, dx, cin)
        wg = w[g * cpg:(g + 1) * cpg].transpose(2, 3, 1, 0).reshape(
            -1, cpg)
        out[:, g * cpg:(g + 1) * cpg] = (
            cols.transpose(0, 2, 1) @ wg).transpose(0, 2, 1).reshape(
            n, cpg, oh, ow)
    if b is not None:
        out += b.reshape(1, -1, 1, 1)
    return out


def _maxpool(x, attrs):
    kh, kw = attrs["kernel_shape"]
    strides = attrs.get("strides", [1, 1])
    pads = attrs.get("pads", [0, 0, 0, 0])
    x = np.pad(x, ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])),
               constant_values=-np.inf)
    oh = (x.shape[2] - kh) // strides[0] + 1
    ow = (x.shape[3] - kw) // strides[1] + 1
    out = np.full((x.shape[0], x.shape[1], oh, ow), -np.inf, x.dtype)
    for dy in range(kh):
        for dx in range(kw):
            out = np.maximum(
                out, x[:, :, dy:dy + oh * strides[0]:strides[0],
                       dx:dx + ow * strides[1]:strides[1]])
    return out


def _resize(vals, node):
    x = vals[node.inputs[0]]
    mode = (node.attrs.get("mode") or b"nearest").decode()
    scales = sizes = None
    if len(node.inputs) > 2 and node.inputs[2]:
        scales = vals[node.inputs[2]]
    if len(node.inputs) > 3 and node.inputs[3]:
        sizes = vals[node.inputs[3]]
    if sizes is not None and len(sizes):
        oh, ow = int(sizes[2]), int(sizes[3])
    else:
        oh = int(round(x.shape[2] * float(scales[2])))
        ow = int(round(x.shape[3] * float(scales[3])))
    if mode != "nearest":
        raise NotImplementedError(f"resize mode {mode}")
    # nearest-floor (coordinate_transformation_mode=asymmetric, the
    # torch Upsample(nearest) export)
    ys = np.minimum((np.arange(oh) * x.shape[2] // oh), x.shape[2] - 1)
    xs = np.minimum((np.arange(ow) * x.shape[3] // ow), x.shape[3] - 1)
    return x[:, :, ys][:, :, :, xs]


def _slice(vals, node):
    x = vals[node.inputs[0]]
    if len(node.inputs) > 1:  # opset >= 10: starts/ends/axes/steps inputs
        starts = vals[node.inputs[1]].astype(np.int64)
        ends = vals[node.inputs[2]].astype(np.int64)
        axes = (vals[node.inputs[3]].astype(np.int64)
                if len(node.inputs) > 3 and node.inputs[3]
                else np.arange(len(starts)))
        steps = (vals[node.inputs[4]].astype(np.int64)
                 if len(node.inputs) > 4 and node.inputs[4]
                 else np.ones(len(starts), np.int64))
    else:  # opset 9 attribute form
        starts = np.asarray(node.attrs["starts"])
        ends = np.asarray(node.attrs["ends"])
        axes = np.asarray(node.attrs.get("axes",
                                         list(range(len(starts)))))
        steps = np.ones(len(starts), np.int64)
    sl = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = int(ax) % x.ndim
        sl[ax] = slice(int(st), None if en >= 2**31 else int(en), int(sp))
    return x[tuple(sl)]


def run_onnx(model: OnnxModel, inputs: Dict[str, np.ndarray]
             ) -> List[np.ndarray]:
    """Evaluate the graph with numpy; returns outputs in graph order."""
    vals: Dict[str, np.ndarray] = dict(model.initializers)
    vals.update({k: np.asarray(v) for k, v in inputs.items()})
    vals[""] = None

    for node in model.nodes:
        t = node.op_type
        i = node.inputs
        if t == "Conv":
            out = _conv(vals[i[0]], vals[i[1]],
                        vals[i[2]] if len(i) > 2 else None, node.attrs)
        elif t == "Sigmoid":
            out = 1.0 / (1.0 + np.exp(-vals[i[0]]))
        elif t == "Mul":
            out = vals[i[0]] * vals[i[1]]
        elif t == "Add":
            out = vals[i[0]] + vals[i[1]]
        elif t == "Sub":
            out = vals[i[0]] - vals[i[1]]
        elif t == "Div":
            out = vals[i[0]] / vals[i[1]]
        elif t == "Pow":
            out = vals[i[0]] ** vals[i[1]]
        elif t == "Exp":
            out = np.exp(vals[i[0]])
        elif t == "Concat":
            out = np.concatenate([vals[n] for n in i],
                                 axis=node.attrs["axis"])
        elif t == "MaxPool":
            out = _maxpool(vals[i[0]], node.attrs)
        elif t == "Resize":
            out = _resize(vals, node)
        elif t == "Upsample":  # opset < 10
            scales = vals[i[1]] if len(i) > 1 else node.attrs["scales"]
            fake = OnnxNode()
            fake.inputs = [i[0], "", "__scales__"]
            fake.attrs = node.attrs
            vals["__scales__"] = np.asarray(scales)
            out = _resize(vals, fake)
        elif t == "Slice":
            out = _slice(vals, node)
        elif t == "Transpose":
            out = np.transpose(vals[i[0]], node.attrs["perm"])
        elif t == "Reshape":
            shape = (vals[i[1]].astype(np.int64) if len(i) > 1
                     else np.asarray(node.attrs["shape"]))
            shape = [int(s) for s in shape]
            # ONNX semantics: 0 copies the input dim
            shape = [vals[i[0]].shape[ax] if s == 0 else s
                     for ax, s in enumerate(shape)]
            out = vals[i[0]].reshape(shape)
        elif t == "Flatten":
            ax = node.attrs.get("axis", 1)
            x = vals[i[0]]
            out = x.reshape(int(np.prod(x.shape[:ax], initial=1)), -1)
        elif t == "Constant":
            out = node.attrs.get("value")
        elif t == "Shape":
            out = np.asarray(vals[i[0]].shape, np.int64)
        elif t == "Gather":
            out = np.take(vals[i[0]], vals[i[1]].astype(np.int64),
                          axis=node.attrs.get("axis", 0))
        elif t == "Unsqueeze":
            axes = (vals[i[1]].astype(np.int64) if len(i) > 1
                    else node.attrs["axes"])
            out = vals[i[0]]
            for ax in sorted(int(a) for a in axes):
                out = np.expand_dims(out, ax)
        elif t == "Squeeze":
            axes = (vals[i[1]].astype(np.int64) if len(i) > 1 and i[1]
                    else node.attrs.get("axes"))
            out = np.squeeze(vals[i[0]],
                             tuple(int(a) for a in axes) if axes is not None
                             else None)
        elif t == "Cast":
            out = vals[i[0]].astype(_TENSOR_DTYPES[node.attrs["to"]])
        elif t == "Split":
            x = vals[i[0]]
            ax = node.attrs.get("axis", 0)
            if len(i) > 1 and i[1]:
                splits = vals[i[1]].astype(np.int64).tolist()
            else:
                splits = node.attrs.get("split")
            if splits:
                points = np.cumsum(splits)[:-1]
            else:
                points = len(node.outputs)
            outs = np.split(x, points, axis=ax)
            for nm, o in zip(node.outputs, outs):
                vals[nm] = o
            continue
        elif t == "Softmax":
            x = vals[i[0]]
            ax = node.attrs.get("axis", -1)
            e = np.exp(x - x.max(axis=ax, keepdims=True))
            out = e / e.sum(axis=ax, keepdims=True)
        elif t == "MatMul":
            out = vals[i[0]] @ vals[i[1]]
        elif t == "Gemm":
            a, b = vals[i[0]], vals[i[1]]
            if node.attrs.get("transA"):
                a = a.T
            if node.attrs.get("transB"):
                b = b.T
            out = (node.attrs.get("alpha", 1.0) * (a @ b))
            if len(i) > 2:
                out = out + node.attrs.get("beta", 1.0) * vals[i[2]]
        elif t == "Relu":
            out = np.maximum(vals[i[0]], 0.0)
        elif t == "HardSigmoid":
            a = node.attrs.get("alpha", 0.2)
            b = node.attrs.get("beta", 0.5)
            out = np.clip(a * vals[i[0]] + b, 0.0, 1.0)
        elif t == "HardSwish":
            x = vals[i[0]]
            out = x * np.clip(x / 6.0 + 0.5, 0.0, 1.0)
        elif t == "Clip":
            lo = vals[i[1]] if len(i) > 1 and i[1] else node.attrs.get(
                "min", -np.inf)
            hi = vals[i[2]] if len(i) > 2 and i[2] else node.attrs.get(
                "max", np.inf)
            out = np.clip(vals[i[0]], lo, hi)
        elif t == "LeakyRelu":
            x = vals[i[0]]
            out = np.where(x >= 0, x, node.attrs.get("alpha", 0.01) * x)
        elif t == "Identity":
            out = vals[i[0]]
        elif t == "Round":
            # ONNX Round = round-half-to-even (matches numpy / jnp.round)
            out = np.round(vals[i[0]])
        elif t == "Expand":
            out = vals[i[0]] * np.ones(
                tuple(int(s) for s in vals[i[1]]), vals[i[0]].dtype) \
                if vals[i[0]].dtype != np.bool_ else np.broadcast_to(
                    vals[i[0]], tuple(int(s) for s in vals[i[1]])).copy()
        elif t == "Min":
            out = vals[i[0]]
            for n in i[1:]:
                out = np.minimum(out, vals[n])
        elif t == "Max":
            out = vals[i[0]]
            for n in i[1:]:
                out = np.maximum(out, vals[n])
        elif t == "Neg":
            out = -vals[i[0]]
        elif t == "Sign":
            out = np.sign(vals[i[0]])
        elif t == "Where":
            out = np.where(vals[i[0]], vals[i[1]], vals[i[2]])
        else:
            raise NotImplementedError(f"ONNX op {t} ({node.name})")
        vals[node.outputs[0]] = out

    return [vals[n] for n in model.outputs]
