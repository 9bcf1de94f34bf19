"""Anchor-based detector family (YOLOv5 / ScaledYOLOv4), spec-driven.

Parity targets (the reference's multi-model submission predictors):
  - YOLOv5m6 yaml graph + modules  ref submit/models/yolov5m6.yaml,
    common.py (Conv/C3/SPPF), yolo.py (parse + Detect build)
  - YOLOv4-P5/P6/P7/CSP graphs     ref submit/yolov4_infer/models/*.yaml,
    common.py (Conv-Mish/BottleneckCSP/BottleneckCSP2/SPPCSP + Affine2d)
  - Detect anchor decode           ref submit/models/detect.py:27-44 and
    yolov4_infer/models/detect.py:20-37:
        y = sigmoid(p); xy = (2y - 0.5 + grid) * stride
        wh = (2y)^2 * anchor_px

Design: one flax module interprets a spec tuple (the yaml's
[from, number, module, args] rows) sequentially, NHWC, with the same
depth/width multiple rules as ultralytics parse_model (width snapped to
multiples of 8, depth = max(round(n*gd), 1)). ``fused=True`` builds the
BN-folded inference topology the reference ships (conv bias, Affine gates);
``fused=False`` gives a trainable BN variant. Raw per-level maps come out;
decode_anchor_outputs turns them into (boxes, obj, cls) for ops.nms.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnAct, Conv2d, conv_bias_init_for, max_pool_same, upsample2x

Dtype = Any


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


# --------------------------------------------------------------------------
# building blocks (NHWC)
# --------------------------------------------------------------------------


class VConv(nn.Module):
    """Conv(+BN)+act — the ultralytics Conv (ref submit/models/common.py:12-24,
    fused per yolov4_infer/models/common.py:21-36)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBnAct(self.features, self.kernel_size, self.stride,
                         groups=self.groups, act=self.act, fused=self.fused, quant=self.quant,
                         bn_momentum=0.03, bn_eps=1e-3, dtype=self.dtype)(
            x, train)


class AffineGate(nn.Module):
    """BN over a concat in train mode; folded per-channel affine in fused
    mode (ref Affine2d, yolov4_infer/models/common.py:5-18)."""

    features: int
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fused:
            w = self.param("weight", nn.initializers.ones, (self.features,))
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            return x * w.astype(x.dtype) + b.astype(x.dtype)
        return nn.BatchNorm(use_running_average=not train, momentum=0.97,
                            epsilon=1e-3, dtype=self.dtype)(x)


class VBottleneck(nn.Module):
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = int(self.features * self.expansion)
        kw = dict(act=self.act, fused=self.fused, quant=self.quant, dtype=self.dtype)
        y = VConv(hidden, 1, name="cv1", **kw)(x, train)
        y = VConv(self.features, 3, name="cv2", **kw)(y, train)
        return y + x if self.shortcut and cin == self.features else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (ref submit/models/common.py:53-71)."""

    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        kw = dict(act=self.act, fused=self.fused, quant=self.quant, dtype=self.dtype)
        x1 = VConv(hidden, 1, name="cv1", **kw)(x, train)
        for i in range(self.n):
            x1 = VBottleneck(hidden, self.shortcut, 1.0, name=f"m{i}",
                             **kw)(x1, train)
        x2 = VConv(hidden, 1, name="cv2", **kw)(x, train)
        return VConv(self.features, 1, name="cv3", **kw)(
            jnp.concatenate([x1, x2], -1), train)


class SPPF(nn.Module):
    """Serial 5x5 pool pyramid (ref submit/models/common.py:75-90)."""

    features: int
    k: int = 5
    act: str = "silu"
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(act=self.act, fused=self.fused, quant=self.quant, dtype=self.dtype)
        x = VConv(x.shape[-1] // 2, 1, name="cv1", **kw)(x, train)
        y1 = max_pool_same(x, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        return VConv(self.features, 1, name="cv2", **kw)(
            jnp.concatenate([x, y1, y2, y3], -1), train)


class BottleneckCSP(nn.Module):
    """v4 CSP block (ref yolov4_infer/models/common.py:57-85)."""

    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "mish"
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        kw = dict(act=self.act, fused=self.fused, quant=self.quant, dtype=self.dtype)
        x0 = VConv(hidden, 1, name="cv1", **kw)(x, train)
        x2 = Conv2d(hidden, 1, use_bias=True, dtype=self.dtype,
                    name="cv2")(x)
        x1 = x0
        for i in range(self.n):
            x1 = VBottleneck(hidden, self.shortcut, 1.0, name=f"m{i}",
                             **kw)(x1, train)
        x1 = Conv2d(hidden, 1, use_bias=True, dtype=self.dtype,
                    name="cv3")(x1)
        y = jnp.concatenate([x1, x2], -1)
        y = AffineGate(2 * hidden, fused=self.fused, quant=self.quant, dtype=self.dtype,
                       name="bn")(y, train)
        y = mish(y)
        return VConv(self.features, 1, name="cv4", **kw)(y, train)


class BottleneckCSP2(nn.Module):
    """v4 head CSP block (ref yolov4_infer/models/common.py:88-112)."""

    features: int
    n: int = 1
    shortcut: bool = False
    act: str = "mish"
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features)
        kw = dict(act=self.act, fused=self.fused, quant=self.quant, dtype=self.dtype)
        x0 = VConv(hidden, 1, name="cv1", **kw)(x, train)
        x1 = x0
        for i in range(self.n):
            x1 = VBottleneck(hidden, self.shortcut, 1.0, name=f"m{i}",
                             **kw)(x1, train)
        x2 = Conv2d(hidden, 1, use_bias=True, dtype=self.dtype,
                    name="cv2")(x0)
        y = jnp.concatenate([x1, x2], -1)
        y = AffineGate(2 * hidden, fused=self.fused, quant=self.quant, dtype=self.dtype,
                       name="bn")(y, train)
        y = mish(y)
        return VConv(self.features, 1, name="cv3", **kw)(y, train)


class SPPCSP(nn.Module):
    """v4 SPP-CSP (ref yolov4_infer/models/common.py:115-146)."""

    features: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    expansion: float = 0.5
    act: str = "mish"
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(2 * self.features * self.expansion)
        kw = dict(act=self.act, fused=self.fused, quant=self.quant, dtype=self.dtype)
        x1 = VConv(hidden, 1, name="cv1", **kw)(x, train)
        x1 = VConv(hidden, 3, name="cv3", **kw)(x1, train)
        x1 = VConv(hidden, 1, name="cv4", **kw)(x1, train)
        y1 = jnp.concatenate(
            [x1] + [max_pool_same(x1, k) for k in self.kernel_sizes], -1)
        y1 = VConv(hidden, 1, name="cv5", **kw)(y1, train)
        y1 = VConv(hidden, 3, name="cv6", **kw)(y1, train)
        y2 = Conv2d(hidden, 1, use_bias=True, dtype=self.dtype,
                    name="cv2")(x)
        y = jnp.concatenate([y1, y2], -1)
        y = AffineGate(2 * hidden, fused=self.fused, quant=self.quant, dtype=self.dtype,
                       name="bn")(y, train)
        y = mish(y)
        return VConv(self.features, 1, name="cv7", **kw)(y, train)


_MODULES = {"Conv", "C3", "SPPF", "Bottleneck", "BottleneckCSP",
            "BottleneckCSP2", "SPPCSP", "Concat", "nn.Upsample", "Detect"}


class AnchorDetector(nn.Module):
    """Interprets a (backbone + head) layer spec like ultralytics
    parse_model. Returns the list of raw per-level Detect conv outputs,
    each (B, H, W, na*(5+nc))."""

    spec: Tuple            # tuple-ified rows: (from, number, module, args)
    num_classes: int = 80
    num_anchors: int = 3
    depth_multiple: float = 1.0
    width_multiple: float = 1.0
    act: str = "silu"
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        gd, gw = self.depth_multiple, self.width_multiple
        outputs: List[jnp.ndarray] = []
        kw = dict(act=self.act, fused=self.fused, quant=self.quant, dtype=self.dtype)

        for li, (frm, number, module, args) in enumerate(self.spec):
            n = max(round(number * gd), 1) if number > 1 else number
            if isinstance(frm, (list, tuple)):
                inp = [x if f == -1 else outputs[f] for f in frm]
            else:
                inp = x if frm == -1 else outputs[frm]

            name = f"l{li}_{module.replace('.', '_')}"
            if module == "Conv":
                c2 = make_divisible(args[0] * gw)
                k = args[1] if len(args) > 1 else 1
                s = args[2] if len(args) > 2 else 1
                x = VConv(c2, k, s, name=name, **kw)(inp, train)
            elif module == "C3":
                c2 = make_divisible(args[0] * gw)
                shortcut = args[1] if len(args) > 1 else True
                x = C3(c2, n=n, shortcut=shortcut, name=name, **kw)(inp, train)
            elif module == "SPPF":
                c2 = make_divisible(args[0] * gw)
                k = args[1] if len(args) > 1 else 5
                x = SPPF(c2, k=k, name=name, **kw)(inp, train)
            elif module == "Bottleneck":
                c2 = make_divisible(args[0] * gw)
                x = VBottleneck(c2, name=name, **kw)(inp, train)
            elif module == "BottleneckCSP":
                c2 = make_divisible(args[0] * gw)
                x = BottleneckCSP(c2, n=n, name=name, **kw)(inp, train)
            elif module == "BottleneckCSP2":
                c2 = make_divisible(args[0] * gw)
                x = BottleneckCSP2(c2, n=n, name=name, **kw)(inp, train)
            elif module == "SPPCSP":
                c2 = make_divisible(args[0] * gw)
                x = SPPCSP(c2, name=name, **kw)(inp, train)
            elif module == "Concat":
                x = jnp.concatenate(list(inp), axis=-1)
            elif module == "nn.Upsample":
                x = upsample2x(inp)
            elif module == "Detect":
                no = self.num_anchors * (5 + self.num_classes)
                return [
                    Conv2d(no, 1, use_bias=True,
                           bias_init=conv_bias_init_for(t.shape[-1]),
                           dtype=self.dtype, name=f"detect_m{k}")(t)
                    for k, t in enumerate(inp)
                ]
            else:
                raise ValueError(f"unknown module {module!r}")
            outputs.append(x)
        raise ValueError("spec has no Detect layer")


def decode_anchor_outputs(outputs: Sequence[jnp.ndarray],
                          anchors_px: Sequence[Sequence[float]],
                          strides: Sequence[int], num_classes: int):
    """Anchor decode (ref detect.py:27-44) -> (boxes_xyxy (B, A, 4),
    obj (B, A, 1), cls (B, A, C) obj-multiplied), ready for ops.nms."""
    all_boxes, all_obj, all_cls = [], [], []
    for out, anc, s in zip(outputs, anchors_px, strides):
        b, h, w, _ = out.shape
        na = len(anc) // 2
        no = out.shape[-1] // na
        y = jax.nn.sigmoid(
            out.reshape(b, h, w, na, no).astype(jnp.float32))
        xv, yv = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                              jnp.arange(h, dtype=jnp.float32))
        grid = jnp.stack([xv, yv], -1)[None, :, :, None, :]
        anc_arr = jnp.asarray(anc, jnp.float32).reshape(1, 1, 1, na, 2)
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * float(s)
        wh = jnp.square(y[..., 2:4] * 2.0) * anc_arr
        boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
        all_boxes.append(boxes.reshape(b, -1, 4))
        all_obj.append(y[..., 4:5].reshape(b, -1, 1))
        all_cls.append((y[..., 5:] * y[..., 4:5]).reshape(b, -1, num_classes))
    return (jnp.concatenate(all_boxes, 1), jnp.concatenate(all_obj, 1),
            jnp.concatenate(all_cls, 1))


# --------------------------------------------------------------------------
# model registry — specs transcribed from the reference yamls
# --------------------------------------------------------------------------

# ref submit/models/yolov5m6.yaml (v6.0 graph)
YOLOV5_6_SPEC = (
    (-1, 1, "Conv", (64, 6, 2)),
    (-1, 1, "Conv", (128, 3, 2)),
    (-1, 3, "C3", (128,)),
    (-1, 1, "Conv", (256, 3, 2)),
    (-1, 6, "C3", (256,)),
    (-1, 1, "Conv", (512, 3, 2)),
    (-1, 9, "C3", (512,)),
    (-1, 1, "Conv", (768, 3, 2)),
    (-1, 3, "C3", (768,)),
    (-1, 1, "Conv", (1024, 3, 2)),
    (-1, 3, "C3", (1024,)),
    (-1, 1, "SPPF", (1024, 5)),
    (-1, 1, "Conv", (768, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    ((-1, 8), 1, "Concat", ()),
    (-1, 3, "C3", (768, False)),
    (-1, 1, "Conv", (512, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    ((-1, 6), 1, "Concat", ()),
    (-1, 3, "C3", (512, False)),
    (-1, 1, "Conv", (256, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    ((-1, 4), 1, "Concat", ()),
    (-1, 3, "C3", (256, False)),
    (-1, 1, "Conv", (256, 3, 2)),
    ((-1, 20), 1, "Concat", ()),
    (-1, 3, "C3", (512, False)),
    (-1, 1, "Conv", (512, 3, 2)),
    ((-1, 16), 1, "Concat", ()),
    (-1, 3, "C3", (768, False)),
    (-1, 1, "Conv", (768, 3, 2)),
    ((-1, 12), 1, "Concat", ()),
    (-1, 3, "C3", (1024, False)),
    ((23, 26, 29, 32), 1, "Detect", ()),
)

# anchors in input pixels (ref submit/models/yolov5m6.yaml:7-11)
YOLOV5M6_ANCHORS = (
    (19, 27, 44, 40, 38, 94),
    (96, 68, 86, 152, 180, 137),
    (140, 301, 303, 264, 238, 542),
    (436, 615, 739, 380, 925, 792),
)

# ref submit/yolov4_infer/models/yolov4-p6.yaml
YOLOV4_P6_SPEC = (
    (-1, 1, "Conv", (32, 3, 1)),
    (-1, 1, "Conv", (64, 3, 2)),
    (-1, 1, "BottleneckCSP", (64,)),
    (-1, 1, "Conv", (128, 3, 2)),
    (-1, 3, "BottleneckCSP", (128,)),
    (-1, 1, "Conv", (256, 3, 2)),
    (-1, 15, "BottleneckCSP", (256,)),
    (-1, 1, "Conv", (512, 3, 2)),
    (-1, 15, "BottleneckCSP", (512,)),
    (-1, 1, "Conv", (1024, 3, 2)),
    (-1, 7, "BottleneckCSP", (1024,)),
    (-1, 1, "Conv", (1024, 3, 2)),
    (-1, 7, "BottleneckCSP", (1024,)),
    (-1, 1, "SPPCSP", (512,)),                     # 13
    (-1, 1, "Conv", (512, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (10, 1, "Conv", (512, 1, 1)),                  # yaml -6 == abs 10
    ((-1, 15), 1, "Concat", ()),                   # yaml [-1,-2]
    (-1, 3, "BottleneckCSP2", (512,)),             # 18
    (-1, 1, "Conv", (256, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (8, 1, "Conv", (256, 1, 1)),                   # yaml -13 == abs 8
    ((-1, 20), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (256,)),             # 23
    (-1, 1, "Conv", (128, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (6, 1, "Conv", (128, 1, 1)),                   # yaml -20 == abs 6
    ((-1, 25), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (128,)),             # 28
    (-1, 1, "Conv", (256, 3, 1)),                  # 29 -> P3 out
    (28, 1, "Conv", (256, 3, 2)),                  # yaml -2
    ((-1, 23), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (256,)),             # 32
    (-1, 1, "Conv", (512, 3, 1)),                  # 33 -> P4 out
    (32, 1, "Conv", (512, 3, 2)),                  # yaml -2
    ((-1, 18), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (512,)),             # 36
    (-1, 1, "Conv", (1024, 3, 1)),                 # 37 -> P5 out
    (36, 1, "Conv", (512, 3, 2)),                  # yaml -2
    ((-1, 13), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (512,)),             # 40
    (-1, 1, "Conv", (1024, 3, 1)),                 # 41 -> P6 out
    ((29, 33, 37, 41), 1, "Detect", ()),
)

YOLOV4_P6_ANCHORS = (
    (13, 17, 31, 25, 24, 51, 61, 45),
    (61, 45, 48, 102, 119, 96, 97, 189),
    (97, 189, 217, 184, 171, 384, 324, 451),
    (324, 451, 545, 357, 616, 618, 1024, 1024),
)



# ref submit/yolov4_infer/models/yolov4-p5.yaml
YOLOV4_P5_SPEC = (
    (-1, 1, "Conv", (32, 3, 1)),
    (-1, 1, "Conv", (64, 3, 2)),
    (-1, 1, "BottleneckCSP", (64,)),
    (-1, 1, "Conv", (128, 3, 2)),
    (-1, 3, "BottleneckCSP", (128,)),
    (-1, 1, "Conv", (256, 3, 2)),
    (-1, 15, "BottleneckCSP", (256,)),
    (-1, 1, "Conv", (512, 3, 2)),
    (-1, 15, "BottleneckCSP", (512,)),
    (-1, 1, "Conv", (1024, 3, 2)),
    (-1, 7, "BottleneckCSP", (1024,)),
    (-1, 1, "SPPCSP", (512,)),                   # 11
    (-1, 1, "Conv", (256, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (8, 1, "Conv", (256, 1, 1)),
    ((-1, 13), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (256,)),           # 16
    (-1, 1, "Conv", (128, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (6, 1, "Conv", (128, 1, 1)),
    ((-1, 18), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (128,)),           # 21
    (-1, 1, "Conv", (256, 3, 1)),                # 22 -> P3
    (21, 1, "Conv", (256, 3, 2)),                # yaml -2
    ((-1, 16), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (256,)),           # 25
    (-1, 1, "Conv", (512, 3, 1)),                # 26 -> P4
    (25, 1, "Conv", (512, 3, 2)),                # yaml -2
    ((-1, 11), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (512,)),           # 29
    (-1, 1, "Conv", (1024, 3, 1)),               # 30 -> P5
    ((22, 26, 30), 1, "Detect", ()),
)

YOLOV4_P5_ANCHORS = (
    (13, 17, 31, 25, 24, 51, 61, 45),
    (48, 102, 119, 96, 97, 189, 217, 184),
    (171, 384, 324, 451, 616, 618, 800, 800),
)

# ref submit/yolov4_infer/models/yolov4-csp.yaml (3 anchors/level, mish)
YOLOV4_CSP_SPEC = (
    (-1, 1, "Conv", (32, 3, 1)),
    (-1, 1, "Conv", (64, 3, 2)),
    (-1, 1, "Bottleneck", (64,)),
    (-1, 1, "Conv", (128, 3, 2)),
    (-1, 2, "BottleneckCSP", (128,)),
    (-1, 1, "Conv", (256, 3, 2)),
    (-1, 8, "BottleneckCSP", (256,)),
    (-1, 1, "Conv", (512, 3, 2)),
    (-1, 8, "BottleneckCSP", (512,)),
    (-1, 1, "Conv", (1024, 3, 2)),
    (-1, 4, "BottleneckCSP", (1024,)),
    (-1, 1, "SPPCSP", (512,)),                   # 11
    (-1, 1, "Conv", (256, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (8, 1, "Conv", (256, 1, 1)),
    ((-1, 13), 1, "Concat", ()),
    (-1, 2, "BottleneckCSP2", (256,)),           # 16
    (-1, 1, "Conv", (128, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (6, 1, "Conv", (128, 1, 1)),
    ((-1, 18), 1, "Concat", ()),
    (-1, 2, "BottleneckCSP2", (128,)),           # 21
    (-1, 1, "Conv", (256, 3, 1)),                # 22 -> P3
    (21, 1, "Conv", (256, 3, 2)),
    ((-1, 16), 1, "Concat", ()),
    (-1, 2, "BottleneckCSP2", (256,)),           # 25
    (-1, 1, "Conv", (512, 3, 1)),                # 26 -> P4
    (25, 1, "Conv", (512, 3, 2)),
    ((-1, 11), 1, "Concat", ()),
    (-1, 2, "BottleneckCSP2", (512,)),           # 29
    (-1, 1, "Conv", (1024, 3, 1)),               # 30 -> P5
    ((22, 26, 30), 1, "Detect", ()),
)

YOLOV4_CSP_ANCHORS = (
    (12, 16, 19, 36, 40, 28),
    (36, 75, 76, 55, 72, 146),
    (142, 110, 192, 243, 459, 401),
)

# ref submit/yolov4_infer/models/yolov4-p7.yaml (5 levels, width 1.25)
YOLOV4_P7_SPEC = (
    (-1, 1, "Conv", (32, 3, 1)),
    (-1, 1, "Conv", (64, 3, 2)),
    (-1, 1, "BottleneckCSP", (64,)),
    (-1, 1, "Conv", (128, 3, 2)),
    (-1, 3, "BottleneckCSP", (128,)),
    (-1, 1, "Conv", (256, 3, 2)),
    (-1, 15, "BottleneckCSP", (256,)),
    (-1, 1, "Conv", (512, 3, 2)),
    (-1, 15, "BottleneckCSP", (512,)),
    (-1, 1, "Conv", (1024, 3, 2)),
    (-1, 7, "BottleneckCSP", (1024,)),
    (-1, 1, "Conv", (1024, 3, 2)),
    (-1, 7, "BottleneckCSP", (1024,)),
    (-1, 1, "Conv", (1024, 3, 2)),
    (-1, 7, "BottleneckCSP", (1024,)),           # 14
    (-1, 1, "SPPCSP", (512,)),                   # 15
    (-1, 1, "Conv", (512, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (12, 1, "Conv", (512, 1, 1)),                # yaml -6
    ((-1, 17), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (512,)),           # 20
    (-1, 1, "Conv", (512, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (10, 1, "Conv", (512, 1, 1)),                # yaml -13
    ((-1, 22), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (512,)),           # 25
    (-1, 1, "Conv", (256, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (8, 1, "Conv", (256, 1, 1)),                 # yaml -20
    ((-1, 27), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (256,)),           # 30
    (-1, 1, "Conv", (128, 1, 1)),
    (-1, 1, "nn.Upsample", ()),
    (6, 1, "Conv", (128, 1, 1)),                 # yaml -27
    ((-1, 32), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (128,)),           # 35
    (-1, 1, "Conv", (256, 3, 1)),                # 36 -> P3
    (35, 1, "Conv", (256, 3, 2)),
    ((-1, 30), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (256,)),           # 39
    (-1, 1, "Conv", (512, 3, 1)),                # 40 -> P4
    (39, 1, "Conv", (512, 3, 2)),
    ((-1, 25), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (512,)),           # 43
    (-1, 1, "Conv", (1024, 3, 1)),               # 44 -> P5
    (43, 1, "Conv", (512, 3, 2)),
    ((-1, 20), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (512,)),           # 47
    (-1, 1, "Conv", (1024, 3, 1)),               # 48 -> P6
    (47, 1, "Conv", (512, 3, 2)),
    ((-1, 15), 1, "Concat", ()),
    (-1, 3, "BottleneckCSP2", (512,)),           # 51
    (-1, 1, "Conv", (1024, 3, 1)),               # 52 -> P7
    ((36, 40, 44, 48, 52), 1, "Detect", ()),
)

YOLOV4_P7_ANCHORS = (
    (13, 17, 22, 25, 27, 66, 55, 41),
    (57, 88, 112, 69, 69, 177, 136, 138),
    (136, 138, 287, 114, 134, 275, 268, 248),
    (268, 248, 232, 504, 445, 416, 640, 640),
    (812, 393, 477, 808, 1070, 908, 1408, 1408),
)

ANCHOR_MODELS = {
    "yolov5m6": dict(spec=YOLOV5_6_SPEC, anchors=YOLOV5M6_ANCHORS,
                     strides=(8, 16, 32, 64), depth_multiple=0.67,
                     width_multiple=0.75, act="silu", num_anchors=3),
    "yolov4-p6": dict(spec=YOLOV4_P6_SPEC, anchors=YOLOV4_P6_ANCHORS,
                      strides=(8, 16, 32, 64), depth_multiple=1.0,
                      width_multiple=1.0, act="mish", num_anchors=4),
    "yolov4-p5": dict(spec=YOLOV4_P5_SPEC, anchors=YOLOV4_P5_ANCHORS,
                      strides=(8, 16, 32), depth_multiple=1.0,
                      width_multiple=1.0, act="mish", num_anchors=4),
    "yolov4-csp": dict(spec=YOLOV4_CSP_SPEC, anchors=YOLOV4_CSP_ANCHORS,
                       strides=(8, 16, 32), depth_multiple=1.0,
                       width_multiple=1.0, act="mish", num_anchors=3),
    "yolov4-p7": dict(spec=YOLOV4_P7_SPEC, anchors=YOLOV4_P7_ANCHORS,
                      strides=(8, 16, 32, 64, 128), depth_multiple=1.0,
                      width_multiple=1.25, act="mish", num_anchors=4),
}


def build_anchor_model(name: str, num_classes: int = 80, fused: bool = True,
                       dtype=None):
    cfg = ANCHOR_MODELS[name]
    model = AnchorDetector(
        spec=cfg["spec"], num_classes=num_classes,
        num_anchors=cfg["num_anchors"],
        depth_multiple=cfg["depth_multiple"],
        width_multiple=cfg["width_multiple"], act=cfg["act"],
        fused=fused, dtype=dtype)
    return model, cfg["anchors"], cfg["strides"]
