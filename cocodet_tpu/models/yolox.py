"""YOLOX model wrappers + registry, TPU-native.

Parity targets:
  - YOLOX / YOLOXCustom / YOLOXCustomP6 / YOLOXCustomP6v2 wrappers
    ref yolox/models/yolox.py:11-78, yolox_p6.py:11-81, yolox_p6_v2.py,
    yolox_custom.py
  - model factory semantics of ref exps (yolox/exp/yolox_p6.py:93-112 etc.)

The wrapper composes PAFPN + head and exposes raw per-level maps; all loss /
decode logic lives in cocodet_tpu/ops (pure functions over these outputs).
``return_taps`` surfaces the distillation intermediates (the reference's
``return_all`` path, ref yolox/models/yolox_p6.py:48-58).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .head import YOLOXHead
from .pafpn import PAFPN_VARIANTS, YOLOPAFPN

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static description of one model family member."""

    variant: str               # pafpn/backbone variant key
    strides: Tuple[int, ...]   # per-level anchor strides
    act: str = "hard_swish"
    depthwise: bool = False


MODEL_SPECS = {
    # standard YOLOX (silu, 3 scales) — ref yolox/exp/yolox_base.py:84-100
    "yolox": ModelSpec("standard", (8, 16, 32), act="silu"),
    # depthwise nano/tiny style
    "yolox-dw": ModelSpec("standard", (8, 16, 32), act="silu", depthwise=True),
    # custom 3-scale (hard_swish) — ref yolox/exp/yolox_custom.py
    "yolox-custom": ModelSpec("custom", (8, 16, 32)),
    # P6 4-scale — ref yolox/exp/yolox_p6.py:93-112
    "yolox-p6": ModelSpec("p6", (8, 16, 32, 64)),
    # P6v2 — ref yolox/exp/yolox_p6_v2.py
    "yolox-p6v2": ModelSpec("p6v2", (8, 16, 32, 64)),
    # legacy YOLOv3 = Darknet-53 YOLOFPN + lrelu decoupled head
    # (ref exps/default/yolov3.py:27-34)
    "yolov3": ModelSpec("yolofpn", (8, 16, 32), act="lrelu"),
}


class YOLOX(nn.Module):
    """PAFPN backbone+neck and decoupled head.

    Output: list over levels of {"reg","obj","cls"} NHWC maps (+ optional
    distillation taps).
    """

    spec: ModelSpec
    num_classes: int = 80
    depth: float = 1.0
    width: float = 1.0
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    use_mask: bool = False
    weight_mask: bool = False
    remat: bool = False
    slim: Optional[Any] = None  # backbone channel-slim map (compress.merge)
    stem6: bool = False  # deployment Focus->6x6s2 rewrite (ops/fuse.py)
    split_cat: bool = False  # deployment split-concat FPN graph (pafpn.py)
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_taps: bool = False):
        if self.remat and self.split_cat:
            # jax.checkpoint flattens the (array, up2x) parts lists that
            # split_cat feeds into CSP layers, turning the static up2x
            # booleans into tracers — Conv2d's graph dispatch then fails at
            # trace time.  split_cat is a deployment (inference) rewrite and
            # remat a training lever; the combination is never meaningful.
            raise ValueError("split_cat cannot be combined with remat")
        if self.spec.variant == "yolofpn":
            from .yolo_fpn import YOLOFPN

            assert not return_taps, "yolov3 has no distill taps"
            backbone = YOLOFPN(fused=self.fused, quant=self.quant, dtype=self.dtype,
                               axis_name=self.axis_name, name="backbone")
            head = YOLOXHead(
                num_classes=self.num_classes, width=self.width,
                num_levels=len(self.spec.strides), act=self.spec.act,
                fused=self.fused, quant=self.quant, dtype=self.dtype,
                axis_name=self.axis_name, name="head")
            return head(backbone(x, train), train)
        backbone = YOLOPAFPN(
            variant=self.spec.variant,
            depth=self.depth,
            width=self.width,
            act=self.spec.act,
            depthwise=self.spec.depthwise,
            fused=self.fused, quant=self.quant,
            use_mask=self.use_mask,
            weight_mask=self.weight_mask,
            remat=self.remat,
            slim=self.slim,
            stem6=self.stem6,
            split_cat=self.split_cat,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="backbone",
        )
        head = YOLOXHead(
            num_classes=self.num_classes,
            width=self.width,
            num_levels=len(self.spec.strides),
            act=self.spec.act,
            depthwise=self.spec.depthwise,
            fused=self.fused, quant=self.quant,
            use_mask=self.use_mask,
            slim=(self.slim or {}).get("head"),
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="head",
        )
        if return_taps:
            fpn_outs, taps = backbone(x, train, return_taps=True)
            return head(fpn_outs, train), taps
        return head(backbone(x, train), train)

    @property
    def strides(self) -> Tuple[int, ...]:
        return self.spec.strides


def build_model(
    name: str = "yolox-p6",
    num_classes: int = 80,
    depth: float = 1.0,
    width: float = 1.0,
    **kwargs,
) -> YOLOX:
    """Model registry. ``name`` keys into MODEL_SPECS.

    The competition model is build_model("yolox-p6", depth=0.67, width=0.75)
    — ref exps/p6/yolox_m_p6.py:13-14 + yolox/exp/yolox_p6.py:93-112.
    """
    if name not in MODEL_SPECS:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODEL_SPECS)}")
    return YOLOX(spec=MODEL_SPECS[name], num_classes=num_classes,
                 depth=depth, width=width, **kwargs)
