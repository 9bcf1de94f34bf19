"""Decoupled anchor-free YOLOX head, TPU-native (NHWC, flax.linen).

Parity target: ref yolox/models/yolo_head.py:17-225 and
yolo_head_custom.py:17-225 (identical towers; only defaults differ).

Design notes (TPU-first):
  * The head module ONLY produces raw per-level (reg, obj, cls) maps. Decode,
    loss, and SimOTA assignment are pure functions in cocodet_tpu/ops/ —
    keeping the module functional and the training step fully jittable. The
    reference interleaves loss computation with the module forward
    (yolo_head.py:131-190); here that composition happens in the train step.
  * Output layout is NHWC: (B, H, W, 4/1/C). Flattening + level concat is done
    by ops.decode so each consumer picks the layout it wants.
  * cls/obj prediction biases are initialized to the focal prior
    (-log((1-p)/p), p=0.01) exactly as ref yolo_head.py:120-129.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

from flax import linen as nn

from .blocks import Conv2d, ConvBnAct, conv_bias_init_for, prior_bias_init

Dtype = Any


class YOLOXHead(nn.Module):
    """Per-scale stem + cls/reg towers + 1x1 prediction convs.

    Returns a list over scales of dicts {"reg": (B,H,W,4), "obj": (B,H,W,1),
    "cls": (B,H,W,num_classes)}.
    """

    num_classes: int = 80
    width: float = 1.0
    num_levels: int = 4
    act: str = "hard_swish"
    depthwise: bool = False
    prior_prob: float = 1e-2
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    use_mask: bool = False    # ChannelMask after each stem/tower conv
    slim: Optional[Any] = None  # {conv_name: out_width} from slim_channels
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    def _w(self, name: str, default: int) -> int:
        return int((self.slim or {}).get(name, default))

    @nn.compact
    def __call__(self, xin: Sequence[Any], train: bool = False):
        assert len(xin) == self.num_levels
        feat = int(256 * self.width)
        kw = dict(act=self.act, fused=self.fused, quant=self.quant, dtype=self.dtype,
                  use_mask=self.use_mask, axis_name=self.axis_name)

        outputs: List[dict] = []
        for k, x in enumerate(xin):
            x = ConvBnAct(self._w(f"stem{k}", feat), 1, 1,
                          name=f"stem{k}", **kw)(x, train)

            cls_feat = x
            for j in range(2):
                cls_feat = ConvBnAct(
                    self._w(f"cls_conv{k}_{j}", feat), 3, 1,
                    name=f"cls_conv{k}_{j}", **kw)(cls_feat, train)
            reg_feat = x
            for j in range(2):
                reg_feat = ConvBnAct(
                    self._w(f"reg_conv{k}_{j}", feat), 3, 1,
                    name=f"reg_conv{k}_{j}", **kw)(reg_feat, train)

            cls_out = Conv2d(self.num_classes, 1, use_bias=True,
                             bias_init=prior_bias_init(self.prior_prob),
                             dtype=self.dtype, name=f"cls_pred{k}")(cls_feat)
            reg_out = Conv2d(4, 1, use_bias=True,
                             bias_init=conv_bias_init_for(feat),
                             dtype=self.dtype, name=f"reg_pred{k}")(reg_feat)
            obj_out = Conv2d(1, 1, use_bias=True,
                             bias_init=prior_bias_init(self.prior_prob),
                             dtype=self.dtype, name=f"obj_pred{k}")(reg_feat)

            outputs.append({"reg": reg_out, "obj": obj_out, "cls": cls_out})
        return outputs
