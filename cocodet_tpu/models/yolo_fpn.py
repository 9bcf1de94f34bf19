"""Legacy YOLOv3-style FPN over Darknet-53.

Parity target: ref yolox/models/yolo_fpn.py:12-80 (YOLOFPN: lrelu 1x1
lateral + upsample + concat + 5-conv embedding per branch; outputs
(out_dark3, out_dark4, dark5) shallow-first) — kept for the yolov3 registry
entry (ref yolox/exp/build.py name map).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvBnAct, upsample2x
from .darknet import Darknet

Dtype = Any


class YOLOFPN(nn.Module):
    depth: int = 53
    in_features: Sequence[str] = ("dark3", "dark4", "dark5")
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(act="lrelu", fused=self.fused, quant=self.quant, dtype=self.dtype,
                  axis_name=self.axis_name)

        def embedding(x, widths, prefix):
            # 1x1/3x3 alternating 5-conv stack (ref yolo_fpn.py:37-46)
            plan = [(widths[0], 1), (widths[1], 3), (widths[0], 1),
                    (widths[1], 3), (widths[0], 1)]
            for i, (w, k) in enumerate(plan):
                x = ConvBnAct(w, k, 1, name=f"{prefix}_{i}", **kw)(x, train)
            return x

        feats = Darknet(depth=self.depth, out_features=self.in_features,
                        fused=self.fused, quant=self.quant, dtype=self.dtype,
                        axis_name=self.axis_name, name="backbone")(x, train)
        x2, x1, x0 = (feats[f] for f in self.in_features)

        b1 = ConvBnAct(256, 1, 1, name="out1_cbl", **kw)(x0, train)
        b1 = jnp.concatenate([upsample2x(b1), x1], axis=-1)
        out_dark4 = embedding(b1, (256, 512), "out1")

        b2 = ConvBnAct(128, 1, 1, name="out2_cbl", **kw)(out_dark4, train)
        b2 = jnp.concatenate([upsample2x(b2), x2], axis=-1)
        out_dark3 = embedding(b2, (128, 256), "out2")

        return (out_dark3, out_dark4, x0)
