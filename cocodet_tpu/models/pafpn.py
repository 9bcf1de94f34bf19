"""PAFPN neck, TPU-native (NHWC, flax.linen).

One parametric ladder expresses every reference variant:
  - YOLOPAFPN          (3-level, standard CSP)  ref yolox/models/yolo_pafpn.py:12-146
  - YOLOPAFPNCustom    (3-level, custom CSP k5 depthwise, 4x4 downs)
                                                ref yolox/models/yolo_pafpn_custom.py:14-133
  - YOLOPAFPNCustomP6  (4-level)                ref yolox/models/yolo_pafpn_p6.py:12-228
  - YOLOPAFPNCustomP6v2(4-level, 4x4 downs)     ref yolox/models/yolo_pafpn_p6_v2.py

Top-down pass: for level k = L-1 .. 1:
    lat[k]   = 1x1 conv (w[k] -> w[k-1]) at level-k resolution
    carry    = CSP(cat(upsample2x(lat[k]), backbone[k-1])) -> w[k-1]
Bottom-up pass: out[0] = carry; for k = 1 .. L-1:
    out[k]   = CSP(cat(s2-conv(out[k-1]), lat[k])) -> w[k]

Module names are systematic (lateral{k}, td_csp{k}, bu_conv{k}, bu_csp{k});
the torch-checkpoint importer (cocodet_tpu/utils/torch_import.py) maps the
reference's per-level names (lateral_conv0/reduce_conv1/C3_p*/C3_n*/bu_conv*)
onto these.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

from flax import linen as nn
import jax.numpy as jnp

from .blocks import ConvBnAct, CSPLayer, upsample2x
from .darknet import CSPBackbone

Dtype = Any

# (backbone_variant, csp_custom, csp_kernel, csp_depthwise, down_kernel, in_features, in_channels)
PAFPN_VARIANTS: Dict[str, Dict[str, Any]] = {
    "standard": dict(
        backbone="standard", custom=False, kernel_size=3, depthwise=False,
        down_kernel=3, in_features=("dark3", "dark4", "dark5"),
        in_channels=(256, 512, 1024),
    ),
    "custom": dict(
        backbone="custom", custom=True, kernel_size=5, depthwise=True,
        down_kernel=4, in_features=("dark3", "dark4", "dark5"),
        in_channels=(256, 512, 768),
    ),
    "p6": dict(
        backbone="p6", custom=True, kernel_size=3, depthwise=False,
        down_kernel=3, in_features=("dark3", "dark4", "dark5", "dark6"),
        in_channels=(256, 512, 768, 1024),
    ),
    "p6v2": dict(
        backbone="p6v2", custom=True, kernel_size=3, depthwise=False,
        down_kernel=4, in_features=("dark3", "dark4", "dark5", "dark6"),
        in_channels=(256, 512, 768, 1024),
    ),
}


class YOLOPAFPN(nn.Module):
    """Parametric PAFPN over a CSPBackbone.

    __call__ returns the tuple of pyramid outputs, shallowest (stride 8)
    first — matching the (pan_out3..pan_out0) order of ref
    yolo_pafpn_p6.py:178-180. When ``return_taps`` is set, also returns the
    intermediate maps needed for distillation (ref forward_backbone /
    forward_fpn splits, yolo_pafpn_p6.py:182-228).
    """

    variant: str = "p6"
    depth: float = 1.0
    width: float = 1.0
    act: str = "hard_swish"
    depthwise: bool = False  # standard variant only
    fused: bool = False
    quant: Optional[str] = None  # int8 PTQ mode (compress/quantize.py)
    use_mask: bool = False
    weight_mask: bool = False
    remat: bool = False
    slim: Optional[Dict[str, Any]] = None  # backbone stage slim map
    stem6: bool = False  # deployment Focus->6x6s2 rewrite (darknet.py)
    # deployment-graph rewrite (blocks.Conv2d parts mode): FPN merge concats
    # feed only 1x1 CSP entry convs, so conv(cat(a,b)) = conv_a(a)+conv_b(b)
    # over kernel slices and the top-down branch's 1x1 commutes with the
    # nearest upsample (computed at quarter resolution).  Same checkpoint,
    # no concat materializations; exact in int8 (int32 partial sums).
    split_cat: bool = False
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_taps: bool = False):
        csp_cls = (nn.remat(CSPLayer, static_argnums=(2,)) if self.remat
                   else CSPLayer)
        cfg = PAFPN_VARIANTS[self.variant]
        in_feats: Tuple[str, ...] = tuple(cfg["in_features"])
        widths = [int(c * self.width) for c in cfg["in_channels"]]
        L = len(widths)
        kw = dict(act=self.act, fused=self.fused, quant=self.quant, dtype=self.dtype,
                  axis_name=self.axis_name)
        csp_kw = dict(
            n=round(3 * self.depth),
            shortcut=False,
            kernel_size=cfg["kernel_size"],
            depthwise=cfg["depthwise"] or self.depthwise,
            custom=cfg["custom"],
            # beyond the reference (which only pruned backbone convs): FPN
            # CSP bottlenecks are shortcut-free, so their conv1/conv2 are
            # exactly as prunable/slim-able as the backbone's
            use_mask=self.use_mask,
            weight_mask=self.weight_mask,
            split_cat=self.split_cat,
            **kw,
        )

        def _csp_slim(name):
            return (self.slim or {}).get(name)

        def _w(name, default):
            return int((self.slim or {}).get(name, default))

        feats = CSPBackbone(
            variant=cfg["backbone"],
            depth=self.depth,
            width=self.width,
            out_features=in_feats,
            act=self.act,
            depthwise=self.depthwise,
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
        )(x, train)
        xs = [feats[f] for f in in_feats]  # xs[0] = stride 8 ... xs[L-1] deepest

        # top-down
        lats: Dict[int, Any] = {}
        td: Dict[int, Any] = {}
        carry = xs[L - 1]
        for k in range(L - 1, 0, -1):
            lat = ConvBnAct(_w(f"lateral{k}", widths[k - 1]), 1, 1,
                            use_mask=self.use_mask,
                            name=f"lateral{k}", **kw)(carry, train)
            lats[k] = lat
            merged = ([(lat, True), (xs[k - 1], False)] if self.split_cat
                      else jnp.concatenate([upsample2x(lat), xs[k - 1]],
                                           axis=-1))
            carry = csp_cls(widths[k - 1], name=f"td_csp{k}",
                            slim=_csp_slim(f"td_csp{k}"), **csp_kw)(merged, train)
            td[k - 1] = carry

        # bottom-up
        outs = [carry]
        for k in range(1, L):
            p = ConvBnAct(_w(f"bu_conv{k}", widths[k - 1]),
                          cfg["down_kernel"], 2, use_mask=self.use_mask,
                          name=f"bu_conv{k}", **kw)(outs[-1], train)
            merged = ([p, lats[k]] if self.split_cat
                      else jnp.concatenate([p, lats[k]], axis=-1))
            outs.append(csp_cls(widths[k], name=f"bu_csp{k}",
                                slim=_csp_slim(f"bu_csp{k}"),
                                **csp_kw)(merged, train))

        outs = tuple(outs)
        if return_taps:
            # distillation taps: backbone features + the two deepest top-down
            # intermediates, mirroring ref forward_fpn (yolo_pafpn_p6.py:216-228)
            taps = {
                "backbone": tuple(xs),
                # deepest-first top-down intermediates (f_out0, f_out1, ...),
                # excluding level 0 which equals outs[0]
                "td": tuple(td[i] for i in sorted(td, reverse=True) if i != 0),
                "pan": outs,
            }
            return outs, taps
        return outs
