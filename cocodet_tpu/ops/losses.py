"""Detection losses — pure functions over head outputs + SimOTA targets.

Parity targets:
  - IOULoss (iou: 1-iou^2; giou)   ref yolox/models/losses.py:9-47
  - get_losses composition          ref yolox/models/yolo_head.py:227-381
    (5*iou + obj BCE + cls BCE + optional L1, all sum-normalized by num_fg)

The reference computes losses inside the head module with boolean-mask
gathers; here the masks stay dense ((B, A) weighted sums), which is both
TPU-friendly and numerically identical.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from .boxes import iou_cxcywh
from .decode import attach_strides, concat_levels, decode_center_format
from .simota import SimOTATargets, simota_assign


class DetectionLosses(NamedTuple):
    total: jnp.ndarray
    iou: jnp.ndarray
    obj: jnp.ndarray
    cls: jnp.ndarray
    l1: jnp.ndarray
    num_fg_per_gt: jnp.ndarray  # fg/gt ratio diagnostic (ref yolo_head.py:380)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
             loss_type: str = "iou") -> jnp.ndarray:
    """Elementwise IoU-family loss over aligned cxcywh boxes (ref losses.py:15-40)."""
    iou, union, enclose = iou_cxcywh(pred, target)
    if loss_type == "iou":
        return 1.0 - iou * iou
    if loss_type == "giou":
        giou = iou - (enclose - union) / jnp.maximum(enclose, 1e-12)
        return 1.0 - jnp.clip(giou, -1.0, 1.0)
    raise ValueError(loss_type)


def yolox_losses(
    head_outputs: Sequence[dict],
    labels: jnp.ndarray,
    strides: Sequence[int],
    num_classes: int = 80,
    use_l1: bool = False,
    iou_type: str = "iou",
    reg_weight: float = 5.0,
    simota_dtype=jnp.float32,
) -> Tuple[DetectionLosses, SimOTATargets]:
    """Full YOLOX training loss from raw NHWC head maps.

    labels: (B, G, 5) [class, cx, cy, w, h] zero-padded (TrainTransform
    contract, ref data_augment.py:163-212).
    """
    preds, grids, stride_vec = concat_levels(attach_strides(head_outputs, strides))
    preds = preds.astype(jnp.float32)
    decoded = decode_center_format(preds, grids, stride_vec)  # (B, A, 5+C)

    bbox_preds = decoded[..., :4]
    obj_logits = preds[..., 4:5]
    cls_logits = preds[..., 5:]
    centers = (grids + 0.5) * stride_vec[:, None]

    tgt = simota_assign(
        labels, bbox_preds, cls_logits, obj_logits, centers, stride_vec,
        num_classes, compute_dtype=simota_dtype)

    num_fg = jnp.maximum(tgt.num_fg, 1.0)
    fg = tgt.fg_mask.astype(jnp.float32)

    li = iou_loss(bbox_preds, tgt.reg_target, iou_type) * fg
    loss_iou = jnp.sum(li) / num_fg

    lo = optax.sigmoid_binary_cross_entropy(obj_logits[..., 0], fg)
    loss_obj = jnp.sum(lo) / num_fg

    lc = optax.sigmoid_binary_cross_entropy(cls_logits, tgt.cls_target)
    loss_cls = jnp.sum(lc * fg[..., None]) / num_fg

    if use_l1:
        raw_reg = preds[..., :4]
        ll = jnp.abs(raw_reg - tgt.l1_target) * fg[..., None]
        loss_l1 = jnp.sum(ll) / num_fg
    else:
        loss_l1 = jnp.zeros(())

    total = reg_weight * loss_iou + loss_obj + loss_cls + loss_l1
    losses = DetectionLosses(
        total=total,
        iou=reg_weight * loss_iou,
        obj=loss_obj,
        cls=loss_cls,
        l1=loss_l1,
        num_fg_per_gt=tgt.num_fg / jnp.maximum(tgt.num_gts, 1.0),
    )
    return losses, tgt
