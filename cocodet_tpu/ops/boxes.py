"""Box algebra — pure jnp functions, fully batched and shape-static.

Parity targets:
  - cxcywh/xyxy conversions   ref yolox/utils/boxes.py:85-128
  - bboxes_iou                ref yolox/utils/boxes.py (pairwise IoU)
  - adjust_box_anns           ref yolox/utils/boxes.py (mosaic shift; numpy twin
                              lives in cocodet_tpu/data/transforms.py)
"""

from __future__ import annotations

import jax.numpy as jnp


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """COCO json format: top-left + size."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, xyxy: bool = True) -> jnp.ndarray:
    """IoU of every box in ``a`` (..., N, 4) against every box in ``b`` (..., M, 4).

    Matches ref bboxes_iou semantics: boxes may be corner (xyxy=True) or
    center (cxcywh) format. Returns (..., N, M).
    """
    if not xyxy:
        a = cxcywh_to_xyxy(a)
        b = cxcywh_to_xyxy(b)
    tl = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    br = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.prod(a[..., 2:] - a[..., :2], axis=-1)
    area_b = jnp.prod(b[..., 2:] - b[..., :2], axis=-1)
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def iou_cxcywh(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-12):
    """Elementwise IoU of aligned (…, 4) cxcywh boxes + union/enclose terms.

    Shared by IoU/GIoU loss (ref yolox/models/losses.py:15-40).
    Returns (iou, union_area, enclose_area).
    """
    p_tl = pred[..., :2] - pred[..., 2:] * 0.5
    p_br = pred[..., :2] + pred[..., 2:] * 0.5
    t_tl = target[..., :2] - target[..., 2:] * 0.5
    t_br = target[..., :2] + target[..., 2:] * 0.5

    tl = jnp.maximum(p_tl, t_tl)
    br = jnp.minimum(p_br, t_br)
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.prod(pred[..., 2:], axis=-1)
    area_t = jnp.prod(target[..., 2:], axis=-1)
    union = area_p + area_t - inter
    iou = inter / (union + eps)

    c_tl = jnp.minimum(p_tl, t_tl)
    c_br = jnp.maximum(p_br, t_br)
    enclose = jnp.prod(c_br - c_tl, axis=-1)
    return iou, union, enclose
