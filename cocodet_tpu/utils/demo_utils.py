"""Pure-numpy decode + NMS for export/demo paths (no jax dependency).

Parity target: ref yolox/utils/demo_utils.py:17-124 (multiclass_nms,
demo_postprocess with the p6 flag) — used by the ONNX/StableHLO demo
runners where the postprocess runs outside the compiled graph.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, thr: float) -> list:
    """Sequential greedy NMS (xyxy)."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = (np.maximum(0.0, xx2 - xx1)
                 * np.maximum(0.0, yy2 - yy1))
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-12)
        order = order[1:][iou <= thr]
    return keep


def multiclass_nms(boxes: np.ndarray, scores: np.ndarray, nms_thr: float,
                   score_thr: float, class_agnostic: bool = False
                   ) -> Optional[np.ndarray]:
    """(N, 6) [x1 y1 x2 y2 score cls] or None (ref demo_utils.py:30-76)."""
    if class_agnostic:
        cls_ids = scores.argmax(1)
        cls_scores = scores[np.arange(len(scores)), cls_ids]
        mask = cls_scores > score_thr
        if not mask.any():
            return None
        keep = nms_numpy(boxes[mask], cls_scores[mask], nms_thr)
        dets = np.concatenate(
            [boxes[mask][keep], cls_scores[mask][keep, None],
             cls_ids[mask][keep, None].astype(np.float32)], axis=1)
        return dets

    out = []
    for c in range(scores.shape[1]):
        cls_scores = scores[:, c]
        mask = cls_scores > score_thr
        if not mask.any():
            continue
        keep = nms_numpy(boxes[mask], cls_scores[mask], nms_thr)
        if keep:
            out.append(np.concatenate(
                [boxes[mask][keep], cls_scores[mask][keep, None],
                 np.full((len(keep), 1), c, np.float32)], axis=1))
    return np.concatenate(out) if out else None


def demo_postprocess(outputs: np.ndarray, img_size: Tuple[int, int],
                     p6: bool = False) -> np.ndarray:
    """Grid decode of raw (1, A, 5+C) outputs (ref demo_utils.py:79-124)."""
    strides = (8, 16, 32, 64) if p6 else (8, 16, 32)
    grids, expanded = [], []
    for s in strides:
        h, w = img_size[0] // s, img_size[1] // s
        xv, yv = np.meshgrid(np.arange(w), np.arange(h))
        grid = np.stack((xv, yv), 2).reshape(1, -1, 2)
        grids.append(grid)
        expanded.append(np.full((1, grid.shape[1], 1), s))
    grids = np.concatenate(grids, axis=1).astype(outputs.dtype)
    expanded = np.concatenate(expanded, axis=1).astype(outputs.dtype)
    outputs = outputs.copy()
    outputs[..., :2] = (outputs[..., :2] + grids) * expanded
    outputs[..., 2:4] = np.exp(outputs[..., 2:4]) * expanded
    return outputs
