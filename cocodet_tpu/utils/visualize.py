"""Detection visualization — box drawing with the 80-class palette.

Parity target: ref yolox/utils/visualize.py:11-42 (vis: per-class colored
boxes + score labels drawn with cv2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import cv2
import numpy as np


def _palette(n: int = 80) -> np.ndarray:
    """Deterministic distinct colors (golden-ratio hue walk)."""
    hues = (np.arange(n) * 0.61803398875 % 1.0) * 179
    hsv = np.stack([hues, np.full(n, 200.0), np.full(n, 255.0)],
                   axis=1).astype(np.uint8)[None]
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0].astype(int)


_COLORS = _palette()


def vis(img: np.ndarray, boxes, scores, cls_ids, conf: float = 0.5,
        class_names: Optional[Sequence[str]] = None) -> np.ndarray:
    """Draw xyxy boxes with class/score labels onto a BGR image."""
    img = img.copy()
    for box, score, cid in zip(np.asarray(boxes), np.asarray(scores),
                               np.asarray(cls_ids)):
        if score < conf:
            continue
        cid = int(cid)
        x1, y1, x2, y2 = (int(v) for v in box)
        color = tuple(int(c) for c in _COLORS[cid % len(_COLORS)])
        name = (class_names[cid] if class_names and cid < len(class_names)
                else str(cid))
        label = f"{name}:{score * 100:.1f}%"
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        (tw, th), _ = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX,
                                      0.4, 1)
        cv2.rectangle(img, (x1, y1 - th - 4), (x1 + tw, y1), color, -1)
        cv2.putText(img, label, (x1, y1 - 2), cv2.FONT_HERSHEY_SIMPLEX,
                    0.4, (255, 255, 255), 1, cv2.LINE_AA)
    return img
