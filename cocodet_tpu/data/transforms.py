"""Host-side image transforms (numpy/cv2) producing fixed-shape batches.

Parity targets (ref yolox/data/data_augment.py):
  - augment_hsv            :21-31
  - affine matrix + warp   :48-133
  - _mirror                :136-141
  - letterbox preproc      :144-160 (ratio-preserving resize, 114-pad
                           top-left; NOTE: we keep NHWC — no CHW transpose —
                           because the TPU model is NHWC)
  - TrainTransform         :163-212 (xyxy->cxcywh, pad labels to (max, 5))
  - ValTransform           :215-245

TPU-relevant deviations:
  * output stays HWC uint8/float32 NHWC (no channel transpose),
  * every output is fixed-shape so batches feed straight into jit without
    recompiles; multiscale uses a small bucket set (see exp configs).
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

cv2.setNumThreads(0)


def xyxy2cxcywh(boxes: np.ndarray) -> np.ndarray:
    out = boxes.copy()
    out[:, 2] = boxes[:, 2] - boxes[:, 0]
    out[:, 3] = boxes[:, 3] - boxes[:, 1]
    out[:, 0] = boxes[:, 0] + out[:, 2] * 0.5
    out[:, 1] = boxes[:, 1] + out[:, 3] * 0.5
    return out


def augment_hsv(img: np.ndarray, hgain: float = 5, sgain: float = 30,
                vgain: float = 30, rng: Optional[random.Random] = None) -> None:
    """In-place random HSV jitter (ref data_augment.py:21-31)."""
    rng = rng or random
    gains = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain]
    gains *= np.array([rng.randint(0, 1) for _ in range(3)])
    gains = gains.astype(np.int16)
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.int16)
    hsv[..., 0] = (hsv[..., 0] + gains[0]) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] + gains[1], 0, 255)
    hsv[..., 2] = np.clip(hsv[..., 2] + gains[2], 0, 255)
    cv2.cvtColor(hsv.astype(img.dtype), cv2.COLOR_HSV2BGR, dst=img)


def _rand(value, center: float = 0.0, rng: Optional[random.Random] = None):
    rng = rng or random
    if isinstance(value, (int, float)):
        return rng.uniform(center - value, center + value)
    return rng.uniform(value[0], value[1])


def get_affine_matrix(target_size: Tuple[int, int], degrees=10.0,
                      translate=0.1, scales=0.1, shear=10.0,
                      rng: Optional[random.Random] = None):
    """Rotation+scale+shear+translate matrix (ref data_augment.py:48-81)."""
    tw, th = target_size
    angle = _rand(degrees, rng=rng)
    scale = _rand(scales, center=1.0, rng=rng)
    if scale <= 0.0:
        raise ValueError("scale must be positive")
    rot = cv2.getRotationMatrix2D(angle=angle, center=(0, 0), scale=scale)

    m = np.ones((2, 3))
    shear_x = math.tan(_rand(shear, rng=rng) * math.pi / 180)
    shear_y = math.tan(_rand(shear, rng=rng) * math.pi / 180)
    m[0] = rot[0] + shear_y * rot[1]
    m[1] = rot[1] + shear_x * rot[0]
    m[0, 2] = _rand(translate, rng=rng) * tw
    m[1, 2] = _rand(translate, rng=rng) * th
    return m, scale


def apply_affine_to_bboxes(targets: np.ndarray, target_size, m: np.ndarray):
    """Warp xyxy boxes through affine m, clip to target (ref :84-113)."""
    n = len(targets)
    tw, th = target_size
    corners = np.ones((4 * n, 3))
    corners[:, :2] = targets[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(4 * n, 2)
    corners = (corners @ m.T).reshape(n, 8)
    xs, ys = corners[:, 0::2], corners[:, 1::2]
    new = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1)
    new[:, 0::2] = new[:, 0::2].clip(0, tw)
    new[:, 1::2] = new[:, 1::2].clip(0, th)
    targets[:, :4] = new
    return targets


def random_affine(img, targets=(), target_size=(640, 640), degrees=10.0,
                  translate=0.1, scales=0.1, shear=10.0,
                  rng: Optional[random.Random] = None):
    m, scale = get_affine_matrix(target_size, degrees, translate, scales,
                                 shear, rng)
    img = cv2.warpAffine(img, m, dsize=target_size, borderValue=(114, 114, 114))
    if len(targets) > 0:
        targets = apply_affine_to_bboxes(targets, target_size, m)
    return img, targets


def mirror(image: np.ndarray, boxes: np.ndarray, prob: float = 0.5,
           rng: Optional[random.Random] = None):
    """Horizontal flip (ref data_augment.py:136-141)."""
    rng = rng or random
    _, width, _ = image.shape
    if rng.random() < prob:
        image = image[:, ::-1]
        boxes = boxes.copy()
        boxes[:, 0::2] = width - boxes[:, 2::-2]
    return image, boxes


def letterbox(img: np.ndarray, input_size: Tuple[int, int],
              pad_value: int = 114,
              use_native: bool = True) -> Tuple[np.ndarray, float]:
    """Ratio-preserving resize + pad top-left, HWC float32
    (ref preproc, data_augment.py:144-160 — minus the CHW transpose).

    Uses the native C++ kernel (layers/fast_preproc) when built — one fused
    pass over the output instead of resize + pad + dtype-convert copies.
    """
    if use_native and img.ndim == 3 and img.dtype == np.uint8:
        try:
            from ..layers import fast_preproc

            if fast_preproc.available():
                return fast_preproc.letterbox(img, input_size,
                                              float(pad_value))
        except Exception:
            pass
    padded = np.full((input_size[0], input_size[1], 3), pad_value, np.uint8)
    r = min(input_size[0] / img.shape[0], input_size[1] / img.shape[1])
    nw, nh = int(img.shape[1] * r), int(img.shape[0] * r)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    if resized.ndim == 2:
        resized = resized[..., None].repeat(3, axis=2)
    padded[:nh, :nw] = resized
    return np.ascontiguousarray(padded, dtype=np.float32), r


class TrainTransform:
    """Letterbox + HSV + flip + label padding (ref data_augment.py:163-212).

    Output: image (H, W, 3) float32, labels (max_labels, 5)
    [class, cx, cy, w, h] zero-padded — the exact contract simota_assign and
    yolox_losses consume.
    """

    def __init__(self, max_labels: int = 50, flip_prob: float = 0.5,
                 hsv_prob: float = 1.0):
        self.max_labels = max_labels
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob

    def __call__(self, image: np.ndarray, targets: np.ndarray,
                 input_dim: Tuple[int, int],
                 rng: Optional[random.Random] = None):
        rng = rng or random
        boxes = targets[:, :4].copy()
        labels = targets[:, 4].copy()
        if len(boxes) == 0:
            image, _ = letterbox(image, input_dim)
            return image, np.zeros((self.max_labels, 5), np.float32)

        image_o, targets_o = image.copy(), targets.copy()

        if rng.random() < self.hsv_prob:
            augment_hsv(image, rng=rng)
        image_t, boxes = mirror(image, boxes, self.flip_prob, rng=rng)
        image_t, r = letterbox(image_t, input_dim)
        boxes = xyxy2cxcywh(boxes) * r

        keep = np.minimum(boxes[:, 2], boxes[:, 3]) > 1
        boxes_t, labels_t = boxes[keep], labels[keep]
        if len(boxes_t) == 0:
            # degenerate aug: fall back to the clean image (ref :196-200)
            image_t, r_o = letterbox(image_o, input_dim)
            boxes_t = xyxy2cxcywh(targets_o[:, :4]) * r_o
            labels_t = targets_o[:, 4]

        merged = np.hstack([labels_t[:, None], boxes_t])
        padded = np.zeros((self.max_labels, 5), np.float32)
        padded[: min(len(merged), self.max_labels)] = merged[: self.max_labels]
        return image_t, np.ascontiguousarray(padded, np.float32)


class ValTransform:
    """Letterbox only (ref data_augment.py:215-245; legacy normalize path
    included for yolov5-style models)."""

    def __init__(self, legacy: bool = False):
        self.legacy = legacy

    def __call__(self, img: np.ndarray, res, input_size: Tuple[int, int]):
        img, r = letterbox(img, input_size)
        if self.legacy:
            img = img[..., ::-1].copy()  # BGR -> RGB
            img /= 255.0
            img -= np.array([0.485, 0.456, 0.406])
            img /= np.array([0.229, 0.224, 0.225])
        return img, np.zeros((1, 5), np.float32)
