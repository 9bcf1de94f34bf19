"""VOC mAP evaluator (07 11-point and 12 all-point metrics).

Parity target: ref yolox/evaluators/voc_evaluator.py:19-208 + voc_eval.py
(per-class AP via greedy IoU-0.5 matching against difficult-flagged GTs).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.voc import VOC_CLASSES, parse_voc_xml
from ..utils.logger import logger


def voc_ap(recall: np.ndarray, precision: np.ndarray,
           use_07_metric: bool = False) -> float:
    """AP from a PR curve (ref voc_eval.py semantics)."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(precision[recall >= t]) if np.any(recall >= t) else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def eval_class(detections: List[Tuple[int, float, np.ndarray]],
               gts: Dict[int, Tuple[np.ndarray, np.ndarray]],
               iou_thr: float = 0.5,
               use_07_metric: bool = False) -> float:
    """AP for one class.

    detections: list of (img_idx, score, box_xyxy);
    gts: img_idx -> (boxes (G,4), difficult (G,)).
    """
    npos = sum(int((~d).sum()) for _, (_, d) in gts.items())
    if not detections:
        return 0.0 if npos > 0 else float("nan")
    detections = sorted(detections, key=lambda t: -t[1])
    taken = {i: np.zeros(len(b), bool) for i, (b, _) in gts.items()}
    tp = np.zeros(len(detections))
    fp = np.zeros(len(detections))
    for di, (img, score, box) in enumerate(detections):
        boxes, difficult = gts.get(img, (np.zeros((0, 4)), np.zeros(0, bool)))
        if len(boxes) == 0:
            fp[di] = 1
            continue
        ixmin = np.maximum(boxes[:, 0], box[0])
        iymin = np.maximum(boxes[:, 1], box[1])
        ixmax = np.minimum(boxes[:, 2], box[2])
        iymax = np.minimum(boxes[:, 3], box[3])
        iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
        ih = np.maximum(iymax - iymin + 1.0, 0.0)
        inter = iw * ih
        union = ((box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
                 + (boxes[:, 2] - boxes[:, 0] + 1.0)
                 * (boxes[:, 3] - boxes[:, 1] + 1.0) - inter)
        overlaps = inter / np.maximum(union, 1e-12)
        jmax = int(np.argmax(overlaps))
        if overlaps[jmax] > iou_thr:
            if difficult[jmax]:
                continue  # neither tp nor fp
            if not taken[img][jmax]:
                tp[di] = 1
                taken[img][jmax] = True
            else:
                fp[di] = 1
        else:
            fp[di] = 1
    tp, fp = np.cumsum(tp), np.cumsum(fp)
    recall = tp / max(npos, 1)
    precision = tp / np.maximum(tp + fp, np.spacing(1))
    return voc_ap(recall, precision, use_07_metric)


class VOCEvaluator:
    """Batched eval loop over a VOCDetection dataset."""

    def __init__(self, dataset, img_size=(640, 640), conf_threshold=0.01,
                 nms_threshold=0.65, num_classes=20, batch_size=8,
                 use_07_metric: bool = False):
        self.dataset = dataset
        self.img_size = img_size
        self.conf_threshold = conf_threshold
        self.nms_threshold = nms_threshold
        self.num_classes = num_classes
        self.batch_size = batch_size
        self.use_07_metric = use_07_metric

    def evaluate(self, exp, model_vars, model=None):
        import jax
        import jax.numpy as jnp
        from ..ops.postprocess import PostprocessConfig, postprocess

        model = model or exp.get_model()
        cfg = PostprocessConfig(num_classes=self.num_classes,
                                conf_threshold=self.conf_threshold,
                                nms_threshold=self.nms_threshold)
        strides = tuple(exp.strides)

        @jax.jit
        def step(variables, images):
            return postprocess(model.apply(variables, images), strides, cfg)

        per_class: List[List[Tuple[int, float, np.ndarray]]] = [
            [] for _ in range(self.num_classes)]
        gts: List[Dict[int, Tuple[np.ndarray, np.ndarray]]] = [
            {} for _ in range(self.num_classes)]

        n = len(self.dataset)
        for start in range(0, n, self.batch_size):
            idxs = list(range(start, min(start + self.batch_size, n)))
            imgs, scales = [], []
            for i in idxs:
                img, res, (h, w), _ = self.dataset.pull_item(i)
                from ..data.transforms import letterbox
                padded, r = letterbox(img, self.img_size)
                imgs.append(padded)
                scales.append(r)
                root, img_id = self.dataset.items[i]
                import os
                boxes, difficult = parse_voc_xml(
                    os.path.join(root, "Annotations", f"{img_id}.xml"),
                    keep_difficult=True)
                for c in range(self.num_classes):
                    sel = boxes[:, 4] == c
                    if sel.any():
                        gts[c][i] = (boxes[sel, :4],
                                     np.asarray([d for d, s in
                                                 zip(difficult, sel) if s],
                                                bool))
            batch = np.stack(imgs)
            if len(idxs) < self.batch_size:
                batch = np.concatenate(
                    [batch, np.zeros((self.batch_size - len(idxs),
                                      *batch.shape[1:]), np.float32)])
            res = jax.device_get(step(model_vars, jnp.asarray(batch)))
            for bi, i in enumerate(idxs):
                for j in range(res.boxes.shape[1]):
                    if not res.valid[bi, j]:
                        break
                    c = int(res.classes[bi, j])
                    per_class[c].append(
                        (i, float(res.scores[bi, j]),
                         np.asarray(res.boxes[bi, j]) / scales[bi]))

        aps = []
        for c in range(self.num_classes):
            ap = eval_class(per_class[c], gts[c],
                            use_07_metric=self.use_07_metric)
            if not np.isnan(ap):
                aps.append(ap)
            name = VOC_CLASSES[c] if c < len(VOC_CLASSES) else str(c)
            logger.info("%-14s AP50 = %.4f", name, ap)
        mAP = float(np.mean(aps)) if aps else 0.0
        summary = f"VOC mAP50 = {mAP:.4f} ({len(aps)} classes)"
        logger.info(summary)
        return mAP, mAP, summary
