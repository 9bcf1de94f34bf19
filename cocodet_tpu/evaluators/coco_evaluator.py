"""Batched COCO evaluator — jitted forward+postprocess, numpy-side bookkeeping.

Parity target: ref yolox/evaluators/coco_evaluator.py:26-221
(COCOEvaluator.evaluate: batch loop, decode+NMS, scale-back, COCO-json
records, gather to rank 0, pycocotools summary, forward/NMS timing split).

TPU re-design:
  * forward + decode + NMS is ONE jit-compiled program (see ops.postprocess)
    — the reference's per-image NMS python loop and host sync per batch
    disappear; only the fixed-shape (B, max_det) result crosses to host;
  * batches are fixed-shape letterboxed val images so one compile serves the
    whole epoch;
  * multi-host: each process evaluates its shard and detections are
    all-gathered over DCN (parallel.collectives.gather_detections) —
    replacing the gloo pickle gather (ref dist.py:224-265).
"""

from __future__ import annotations

import json
import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.coco import COCO_CLASS_ID
from ..utils.logger import logger
from .coco_metric import COCOMeanAP


class COCOEvaluator:
    def __init__(self, dataset, img_size: Tuple[int, int] = (640, 640),
                 conf_threshold: float = 0.01, nms_threshold: float = 0.65,
                 num_classes: int = 80, batch_size: int = 8,
                 testdev: bool = False, max_det: int = 300,
                 pre_nms_topk: int = 2000, per_class_ap: bool = False):
        self.dataset = dataset
        self.img_size = img_size
        self.conf_threshold = conf_threshold
        self.nms_threshold = nms_threshold
        self.num_classes = num_classes
        self.batch_size = batch_size
        self.testdev = testdev
        self.max_det = max_det
        self.pre_nms_topk = pre_nms_topk
        self.per_class_ap = per_class_ap
        # optional NamedSharding for eval batches (set by Trainer when it
        # builds a device mesh): forward+NMS then runs batch-sharded over
        # the same mesh as training
        self.sharding = None

    # ------------------------------------------------------------------
    def _build_step(self, exp, model):
        import jax
        from ..ops.postprocess import PostprocessConfig, postprocess

        cfg = PostprocessConfig(
            num_classes=self.num_classes,
            conf_threshold=self.conf_threshold,
            nms_threshold=self.nms_threshold,
            pre_nms_topk=self.pre_nms_topk,
            max_det=self.max_det,
        )
        strides = tuple(exp.strides)

        @jax.jit
        def step(variables, images):
            outputs = model.apply(variables, images)
            return postprocess(outputs, strides, cfg)

        return step

    def _batches(self):
        """Threaded batch assembly: decode/letterbox of batch k+1 overlaps
        the device compute of batch k (the reference used torch DataLoader
        worker processes for the same purpose)."""
        from concurrent.futures import ThreadPoolExecutor

        import jax

        ds = self.dataset
        n = len(ds)
        # multi-host: each process evaluates a contiguous shard
        # (detections are re-gathered over DCN in evaluate())
        world = jax.process_count()
        if world > 1:
            per = (n + world - 1) // world
            lo = jax.process_index() * per
            hi = min(lo + per, n)
        else:
            lo, hi = 0, n

        def build(start):
            idxs = list(range(start, min(start + self.batch_size, hi)))
            items = [ds[i] for i in idxs]
            imgs = np.stack([np.asarray(it[0], np.float32) for it in items])
            pad = self.batch_size - len(items)
            if pad:
                imgs = np.concatenate(
                    [imgs, np.zeros((pad,) + imgs.shape[1:], np.float32)])
            return imgs, [it[2] for it in items], [it[3] for it in items]

        starts = list(range(lo, hi, self.batch_size))
        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = [pool.submit(build, s) for s in starts[:2]]
            for k, start in enumerate(starts):
                if k + 2 < len(starts):
                    futures.append(pool.submit(build, starts[k + 2]))
                yield futures[k].result()

    def convert_to_coco_format(self, result, infos, ids) -> List[dict]:
        """Scale detections back to original image space and emit COCO
        records (ref coco_evaluator.py:135-165 + common/utils.py:27-75
        80->91 category mapping)."""
        records = []
        boxes = np.asarray(result.boxes)
        scores = np.asarray(result.scores)
        classes = np.asarray(result.classes)
        valid = np.asarray(result.valid)
        for i, ((h, w), img_id) in enumerate(zip(infos, ids)):
            scale = min(self.img_size[0] / float(h), self.img_size[1] / float(w))
            for j in range(boxes.shape[1]):
                if not valid[i, j]:
                    break  # kept detections are front-compacted
                x1, y1, x2, y2 = boxes[i, j] / scale
                x1, x2 = np.clip([x1, x2], 0, w)
                y1, y2 = np.clip([y1, y2], 0, h)
                records.append({
                    "image_id": int(img_id),
                    "category_id": COCO_CLASS_ID[int(classes[i, j])],
                    "bbox": [float(x1), float(y1),
                             float(x2 - x1), float(y2 - y1)],
                    "score": float(scores[i, j]),
                    "segmentation": [],
                })
        return records

    # ------------------------------------------------------------------
    def evaluate(self, exp, model_vars, model=None,
                 output_json: Optional[str] = None,
                 gather_fn=None):
        """Returns (ap50_95, ap50, summary_str) like ref
        coco_evaluator.py:51-133."""
        import jax

        model = model or exp.get_model()
        step = self._build_step(exp, model)

        data_list: List[dict] = []
        n_batches = 0
        t_fwd = 0.0
        t_host = 0.0
        t0 = time.perf_counter()
        for imgs, infos, ids in self._batches():
            t1 = time.perf_counter()
            if self.sharding is not None:
                imgs = jax.device_put(imgs, self.sharding)
            result = jax.block_until_ready(step(model_vars, imgs))
            t2 = time.perf_counter()
            data_list.extend(self.convert_to_coco_format(result, infos, ids))
            t3 = time.perf_counter()
            t_fwd += t2 - t1
            t_host += t3 - t2
            n_batches += 1

        if gather_fn is None and jax.process_count() > 1:
            from ..parallel import process_allgather_detections

            gather_fn = process_allgather_detections
        if gather_fn is not None:  # multi-host: concat per-process shards
            data_list = gather_fn(data_list)

        if output_json:
            with open(output_json, "w") as f:
                json.dump(data_list, f)

        n_imgs = max(len(self.dataset), 1)
        summary = (
            f"eval: {n_imgs} imgs, {n_batches} batches | "
            f"forward+nms {1000 * t_fwd / n_imgs:.2f} ms/img, "
            f"host {1000 * t_host / n_imgs:.2f} ms/img, "
            f"total {time.perf_counter() - t0:.1f}s")
        logger.info(summary)

        stats = self.evaluate_prediction(data_list)
        summary += f" | AP={stats['AP']:.4f} AP50={stats['AP50']:.4f}"
        return stats["AP"], stats["AP50"], summary

    def evaluate_prediction(self, data_list: Sequence[dict]) -> Dict[str, float]:
        metric = COCOMeanAP()
        coco = self.dataset.coco
        anns = [a for img_id in coco.ids
                for a in coco.anns_per_image.get(img_id, [])]
        metric.add_gt_annotations(anns)
        metric.add_detections(list(data_list))
        return metric.summarize()
