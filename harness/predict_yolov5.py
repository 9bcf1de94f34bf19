#!/usr/bin/env python3
"""YOLOv5m6 predictor — multi-model submission harness member.

Parity target: ref submit/predict_yolov5.py (yaml-built YOLOv5m6,
model.fuse() BN-fold, /255 normalize, in-Detect grid decode + external NMS).
Runs the anchor-based flax graph (models/anchor_zoo.py) with the same
decode/NMS operating point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser("predict_yolov5")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--img-size", type=int, default=1280)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--nms", type=float, default=0.65)
    ap.add_argument("--out", default="answersheet_yolov5.json")
    ap.add_argument("--dummy", action="store_true",
                    help="random-input smoke forward (ref predict_yolov4.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cocodet_tpu.models.anchor_zoo import (build_anchor_model,
                                               decode_anchor_outputs)
    from cocodet_tpu.ops.nms import batched_nms

    model, anchors, strides = build_anchor_model("yolov5m6", fused=True,
                                                 dtype=jnp.bfloat16)
    size = args.img_size
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in jax.tree_util.tree_leaves(variables))
    print(f"yolov5m6: {n_params:,} params")

    @jax.jit
    def step(images):
        outs = model.apply(variables, images / 255.0)  # v5 normalizes /255
        boxes, obj, cls = decode_anchor_outputs(outs, anchors, strides, 80)
        score = jnp.max(cls, -1)
        klass = jnp.argmax(cls, -1).astype(jnp.int32)
        k = min(2000, score.shape[1])
        top, order = jax.lax.top_k(
            jnp.where(score >= args.conf, score, -1.0), k)
        take = jax.vmap(lambda a, o: a[o])
        return batched_nms(take(boxes, order), top, take(klass, order),
                           take(obj[..., 0], order), top >= 0.0,
                           iou_threshold=args.nms, max_det=300)

    if args.dummy or not args.data_dir:
        imgs = jnp.asarray(
            np.random.rand(args.batch_size, size, size, 3) * 255, jnp.float32)
        t0 = time.time()
        res = jax.block_until_ready(step(imgs))
        print(f"dummy forward ok: {res.boxes.shape} in {time.time()-t0:.1f}s")
        return

    from cocodet_tpu.data.coco import COCO_CLASS_ID
    from cocodet_tpu.data.folder import FolderLoader, ImageFolderDataset

    ds = ImageFolderDataset(args.data_dir, size)
    results = []
    for imgs, infos in FolderLoader(ds, args.batch_size):
        res = jax.device_get(step(jnp.asarray(imgs)))
        for i, (h, w, name) in enumerate(infos):
            scale = min(size / h, size / w)
            for j in range(res.boxes.shape[1]):
                if not res.valid[i, j]:
                    break
                x1, y1, x2, y2 = res.boxes[i, j] / scale
                results.append({
                    "image_id": name,
                    "category_id": COCO_CLASS_ID[int(res.classes[i, j])],
                    "bbox": [float(x1), float(y1),
                             float(x2 - x1), float(y2 - y1)],
                    "score": float(res.scores[i, j])})
    with open(args.out, "w") as f:
        json.dump(results, f)
    print(f"wrote {len(results)} records -> {args.out}")


if __name__ == "__main__":
    main()
